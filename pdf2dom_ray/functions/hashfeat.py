"""Feature-hashed document vectors (the hashing trick).

The cheap, training-free embedding every large-scale text pipeline
keeps around (Weinberger et al., "Feature Hashing for Large Scale
Multitask Learning", ICML 2009): map each token to one of ``dim``
buckets by a stable hash and count. No vocabulary state, no fitting,
embarrassingly parallel — the zero-shuffle counterpart of the learned
embedding column in `embeddings.parquet`, and the input layer for the
linear classifier / LSH stages downstream.

The bucket is ``int(md5(token)[:8], 16) % dim`` — md5 so the DuckDB
oracle reproduces every bucket decision exactly (same rationale as
`functions/sampling.py`). Output is long-form (doc_id, dim, cnt) with
only non-zero buckets, which is both the join-friendly layout and
exactly what a SQL GROUP BY emits.

Per batch: one Arrow token flatten, one md5 per *distinct* token with
an actor-local memo cache (the Zipf head hits the cache), then a
C-level pandas groupby on (row, bucket) — no Python loop over rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["hashed_features"]


def _bucket(token: str, dim: int) -> int:
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:8],
               16) % dim


class _Hasher:
    def __init__(self, dim: int):
        self._dim = dim
        self._memo: dict[str, int] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, " ")
        flat = pc.list_flatten(toks).to_pandas()
        parent = pc.list_parent_indices(toks) \
            .to_numpy(zero_copy_only=False)
        memo, dim = self._memo, self._dim
        for w in pd.unique(flat):
            if w not in memo:
                memo[w] = _bucket(w, dim)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "doc_id": doc[parent],
            "dim": flat.map(memo).to_numpy(np.int64),
        })
        g = df.groupby(["doc_id", "dim"], as_index=False).size()
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
            "dim": pa.array(g["dim"].to_numpy(np.int64)),
            "cnt": pa.array(g["size"].to_numpy(np.int64)),
        })


def hashed_features(ds: rd.Dataset, *, dim: int = 16,
                    concurrency=None) -> rd.Dataset:
    """(doc_id, dim, cnt): hashing-trick bag-of-words vectors in
    long form; row-local, shuffle-free, deterministic."""

    return ds.select_columns(["doc_id", "text"]).map_batches(
        _Hasher(dim), batch_format="pyarrow")
