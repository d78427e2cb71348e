"""DSIR-style importance weights for targeted data selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
scores each raw document by how much more likely its hashed n-gram
features are under a TARGET distribution than under the RAW corpus
distribution, then resamples by that weight. This module computes the
per-document importance weights with the same hashed-feature machinery
as `functions/hashfeat.py` (md5 buckets), using the in-corpus
``lang='en'`` slice as the target distribution — self-contained, no
external data.

Deviation from the paper, for oracle exactness: the paper sums
``log p_tgt(b)/p_raw(b)`` per token; distributed float log-sums are
order-dependent in the last ulps (CLAUDE.md integer-aggregate rule),
so the weight here is the INTEGER per-token likelihood-ratio in ppm
with add-one smoothing —

    ratio_ppm(b) = (1e6 * (tgt_b+1) * (raw_total+D))
                   // ((raw_b+1) * (tgt_total+D))
    weight_ppm(doc) = sum over token instances ratio_ppm(bucket(tok))

— monotone in the same per-bucket evidence, exactly reproducible by
DuckDB HUGEINT arithmetic. (Same design as `quality_classifier` /
`lm_buckets`, which replaced float log-likelihoods with integer
ratios for the same reason.)

Distributed shape: one narrow combiner groupby builds the D-bucket
raw/target count table (D rows total), the ratio table is broadcast
via ``ray.put``, and scoring is an actor-pool ``map_batches`` with a
per-actor token→bucket memo — zero payload shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["dsir_weights", "dsir_weights_sql"]


def _bucket(token: str, dim: int) -> int:
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:8],
               16) % dim


def _token_buckets(t: pa.Table, dim: int,
                   memo: dict[str, int]):
    """flat (parent_row_index, bucket) for the batch's tokens."""
    import pyarrow.compute as pc
    col = t.column("text")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(col, " ")
    flat = pc.list_flatten(toks).to_pandas()
    parent = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False)
    for w in pd.unique(flat):
        if w not in memo:
            memo[w] = _bucket(w, dim)
    return parent, flat.map(memo).to_numpy(np.int64)


class _BucketCounter:
    """Per-batch (dim, raw, tgt) partials for the count table."""

    def __init__(self, dim: int, target_lang: str):
        self._dim = dim
        self._lang = target_lang
        self._memo: dict[str, int] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        parent, dims = _token_buckets(t, self._dim, self._memo)
        is_tgt = (np.asarray(t.column("lang").to_pylist())
                  == self._lang)[parent]
        raw = np.bincount(dims, minlength=self._dim).astype(np.int64)
        tgt = np.bincount(dims[is_tgt],
                          minlength=self._dim).astype(np.int64)
        nz = np.flatnonzero(raw)
        return pa.table({
            "dim": pa.array(nz, pa.int64()),
            "raw": pa.array(raw[nz], pa.int64()),
            "tgt": pa.array(tgt[nz], pa.int64()),
        })


class _Scorer:
    """Broadcast ratio table fetched once per actor; scoring is a
    vectorized bucket→ppm gather + per-doc segment sum."""

    def __init__(self, ratio_ref, dim: int):
        self._ppm = ray.get(ratio_ref)          # int64[dim]
        self._dim = dim
        self._memo: dict[str, int] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        parent, dims = _token_buckets(t, self._dim, self._memo)
        w = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(w, parent, self._ppm[dims])
        return pa.table({
            "doc_id": t.column("doc_id"),
            "weight_ppm": pa.array(w, pa.int64()),
        })


def dsir_weights(sf_dir: str, *, dim: int = 64,
                 target_lang: str = "en",
                 concurrency=None) -> rd.Dataset:
    """(doc_id, weight_ppm): integer DSIR importance weight per doc."""
    from ..stages.pool import default_pool

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])

    # per-batch partials are ≤ dim rows — merge them on the driver
    # (bounded by dim×blocks) instead of paying a sort-aggregate
    import pandas as pd
    partials = docs.select_columns(["text", "lang"]).map_batches(
        _BucketCounter(dim, target_lang), batch_format="pyarrow")
    tabs = [b if isinstance(b, pa.Table)
            else pa.Table.from_pandas(b, preserve_index=False)
            for b in ray.get(partials.to_arrow_refs())]
    tabs = [b for b in tabs if b.num_rows and b.num_columns]
    counts = (pa.concat_tables(tabs).to_pandas()
              .groupby("dim", as_index=False).sum()) if tabs else \
        pd.DataFrame({"dim": [], "raw": [], "tgt": []})
    raw = np.zeros(dim, dtype=object)
    tgt = np.zeros(dim, dtype=object)
    raw[counts["dim"].to_numpy(np.int64)] = counts["raw"].to_numpy()
    tgt[counts["dim"].to_numpy(np.int64)] = counts["tgt"].to_numpy()
    raw_total = int(sum(raw))
    tgt_total = int(sum(tgt))
    ppm = np.array(
        [(1_000_000 * (int(tgt[b]) + 1) * (raw_total + dim))
         // ((int(raw[b]) + 1) * (tgt_total + dim))
         for b in range(dim)], dtype=np.int64)
    ref = ray.put(ppm)

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _Scorer(ref, dim), batch_format="pyarrow")


def dsir_weights_sql(*, dim: int = 64, target_lang: str = "en") -> str:
    """DuckDB twin: identical md5 buckets + HUGEINT ratio formula."""
    return f"""
        WITH toks AS (SELECT doc_id, lang,
                             unnest(string_split(text, ' ')) AS w
                      FROM documents),
        b AS (SELECT doc_id, lang,
                     CAST(CAST(('0x' || substr(md5(w), 1, 8))
                               AS UBIGINT) % {dim} AS BIGINT) AS dim
              FROM toks),
        cnts AS (SELECT dim, CAST(count(*) AS BIGINT) AS raw,
                        CAST(count(*) FILTER
                             (WHERE lang = '{target_lang}')
                             AS BIGINT) AS tgt
                 FROM b GROUP BY 1),
        tot AS (SELECT CAST(sum(raw) AS BIGINT) AS rt,
                       CAST(sum(tgt) AS BIGINT) AS tt
                FROM cnts),
        ratio AS (SELECT dim,
                         CAST((1000000::HUGEINT * (tgt + 1)
                               * (rt + {dim}))
                              // ((raw + 1) * (tt + {dim}))
                              AS BIGINT) AS ppm
                  FROM cnts, tot)
        SELECT doc_id, CAST(sum(ppm) AS BIGINT) AS weight_ppm
        FROM b JOIN ratio USING (dim)
        GROUP BY 1
    """
