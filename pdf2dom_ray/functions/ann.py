"""Similarity search over an embedding column (list<float>).

* Brute-force cosine top-k: the baseline — numpy matmul per batch
  against a broadcast query vector (``ray.put`` once, fetched in each
  actor's ``__init__``), with a per-batch local top-k combiner so the
  global sort runs over ≤ k rows per batch, not the full table.
* LSH-bucketed variant: random-hyperplane signatures bucket vectors;
  queries search only their bucket (the scale path — bucket groupby is
  the only shuffle and it's over (bucket, id) pairs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.pool import default_pool

__all__ = ["brute_topk", "lsh_buckets", "lsh_topk"]


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()          # zero-copy values buffer
    dim = len(flat) // len(col)
    return flat.to_numpy(zero_copy_only=False).reshape(len(col), dim)


class _BruteScorer:
    """Actor: query vector fetched once per actor from the object store."""

    def __init__(self, query_ref, k: int):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = np.asarray(q, dtype=np.float64)
        self.qn = np.linalg.norm(self.q)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        e = _emb_matrix(batch).astype(np.float64)
        norms = np.linalg.norm(e, axis=1)
        sims = e @ self.q / np.maximum(norms * self.qn, 1e-30)
        k = min(self.k, len(sims))
        idx = np.argpartition(-sims, k - 1)[:k]  # local top-k combiner
        return pa.table({
            "vec_id": pa.array(np.asarray(batch.column("vec_id"))[idx],
                               pa.int64()),
            "sim": pa.array(np.round(sims[idx], 4), pa.float64()),
        })


def brute_topk(ds: rd.Dataset, query: np.ndarray, k: int = 10, *,
               concurrency=None) -> rd.Dataset:
    """Global cosine top-k: per-batch top-k → tiny global sort+limit."""
    query_ref = ray.put(np.asarray(query, dtype=np.float64))
    local = ds.map_batches(
        _BruteScorer, fn_constructor_kwargs={"query_ref": query_ref, "k": k},
        batch_format="pyarrow", concurrency=concurrency or default_pool())
    return local.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


class _LshSigner:
    def __init__(self, dim: int, planes: int = 8, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((dim, planes))

    def __call__(self, batch: pa.Table) -> pa.Table:
        e = _emb_matrix(batch).astype(np.float64)
        bits = (e @ self.h) > 0
        buckets = (bits.astype(np.int64)
                   * (1 << np.arange(bits.shape[1], dtype=np.int64))).sum(axis=1)
        return batch.append_column("bucket", pa.array(buckets, pa.int64()))


def lsh_buckets(ds: rd.Dataset, dim: int, planes: int = 8,
                concurrency=None) -> rd.Dataset:
    """Append a random-hyperplane LSH bucket column."""
    return ds.map_batches(_LshSigner,
                          fn_constructor_kwargs={"dim": dim, "planes": planes},
                          batch_format="pyarrow", concurrency=concurrency or default_pool())


def lsh_topk(ds: rd.Dataset, query: np.ndarray, k: int = 10,
             planes: int = 8) -> rd.Dataset:
    """ANN top-k restricted to the query's LSH bucket (scale path)."""
    q = np.asarray(query, dtype=np.float64)
    signer = _LshSigner(len(q), planes)
    qbits = (q @ signer.h) > 0
    qbucket = int((qbits.astype(np.int64)
                   * (1 << np.arange(planes, dtype=np.int64))).sum())
    bucketed = ds.map_batches(signer, batch_format="pyarrow")
    mine = bucketed.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("bucket"), qbucket)),
        batch_format="pyarrow")
    return brute_topk(mine, q, k)
