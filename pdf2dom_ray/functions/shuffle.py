"""Deterministic seeded global shuffle with position assignment.

Training corpora are order-randomized before sharding so each shard
draws uniformly from the corpus (Ray Data's ``random_shuffle`` does
this non-deterministically; training pipelines want a *seeded*,
reproducible order that any re-run — and the SQL oracle — can
replicate). The standard crawl-pipeline trick: give every document a
cryptographic sort key ``md5(seed || ':' || doc_id)``, globally sort
by it, and assign each row its global position.

The sort is the one all-to-all exchange (over the narrow (doc_id, key)
table — payloads stay put and are joined back by doc_id downstream, or
written directly by shard). The global position is a distributed
zip-with-index: per-block row counts reduce to O(blocks) driver bases
(same prefix-sum shape as ``chunking.pack_sequences``) and each block
then emits ``base + arange(n)`` in parallel.

Output: (doc_id, rank, shard) — rank is the 0-based shuffled position,
shard = rank % n_shards is the training-shard assignment. All-integer,
so the oracle value-hash is exact; md5 is machine-stable (same
hex digest in hashlib and DuckDB).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["seeded_shuffle"]


def _to_arrow(t) -> pa.Table:
    return pa.Table.from_pandas(t) if not isinstance(t, pa.Table) \
        else t


@ray.remote
def _block_nrows(t) -> int:
    t = _to_arrow(t)
    return t.num_rows


@ray.remote
def _rank_block(t, base: int, n_shards: int) -> pa.Table:
    t = _to_arrow(t)
    if not t.num_rows or "doc_id" not in t.schema.names:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "shard": pa.array([], pa.int64())})
    rank = base + np.arange(t.num_rows, dtype=np.int64)
    return pa.table({"doc_id": t.column("doc_id"),
                     "rank": pa.array(rank, pa.int64()),
                     "shard": pa.array(rank % n_shards, pa.int64())})


def seeded_shuffle(ds: rd.Dataset, *, seed: str = "graft",
                   n_shards: int = 16,
                   id_col: str = "doc_id") -> rd.Dataset:
    """(doc_id, rank, shard): reproducible global shuffle order.

    rank = position after sorting by ``md5(seed + ':' + doc_id)``
    (doc_id tie-break — md5 collisions only), shard = rank % n_shards.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")

    def key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids = t.column(id_col).to_pylist()
        keys = [hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
                for d in ids]
        return pa.table({"doc_id": pc.cast(t.column(id_col), pa.int64()),
                         "key": pa.array(keys, pa.string())})

    narrow = ds.select_columns([id_col]).map_batches(
        key, batch_format="pyarrow").sort(["key", "doc_id"])
    refs = narrow.to_arrow_refs()
    counts = ray.get([_block_nrows.remote(r) for r in refs])
    bases, acc = [], 0
    for c in counts:
        bases.append(acc)
        acc += c
    ranked = [_rank_block.remote(r, b, n_shards)
              for r, b in zip(refs, bases)]
    return rd.from_arrow_refs(ranked)
