"""Byte-balanced output shard planning (WebDataset-style).

The output-layout step of every corpus emission job: assign documents
— in a deterministic total order — to fixed-byte-budget shards, so
writers can emit one tar/parquet file per shard and a resumable run
can skip finished shards (the repo's resumable-output invariant).
Rule: ``shard_id = floor(bytes_before / target_bytes)`` over the
doc_id-ordered exclusive byte prefix sum — the WebDataset
``ShardWriter(maxsize=…)`` behavior (a shard may overflow its budget
by less than one document; documents never split). A pure function of
the prefix sum, so it is partition-invariant AND exactly
SQL-replayable as one window cumsum — unlike greedy-reset bin packing,
which is inherently sequential.

Scale shape: narrow (doc_id, n_bytes) rows only (payload never
shuffles) → one narrow sort by doc_id → per-block byte totals →
O(blocks) driver bases → parallel per-block emission. The
``pack_sequences`` distributed-prefix-sum layout
(functions/chunking.py) applied to bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

__all__ = ["shard_plan", "shard_plan_oracle_sql"]


@ray.remote
def _block_byte_sum(t: pa.Table) -> int:
    if not t.num_columns or not t.num_rows:
        return 0
    return int(pc.sum(t.column("n_bytes")).as_py() or 0)


@ray.remote
def _plan_block(t: pa.Table, base: int, target: int) -> pa.Table:
    if not t.num_columns or not t.num_rows:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_bytes": pa.array([], pa.int64()),
                         "shard_id": pa.array([], pa.int64()),
                         "shard_offset": pa.array([], pa.int64())})
    nb = np.asarray(t.column("n_bytes"), dtype=np.int64)
    cum_before = base + np.concatenate(
        ([0], np.cumsum(nb)[:-1])).astype(np.int64)
    return pa.table({
        "doc_id": t.column("doc_id"),
        "n_bytes": pa.array(nb, pa.int64()),
        "shard_id": pa.array(cum_before // target, pa.int64()),
        "shard_offset": pa.array(cum_before % target, pa.int64()),
    })


def shard_plan(ds: rd.Dataset, *, target_bytes: int,
               id_col: str = "doc_id", text_col: str = "text",
               bytes_col: str | None = None) -> rd.Dataset:
    """(doc_id, n_bytes, shard_id, shard_offset): the doc→output-shard
    assignment for a ``target_bytes`` shard budget. ``n_bytes`` is the
    UTF-8 byte length of ``text_col`` unless ``bytes_col`` names a
    precomputed size column (images/audio payloads)."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")

    def meta(t: pa.Table) -> pa.Table:
        nb = (t.column(bytes_col).cast(pa.int64()) if bytes_col else
              pc.cast(pc.binary_length(
                  pc.cast(t.column(text_col), pa.string())), pa.int64()))
        return pa.table({"doc_id": pc.cast(t.column(id_col), pa.int64()),
                         "n_bytes": nb})

    cols = [id_col] + ([bytes_col] if bytes_col else [text_col])
    narrow = ds.select_columns(cols).map_batches(
        meta, batch_format="pyarrow").sort("doc_id")
    refs = narrow.to_arrow_refs()
    sums = ray.get([_block_byte_sum.remote(r) for r in refs])
    bases, acc = [], 0
    for s in sums:
        bases.append(acc)
        acc += s
    return rd.from_arrow_refs(
        [_plan_block.remote(r, b, target_bytes)
         for r, b in zip(refs, bases)])


def shard_plan_oracle_sql(docs_cte: str, *, target_bytes: int) -> str:
    """DuckDB twin over a (doc_id, n_bytes) CTE: the same exclusive
    window cumsum and floor-division shard rule."""
    return f"""
        WITH nb AS ({docs_cte}),
        cum AS (
            SELECT doc_id, n_bytes,
                   COALESCE(SUM(n_bytes) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS bytes_before
            FROM nb)
        SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
               CAST(bytes_before // {target_bytes} AS BIGINT) AS shard_id,
               CAST(bytes_before % {target_bytes} AS BIGINT) AS shard_offset
        FROM cum"""
