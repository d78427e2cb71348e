"""Bow-tie classification of a web graph around a pivot (Broder 2000).

Broder et al.'s "Graph structure in the Web" decomposes a crawl graph
into a giant SCC with an IN set (reaches the core), an OUT set
(reached from the core) and the rest — THE structural census every
web-corpus analysis reports, and the quantity crawl planners use to
budget frontier expansion. This operator is the forward-backward
pivot step (also the partition step of Fleischer et al.'s
divide-and-conquer SCC): from a pivot page,

    F = nodes reachable FROM the pivot within ``rounds`` hops
    B = nodes that REACH the pivot within ``rounds`` hops

    cls(v) = SCC  if v ∈ F ∩ B      (pivot's strongly-connected core)
             IN   if v ∈ B \\ F
             OUT  if v ∈ F \\ B
             OTHER otherwise         (tendrils/tubes/disconnected)

Bounded ``rounds`` keeps the result a closed form the SQL oracle
replays (pass rounds ≥ diameter for the exact fixpoint).

Scale shape: a pure composition — two ``bfs_depths`` passes (each
driver-numpy below ``driver_edge_limit``, raw-task BSP scatter/gather
beyond; see functions/bfs.py) plus ONE tag-sum groupby for the
classification: edge endpoints contribute tag 0 (the node universe),
F rows tag 1, B rows tag 2 — the per-node sum 0..3 IS the class, so
no joins at all and the only exchange moves narrow (node, int8) rows.
Node ids are int64 (the bfs contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from .bfs import bfs_depths
from .dedup import _to_arrow_blocks
from .pagerank import _thin

__all__ = ["bowtie_classify", "bowtie_oracle_sql"]

_CLS = np.array(["OTHER", "OUT", "IN", "SCC"], dtype=object)


def bowtie_classify(edges: rd.Dataset, pivot: int, *,
                    rounds: int = 8,
                    driver_edge_limit: int = 5_000_000) -> rd.Dataset:
    """(src, target) int64 edge rows → (node, cls) with cls ∈
    {SCC, IN, OUT, OTHER} relative to ``pivot``'s ≤``rounds``-hop
    forward/backward reach."""
    thin = _thin(edges, ["src", "target"]).materialize()
    if thin.count() == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "cls": pa.array([], pa.string())}))

    def swap(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("target"),
                         "target": t.column("src")})

    fwd = bfs_depths(thin, [pivot], rounds=rounds,
                     driver_edge_limit=driver_edge_limit)
    bwd = bfs_depths(thin.map_batches(swap, batch_format="pyarrow"),
                     [pivot], rounds=rounds,
                     driver_edge_limit=driver_edge_limit)

    def zeros(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays([
            t.column("src").combine_chunks().cast(pa.int64()),
            t.column("target").combine_chunks().cast(pa.int64())])
        return pa.table({"node": node,
                         "tag": pa.array(np.zeros(len(node), np.int64),
                                         pa.int64())})

    def tag(k: int):
        def inner(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t.column("node"),
                "tag": pa.array(np.full(t.num_rows, k, np.int64),
                                pa.int64())})
        return inner

    u = thin.map_batches(zeros, batch_format="pyarrow").union(
        fwd.map_batches(tag(1), batch_format="pyarrow"),
        bwd.map_batches(tag(2), batch_format="pyarrow"))
    agg = _to_arrow_blocks(
        u.groupby("node").aggregate(Sum("tag", alias_name="tag")))

    def classify(t: pa.Table) -> pa.Table:
        tags = np.asarray(t.column("tag"), dtype=np.int64)
        return pa.table({
            "node": t.column("node").cast(pa.int64()),
            "cls": pa.array(_CLS[tags].tolist(), pa.string())})

    return agg.map_batches(classify, batch_format="pyarrow")


def bowtie_oracle_sql(edges_cte: str, pivot_sql: str, *,
                      rounds: int = 8) -> str:
    """Two unrolled BFS oracles (functions/bfs.py) + the class CASE.
    The reach CTEs are referenced once each; the per-round CTEs inside
    them carry their own AS MATERIALIZED per the CLAUDE.md invariant."""
    from .bfs import bfs_oracle_sql
    fwd = bfs_oracle_sql(edges_cte, pivot_sql, rounds=rounds)
    rev = (f"SELECT target AS src, src AS target FROM ({edges_cte})")
    bwd = bfs_oracle_sql(rev, pivot_sql, rounds=rounds)
    return f"""
        WITH fwd AS MATERIALIZED ({fwd}),
        bwd AS MATERIALIZED ({bwd}),
        nodes AS (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM ({edges_cte})
                   UNION ALL
                   SELECT target FROM ({edges_cte})))
        SELECT n.node,
               CASE WHEN f.node IS NOT NULL AND b.node IS NOT NULL
                         THEN 'SCC'
                    WHEN b.node IS NOT NULL THEN 'IN'
                    WHEN f.node IS NOT NULL THEN 'OUT'
                    ELSE 'OTHER' END AS cls
        FROM nodes n
        LEFT JOIN fwd f ON n.node = f.node
        LEFT JOIN bwd b ON n.node = b.node"""
