"""Weighted single-source shortest paths (bounded Bellman-Ford).

The weighted twin of ``bfs.py``: crawl schedulers cost a hop by
politeness delay or fetch latency, link-quality filters by inverse
anchor trust — the "distance from the seeds" those pipelines
threshold on is a WEIGHTED min-plus distance, not a hop count.

Semantics: bounded ``rounds``-step relaxation over the min-collapsed
distinct edge set —

    w(u,v)    = MIN over duplicate (u,v) rows   (parallel-edge rule)
    dist₀(s)  = 0 for seeds, ∞ otherwise
    dist_{k+1}(v) = min(dist_k(v), min_{(u,v)} dist_k(u) + w(u,v))

i.e. the cheapest ≤``rounds``-hop path (pass rounds ≥ diameter for
the full fixpoint; negative weights are accepted under the same
bounded-hop semantics). All-int64 min-merge is order-independent, so
results are bit-exact under any partitioning and the unrolled DuckDB
oracle replays them. Weights must stay below 2^61 so ∞-guarded sums
cannot overflow.

Scale shape mirrors bfs.py: one narrow (src,target)→MIN(w) exchange
collapses parallel edges, then below ``driver_edge_limit`` a numpy
loop; beyond, the weighted ``ShardedGraph`` layout (the weight array
rides the pinned edge shards) with P scatter + P gather raw tasks per
round moving only (target_idx, candidate) pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Min

from .dedup import _to_arrow_blocks
from .pagerank import _thin

__all__ = ["sssp_distances", "sssp_oracle_sql"]

_INF = np.int64(1) << 62


def _min_edges(edges: rd.Dataset) -> rd.Dataset:
    """Distinct (src, target) with the MIN weight — batch-local
    pandas min partials first, then one narrow groupby."""
    import pandas as pd

    def local(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "src": t.column("src").to_pandas(),
            "target": t.column("target").to_pandas(),
            "w": t.column("w").to_pandas().astype("int64")})
        g = df.groupby(["src", "target"], as_index=False)["w"].min()
        return pa.Table.from_pandas(g, preserve_index=False)

    thin = _thin(edges, ["src", "target", "w"]).map_batches(
        local, batch_format="pyarrow")
    return _to_arrow_blocks(
        thin.groupby(["src", "target"]).aggregate(
            Min("w", alias_name="w")))


def _driver_sssp(t: pa.Table, seeds, rounds: int) -> pa.Table:
    src = np.asarray(t.column("src").to_pandas(), dtype=object)
    tgt = np.asarray(t.column("target").to_pandas(), dtype=object)
    w = np.asarray(t.column("w").to_pandas(), dtype=np.int64)
    nodes = np.unique(np.concatenate([src, tgt]))
    si = np.searchsorted(nodes, src)
    ti = np.searchsorted(nodes, tgt)
    dist = np.full(len(nodes), _INF, dtype=np.int64)
    sd = np.asarray(sorted(seeds))
    if len(sd) and len(nodes):
        pos = np.minimum(np.searchsorted(nodes, sd), len(nodes) - 1)
        dist[pos[nodes[pos] == sd]] = 0
    for _ in range(rounds):
        du = dist[si]
        cand = np.where(du >= _INF, _INF, du + w)
        nxt = dist.copy()
        np.minimum.at(nxt, ti, cand)
        if np.array_equal(nxt, dist):
            break
        dist = nxt
    keep = dist < _INF
    return pa.table({
        "node": pa.array(nodes[keep].tolist()),
        "dist": pa.array(dist[keep], pa.int64())})


def sssp_distances(edges: rd.Dataset, seeds, *, rounds: int = 8,
                   driver_edge_limit: int = 5_000_000,
                   n_part: int | None = None) -> rd.Dataset:
    """(src, target, w:int64) rows → (node, dist:int64) for every
    node reachable from ``seeds`` within ``rounds`` weighted hops."""
    from ..scale import scale_partitions
    from .graphbsp import ShardedGraph, _shard_of

    e = _min_edges(edges).materialize()
    n_e = e.count()
    if n_e == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64())}))
    if n_e <= driver_edge_limit:
        tab = pa.concat_tables(b for b in ray.get(e.to_arrow_refs())
                               if b.num_columns)
        return rd.from_arrow(_driver_sssp(tab, seeds, rounds))

    P = n_part or scale_partitions()
    # min-collapsed input is globally distinct: the weighted build's
    # duplicate-weight SUM is a no-op, so shard weights == MIN(w)
    g = ShardedGraph.build(e, P, weighted=True)

    @ray.remote
    def init_dist(node_shard, shard_seeds):
        urls, _ = node_shard
        dist = np.full(len(urls), _INF, dtype=np.int64)
        if len(shard_seeds) and len(urls):
            pos = np.minimum(np.searchsorted(urls, shard_seeds),
                             len(urls) - 1)
            dist[pos[urls[pos] == shard_seeds]] = 0
        return dist

    @ray.remote
    def scatter(edge_shard, dist):
        src_idx, tgt_idx, offsets, w = edge_shard
        du = dist[src_idx]
        cand = np.where(du >= _INF, _INF, du + w)
        out = tuple((tgt_idx[offsets[q]:offsets[q + 1]],
                     cand[offsets[q]:offsets[q + 1]])
                    for q in range(P))
        return out if P > 1 else out[0]

    @ray.remote
    def gather(dist, *pieces):
        nxt = dist.copy()
        for idx, cand in pieces:
            np.minimum.at(nxt, idx, cand)
        return nxt

    @ray.remote
    def finalize(node_shard, dist) -> pa.Table:
        urls, _ = node_shard
        keep = dist < _INF
        return pa.table({
            "node": pa.array(np.asarray(urls)[keep].tolist()),
            "dist": pa.array(dist[keep], pa.int64())})

    seed_arr = np.asarray(sorted(seeds), dtype=object)
    ssh = _shard_of(seed_arr, P)
    dist = [init_dist.remote(g.node_shards[q],
                             np.sort(seed_arr[ssh == q]))
            for q in range(P)]
    for _ in range(rounds):
        scat = [scatter.options(num_returns=P)
                .remote(g.edges_by_src[p], dist[p]) for p in range(P)]
        if P == 1:
            scat = [[s] for s in scat]
        dist = [gather.remote(dist[q], *[scat[p][q] for p in range(P)])
                for q in range(P)]

    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], dist[q]) for q in range(P)])


def sssp_oracle_sql(edges_cte: str, seeds_sql: str, *,
                    rounds: int = 8) -> str:
    """Unrolled weighted min-plus relaxation in DuckDB (the bfs
    oracle with +w; per-round CTEs AS MATERIALIZED per CLAUDE.md)."""
    parts = [f"""WITH raw_e AS ({edges_cte}),
        e AS MATERIALIZED (SELECT src, target,
                           CAST(MIN(w) AS BIGINT) AS w
                           FROM raw_e GROUP BY src, target),""",
             f"d0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT)"
             f" AS dist FROM ({seeds_sql}))"]
    for k in range(rounds):
        parts.append(f""",
        d{k + 1} AS MATERIALIZED (
            SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
                SELECT node, dist FROM d{k}
                UNION ALL
                SELECT e.target AS node, d{k}.dist + e.w AS dist
                FROM e JOIN d{k} ON e.src = d{k}.node
            ) GROUP BY node)""")
    parts.append(f"""
        SELECT node, dist FROM d{rounds}
        WHERE node IN (SELECT src FROM e UNION SELECT target FROM e)""")
    return "".join(parts)
