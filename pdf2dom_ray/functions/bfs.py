"""BFS shortest-path depths over an edge set (crawl-depth analysis).

The fourth member of the graph family (PageRank, HITS, triangles,
connected components): ``depth[v]`` = fewest directed hops from any
seed, the quantity crawl schedulers ration politeness budgets by and
link-graph quality filters threshold on (pages far from any seed are
disproportionately spam/spider traps).

Semantics: bounded ``rounds``-step relaxation — ``depth[v]`` is the
shortest path length ≤ ``rounds`` (min-plus recurrence, one round per
synchronization). A fixed round count keeps the result a closed form
the unrolled SQL oracle replays; pass ``rounds ≥ diameter`` for the
full BFS fixpoint.

Scale shape mirrors pagerank's BSP path (functions/graphbsp.py): the
layout derives from batch-distinct edge blocks with raw tasks; per
round P scatter + P gather tasks move candidate (target, depth+1)
relaxations grouped by target shard; min-merge is order-independent
int64, so depths are bit-exact under any partitioning. Below
``driver_edge_limit`` the whole recurrence runs as one numpy loop on
the driver (same arithmetic, locked identical by tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["bfs_depths", "bfs_oracle_sql"]

_INF = np.int64(1) << 62


def _thin(edges: rd.Dataset) -> rd.Dataset:
    def local(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"src": t.column("src").to_pandas(),
                           "target": t.column("target").to_pandas()})
        df = df.drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)
    return edges.map_batches(local, batch_format="pyarrow")


def _driver_bfs(df: pd.DataFrame, seeds, rounds: int) -> pa.Table:
    src = df["src"].to_numpy()
    tgt = df["target"].to_numpy()
    nodes = np.unique(np.concatenate([src, tgt]))
    si = np.searchsorted(nodes, src)
    ti = np.searchsorted(nodes, tgt)
    dist = np.full(len(nodes), _INF, dtype=np.int64)
    # seeds outside the node universe are ignored (depth is defined
    # over the graph's nodes; both paths agree, locked by tests)
    sd = np.asarray(sorted(seeds))
    pos = np.minimum(np.searchsorted(nodes, sd), len(nodes) - 1)
    dist[pos[nodes[pos] == sd]] = 0
    for _ in range(rounds):
        cand = dist[si] + 1
        nxt = dist.copy()
        np.minimum.at(nxt, ti, cand)
        if np.array_equal(nxt, dist):
            break
        dist = nxt
    keep = dist < _INF
    return pa.table({
        "node": pa.array(nodes[keep].tolist(), pa.int64()),
        "depth": pa.array(dist[keep], pa.int64())})


def bfs_depths(edges: rd.Dataset, seeds, *, rounds: int = 8,
               driver_edge_limit: int = 5_000_000,
               n_part: int | None = None) -> rd.Dataset:
    """(node, depth) for every node reachable from ``seeds`` within
    ``rounds`` hops. ``edges``: (src, target) rows, duplicates fine."""
    from ..scale import scale_partitions
    from .graphbsp import ShardedGraph, _shard_of

    thin = _thin(edges).materialize()
    n_thin = thin.count()
    if n_thin == 0:        # no nodes at all (depths are over nodes)
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "depth": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        return rd.from_arrow(_driver_bfs(thin.to_pandas(), seeds,
                                         rounds))

    P = n_part or scale_partitions()
    g = ShardedGraph.build(thin, P)

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
        src_idx, tgt_idx, offsets = edge_shard
        cand = dist[src_idx] + 1
        out = tuple((tgt_idx[offsets[q]:offsets[q + 1]],
                     cand[offsets[q]:offsets[q + 1]])
                    for q in range(P))
        # num_returns=P only unpacks for P>1; at P==1 return the
        # single piece itself so the gather unpack sees (idx, cand)
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
            "node": pa.array(np.asarray(urls)[keep].tolist(),
                             pa.int64()),
            "depth": pa.array(dist[keep], pa.int64())})

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


def bfs_oracle_sql(edges_cte: str, seeds_sql: str, *,
                   rounds: int = 8) -> str:
    """Unrolled ``rounds``-step min-relaxation in DuckDB. Every
    per-round CTE is AS MATERIALIZED (CLAUDE.md invariant: a CTE
    referenced twice per level re-evaluates exponentially if
    inlined)."""
    parts = [f"WITH e AS MATERIALIZED ({edges_cte}),",
             f"d0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT)"
             f" AS depth FROM ({seeds_sql}))"]
    for k in range(rounds):
        parts.append(f""",
        d{k + 1} AS MATERIALIZED (
            SELECT node, CAST(min(depth) AS BIGINT) AS depth FROM (
                SELECT node, depth FROM d{k}
                UNION ALL
                SELECT e.target AS node, d{k}.depth + 1 AS depth
                FROM e JOIN d{k} ON e.src = d{k}.node
            ) GROUP BY node)""")
    parts.append(f"\nSELECT node, depth FROM d{rounds}")
    return "".join(parts)
