"""Katz centrality over a link graph (damped all-walk counting).

Katz (1953) status index: a node's score sums ALL inbound walks,
damped geometrically by length — ``c = Σ_k α^k (Aᵀ)^k 1``.  Unlike
PageRank it does not normalize by out-degree, so a page hoarding
outlinks still passes full weight along each — the complementary
signal link-spam analyses pair with PageRank (TrustRank-style seed
bias demotes, Katz exposes walk-mass concentration).  The reference
engine has no graph op; this extends the corpus-level graph family
(pagerank/hits/salsa/trustrank) per SURVEY §2.

Semantics
---------
Bounded synchronous recurrence in **fixed-point int64** (SCALE = 1e9,
α = ALPHA_NUM/ALPHA_DEN):

    c_0(v)     = SCALE                      (β = 1 unit base)
    c_{k+1}(v) = SCALE + (Σ_{u→v} c_k(u)) * ALPHA_NUM // ALPHA_DEN

over the distinct edge set.  Every division is an integer floor
applied AFTER the order-independent int64 sum, so the result is
bit-exact under any partitioning and the unrolled DuckDB oracle
(``katz_oracle_sql``) hash-matches exactly.  Convergence/overflow:
the truncated series needs α·d_in^max < 1 in the worst case
(α < 1/λ_max in general — Katz's own condition); with the default
α = 0.15 scores stay int64-safe for max in-degree ≲ 6 at unbounded
depth, and for bounded ``iterations`` K the mass is ≤
SCALE·Σ_{k≤K}(α·d_in^max)^k — callers with hub-heavy graphs should
lower α (the registered driver query's synthetic digraph has
in-degree ≤ 3).

Scale shape (100 TB reading)
----------------------------
Identical to pagerank's: below ``driver_edge_limit`` distinct edges
one numpy loop on the driver; beyond it the raw-task BSP layout
(functions/graphbsp.py) — P scatter + P gather tasks per iteration
moving P² small (tgt_idx, contrib) pieces, with NO per-iteration
driver synchronization at all (Katz has no dangling-mass scalar), so
the driver issues K·2P tasks and waits once.  Peak task memory
O((n+m)/P); results bit-identical across paths (locked by tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .pagerank import _thin

__all__ = ["SCALE", "ALPHA_NUM", "ALPHA_DEN", "katz_centrality",
           "katz_reference", "katz_oracle_sql"]

SCALE = 10 ** 9
ALPHA_NUM, ALPHA_DEN = 15, 100        # α = 0.15


def katz_centrality(edges: rd.Dataset, *, iterations: int = 5,
                    scale: int = SCALE,
                    alpha_num: int = ALPHA_NUM,
                    alpha_den: int = ALPHA_DEN,
                    driver_edge_limit: int = 5_000_000,
                    n_part: int | None = None) -> rd.Dataset:
    """(src, target) edge rows → (node, katz:int64) fixed-point
    scores.  Duplicate edges fine (the graph is the distinct set);
    node dtype follows the input (int ids or url strings)."""
    from ..scale import scale_partitions
    from .graphbsp import ShardedGraph

    thin = _thin(edges, ["src", "target"]).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "katz": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        return _katz_driver(thin, iterations, scale,
                            alpha_num, alpha_den)

    P = n_part or scale_partitions()
    g = ShardedGraph.build(thin, P)

    @ray.remote
    def init_rank(node_shard):
        urls, _ = node_shard
        return np.full(len(urls), scale, dtype=np.int64)

    @ray.remote
    def scatter(edge_shard, rank):
        src_idx, tgt_idx, offsets = edge_shard
        contrib = rank[src_idx]
        out = tuple((tgt_idx[offsets[q]:offsets[q + 1]],
                     contrib[offsets[q]:offsets[q + 1]])
                    for q in range(P))
        # num_returns=P only unpacks for P>1; at P==1 return the
        # single piece itself so the gather unpack sees (idx, contrib)
        return out if P > 1 else out[0]

    @ray.remote
    def gather(node_shard, *pieces):
        urls, _ = node_shard
        in_sum = np.zeros(len(urls), dtype=np.int64)
        for tgt_idx, contrib in pieces:
            np.add.at(in_sum, tgt_idx, contrib)
        return scale + in_sum * alpha_num // alpha_den

    @ray.remote
    def finalize(node_shard, rank) -> pa.Table:
        return pa.table({"node": pa.array(node_shard[0].tolist()),
                         "katz": pa.array(rank, pa.int64())})

    ranks = [init_rank.remote(s) for s in g.node_shards]
    for _ in range(iterations):
        scat = [scatter.options(num_returns=P)
                .remote(g.edges_by_src[p], ranks[p]) for p in range(P)]
        if P == 1:
            scat = [[s] for s in scat]
        ranks = [gather.remote(g.node_shards[q],
                               *[scat[p][q] for p in range(P)])
                 for q in range(P)]

    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], ranks[q]) for q in range(P)])


def _katz_driver(e: rd.Dataset, iterations: int, scale: int,
                 alpha_num: int, alpha_den: int) -> rd.Dataset:
    """Bounded-size exact path: factorize nodes, numpy int64 loop.
    Same global-dedup-via-edge-codes trick as pagerank's driver path
    (batch-thinned input may still repeat edges across batches)."""
    t = pa.concat_tables(b for b in ray.get(e.to_arrow_refs())
                         if b.num_columns)
    src = np.asarray(t.column("src").to_pandas(), dtype=object)
    tgt = np.asarray(t.column("target").to_pandas(), dtype=object)
    nodes, idx = np.unique(np.concatenate([src, tgt]),
                           return_inverse=True)
    n = len(nodes)
    codes = np.unique(idx[:len(src)].astype(np.int64) * n
                      + idx[len(src):])
    src_id, tgt_id = codes // n, codes % n
    rank = np.full(n, scale, dtype=np.int64)
    for _ in range(iterations):
        in_sum = np.zeros(n, dtype=np.int64)
        np.add.at(in_sum, tgt_id, rank[src_id])
        rank = scale + in_sum * alpha_num // alpha_den
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes.tolist()),
        "katz": pa.array(rank, pa.int64())}))


def katz_reference(edge_list, *, iterations: int = 5,
                   scale: int = SCALE, alpha_num: int = ALPHA_NUM,
                   alpha_den: int = ALPHA_DEN) -> dict:
    """Pure-Python reference of the same integer recurrence (tests)."""
    edges = sorted(set(edge_list))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    rank = {v: scale for v in nodes}
    for _ in range(iterations):
        in_sum = {v: 0 for v in nodes}
        for u, v in edges:
            in_sum[v] += rank[u]
        rank = {v: scale + in_sum[v] * alpha_num // alpha_den
                for v in nodes}
    return rank


def katz_oracle_sql(edges_cte: str, *, iterations: int = 5,
                    scale: int = SCALE, alpha_num: int = ALPHA_NUM,
                    alpha_den: int = ALPHA_DEN) -> str:
    """Unrolled-iteration DuckDB SQL of the same integer recurrence.
    Every per-round CTE is AS MATERIALIZED (CLAUDE.md invariant —
    r{k} is referenced twice per level; an inlining planner would
    re-evaluate it exponentially)."""
    parts = [f"""
        WITH raw_e AS ({edges_cte}),
        e AS (SELECT DISTINCT src, target FROM raw_e),
        nodes AS (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM e
                   UNION ALL SELECT target FROM e)),
        r0 AS MATERIALIZED (SELECT node, CAST({scale} AS BIGINT)
                            AS katz FROM nodes)"""]
    for k in range(iterations):
        parts.append(f""",
        s{k} AS MATERIALIZED (SELECT e.target AS node,
                        SUM(r.katz) AS in_sum
                 FROM e JOIN r{k} r ON e.src = r.node
                 GROUP BY e.target),
        r{k + 1} AS MATERIALIZED (SELECT nd.node,
                        CAST({scale} + (COALESCE(s.in_sum, 0)
                             * {alpha_num}) // {alpha_den} AS BIGINT)
                            AS katz
                     FROM nodes nd LEFT JOIN s{k} s
                       ON nd.node = s.node)""")
    parts.append(f"\n        SELECT node, katz FROM r{iterations}")
    return "".join(parts)
