"""k-core peel over an edge set (bounded synchronous rounds).

The sixth member of the graph family (PageRank, HITS, triangles, BFS
depths, connected components): the k-core is the maximal subgraph in
which every node has undirected degree ≥ k — the link-farm / spam-farm
density primitive for web graphs (Seidman 1983, "Network structure and
minimum degree"; dense cores of the crawl graph flag boilerplate
navigation meshes and SEO rings the way triangles flag mutual-link
cliques).

Semantics: the graph is the DISTINCT undirected pair set (self-loops
dropped, (u,v) ≡ (v,u)); ``rounds`` synchronous peels — each round
recomputes every node's degree within the surviving set and removes
all nodes with degree < k AT ONCE. ``rounds`` large enough to reach
the fixed point yields the true k-core; any smaller bound is still a
closed-form, partition-independent quantity the unrolled SQL oracle
replays (the bounded-round convention of ``bfs.py``/``ccomp.py``).
Output: (node, core_degree) for the surviving nodes, core_degree =
the node's degree within the surviving set (NOT its original degree).
``k`` must be ≥ 1 (the oracle's join-based degree treats missing =
degree 0 = peeled, which is only equivalent for positive k).

Scale shape: reuses ``graphbsp.ShardedGraph`` with BOTH layouts (the
CC configuration — canonical pairs make directed shard-local dedup
exactly undirected dedup); per round, 2·P scatter tasks push 0/1
alive flags along lo→hi and hi→lo edges grouped by the receiving
shard and P gather tasks sum them into degrees; exchange volume is
O(m) int64s, no payloads. Integer scatter-adds are order-independent,
so the surviving set is identical under any partitioning (locked
against the driver path by tests). Below ``driver_edge_limit`` the
whole recurrence is one numpy loop over integer codes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["kcore_nodes", "kcore_oracle_sql"]


def _canonical(edges: rd.Dataset) -> rd.Dataset:
    """Batch-local distinct canonical pairs (src = min endpoint,
    target = max, self-loops dropped) — global dedup is shard-local
    in the driver unique / ShardedGraph builds."""
    def local(t: pa.Table) -> pa.Table:
        s = t.column("src").to_pandas().to_numpy()
        g = t.column("target").to_pandas().to_numpy()
        keep = s != g
        s, g = s[keep], g[keep]
        df = pd.DataFrame({"src": np.minimum(s, g),
                           "target": np.maximum(s, g)}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)
    return edges.map_batches(local, batch_format="pyarrow")


def _mask_degree(ui, vi, alive, n):
    deg = np.zeros(n, dtype=np.int64)
    m = alive[ui] & alive[vi]
    np.add.at(deg, ui[m], 1)
    np.add.at(deg, vi[m], 1)
    return deg


def _driver_kcore(df: pd.DataFrame, k: int, rounds: int) -> pa.Table:
    u = df["src"].to_numpy()
    v = df["target"].to_numpy()
    nodes, codes = np.unique(np.concatenate([u, v]),
                             return_inverse=True)
    n = len(nodes)
    # global undirected dedup: pairs are already canonical, so one
    # np.unique over lo·n+hi kills every duplicate
    combo = np.unique(codes[:len(u)].astype(np.int64) * n
                      + codes[len(u):])
    ui, vi = combo // n, combo % n
    alive = np.ones(n, dtype=bool)
    for _ in range(rounds):
        nxt = alive & (_mask_degree(ui, vi, alive, n) >= k)
        if np.array_equal(nxt, alive):
            break          # fixed point: further rounds are no-ops
        alive = nxt
    deg = _mask_degree(ui, vi, alive, n)
    return pa.table({"node": pa.array(nodes[alive].tolist()),
                     "core_degree": pa.array(deg[alive],
                                             type=pa.int64())})


def kcore_nodes(edges: rd.Dataset, *, k: int = 3, rounds: int = 8,
                driver_edge_limit: int = 5_000_000,
                n_part: int | None = None) -> rd.Dataset:
    """(node, core_degree) for the nodes surviving ``rounds``
    synchronous k-core peels of ``edges`` (treated as undirected,
    duplicates/self-loops fine)."""
    if k < 1:
        raise ValueError("kcore_nodes requires k >= 1")
    from ..scale import scale_partitions
    from .graphbsp import ShardedGraph

    thin = _canonical(edges).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "core_degree": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        return rd.from_arrow(_driver_kcore(thin.to_pandas(), k, rounds))

    P = n_part or scale_partitions()
    g = ShardedGraph.build(thin, P, both_directions=True)

    @ray.remote
    def init_alive(node_shard):
        urls, _ = node_shard
        return np.ones(len(urls), dtype=np.int64)

    @ray.remote
    def scatter(edge_shard, alive):
        key_idx, other_idx, offsets = edge_shard
        cand = alive[key_idx]
        out = tuple((other_idx[offsets[q]:offsets[q + 1]],
                     cand[offsets[q]:offsets[q + 1]])
                    for q in range(len(offsets) - 1))
        # num_returns=P unpacks the tuple for P>1; for P==1 Ray hands
        # back a bare ref to the WHOLE return value, so return the
        # single piece itself (a 1-tuple ref would break the gather
        # unpack)
        return out if len(out) > 1 else out[0]

    def _deg(alive, pieces):
        deg = np.zeros(len(alive), dtype=np.int64)
        for idx, cand in pieces:
            np.add.at(deg, idx, cand)   # order-independent int64
        return deg

    @ray.remote
    def gather(alive, *pieces):
        # a dead sender contributes alive=0; a dead receiver is
        # re-masked by the multiply — together that is the
        # both-endpoints-alive degree of the driver path
        return alive * (_deg(alive, pieces) >= k)

    @ray.remote
    def finalize(node_shard, alive, *pieces) -> pa.Table:
        urls, _ = node_shard
        keep = alive.astype(bool)
        deg = _deg(alive, pieces)
        return pa.table({
            "node": pa.array(np.asarray(urls)[keep].tolist()),
            "core_degree": pa.array(deg[keep], type=pa.int64())})

    def _round(alive):
        fwd = [scatter.options(num_returns=P)
               .remote(g.edges_by_src[p], alive[p]) for p in range(P)]
        rev = [scatter.options(num_returns=P)
               .remote(g.edges_by_tgt[p], alive[p]) for p in range(P)]
        if P == 1:
            fwd, rev = [[s] for s in fwd], [[s] for s in rev]
        return [[fwd[p][q] for p in range(P)]
                + [rev[p][q] for p in range(P)] for q in range(P)]

    alive = [init_alive.remote(g.node_shards[q]) for q in range(P)]
    for _ in range(rounds):
        pieces = _round(alive)
        alive = [gather.remote(alive[q], *pieces[q]) for q in range(P)]
    pieces = _round(alive)       # final degree over the survivors
    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], alive[q], *pieces[q])
         for q in range(P)])


def kcore_oracle_sql(edges_cte: str, *, k: int = 3,
                     rounds: int = 8) -> str:
    """Unrolled ``rounds``-peel k-core in DuckDB. Every per-round CTE
    is AS MATERIALIZED (CLAUDE.md invariant: a CTE referenced twice
    per level re-evaluates exponentially if inlined). The final
    LEFT JOIN keeps bounded-round survivors whose alive-degree
    dropped to 0 in the last peel (the driver path emits them too)."""
    parts = [f"""WITH e AS MATERIALIZED ({edges_cte}),
        und AS MATERIALIZED (
            SELECT DISTINCT least(src, target) AS a,
                            greatest(src, target) AS b
            FROM e WHERE src <> target),
        ee AS MATERIALIZED (
            SELECT a AS u, b AS v FROM und
            UNION ALL SELECT b, a FROM und),
        a0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM ee)"""]
    for r in range(rounds):
        parts.append(f""",
        d{r} AS MATERIALIZED (
            SELECT ee.u AS node, count(*) AS deg
            FROM ee
            JOIN a{r} x ON ee.u = x.node
            JOIN a{r} y ON ee.v = y.node
            GROUP BY ee.u),
        a{r + 1} AS MATERIALIZED (
            SELECT node FROM d{r} WHERE deg >= {k})""")
    parts.append(f""",
        df AS MATERIALIZED (
            SELECT ee.u AS node, count(*) AS deg
            FROM ee
            JOIN a{rounds} x ON ee.u = x.node
            JOIN a{rounds} y ON ee.v = y.node
            GROUP BY ee.u)
        SELECT a.node,
               CAST(COALESCE(df.deg, 0) AS BIGINT) AS core_degree
        FROM a{rounds} a LEFT JOIN df ON a.node = df.node""")
    return "".join(parts)
