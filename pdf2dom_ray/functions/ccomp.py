"""Connected components over an edge set (hash-min label propagation).

The fifth member of the graph family (PageRank, HITS, triangles, BFS
depths): ``component[v]`` = the minimum node id reachable from ``v``
treating edges as undirected — the mirror-cluster / dedup-cluster /
link-farm grouping primitive (the dedup pipelines use the same
algorithm internally via ``dedup.py``; this exposes it as a
first-class graph operator over arbitrary edge tables).

Semantics: bounded ``rounds``-step synchronous hash-min — after round
k every node carries the min id within k undirected hops, so
``rounds ≥ diameter`` yields the true components and any smaller
bound is still a closed-form, partition-independent quantity the
unrolled SQL oracle replays (same bounded-round convention as
``bfs.py``).

Scale shape: reuses ``graphbsp.ShardedGraph`` with BOTH layouts (the
HITS configuration) — per round, 2·P scatter tasks push labels along
src→target and target→src edges grouped by the receiving shard and P
gather tasks min-merge; the exchange volume is O(m) node ids, no
payloads. Min-merge is order-independent, so labels are identical
under any partitioning (locked against the driver path by tests).
Below ``driver_edge_limit`` the whole recurrence is one numpy loop on
integer codes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["cc_labels", "cc_oracle_sql"]


def _driver_cc(df: pd.DataFrame, rounds: int) -> pa.Table:
    src = df["src"].to_numpy()
    tgt = df["target"].to_numpy()
    nodes, codes = np.unique(np.concatenate([src, tgt]),
                             return_inverse=True)
    si, ti = codes[:len(src)], codes[len(src):]
    # integer codes preserve id order (np.unique sorts), so min-code
    # propagation == min-id propagation
    lbl = np.arange(len(nodes), dtype=np.int64)
    for _ in range(rounds):
        nxt = lbl.copy()          # synchronous: candidates read lbl
        np.minimum.at(nxt, ti, lbl[si])
        np.minimum.at(nxt, si, lbl[ti])
        if np.array_equal(nxt, lbl):
            break
        lbl = nxt
    return pa.table({"node": pa.array(nodes.tolist()),
                     "component": pa.array(nodes[lbl].tolist())})


def cc_labels(edges: rd.Dataset, *, rounds: int = 8,
              driver_edge_limit: int = 5_000_000,
              n_part: int | None = None) -> rd.Dataset:
    """(node, component) for every endpoint of ``edges`` —
    component = min reachable node id within ``rounds`` undirected
    hops. ``edges``: (src, target) rows, duplicates fine."""
    from ..scale import scale_partitions
    from .bfs import _thin
    from .graphbsp import ShardedGraph

    thin = _thin(edges).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "component": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        return rd.from_arrow(_driver_cc(thin.to_pandas(), rounds))

    P = n_part or scale_partitions()
    g = ShardedGraph.build(thin, P, both_directions=True)

    @ray.remote
    def init_lbl(node_shard):
        urls, _ = node_shard
        return np.asarray(urls, dtype=object)   # label = own id

    @ray.remote
    def scatter(edge_shard, lbl):
        key_idx, other_idx, offsets = edge_shard
        cand = lbl[key_idx]
        out = tuple((other_idx[offsets[q]:offsets[q + 1]],
                     cand[offsets[q]:offsets[q + 1]])
                    for q in range(len(offsets) - 1))
        # num_returns=P only unpacks for P>1; at P==1 return the
        # single piece itself so the gather unpack sees (idx, cand)
        return out if len(out) > 1 else out[0]

    @ray.remote
    def gather(lbl, *pieces):
        nxt = lbl.copy()
        for idx, cand in pieces:
            np.minimum.at(nxt, idx, cand)       # object-dtype min is
        return nxt                              # Python-level but exact

    @ray.remote
    def finalize(node_shard, lbl) -> pa.Table:
        urls, _ = node_shard
        return pa.table({"node": pa.array(np.asarray(urls).tolist()),
                         "component": pa.array(lbl.tolist())})

    lbl = [init_lbl.remote(g.node_shards[q]) for q in range(P)]
    for _ in range(rounds):
        fwd = [scatter.options(num_returns=P)
               .remote(g.edges_by_src[p], lbl[p]) for p in range(P)]
        rev = [scatter.options(num_returns=P)
               .remote(g.edges_by_tgt[p], lbl[p]) for p in range(P)]
        if P == 1:
            fwd, rev = [[s] for s in fwd], [[s] for s in rev]
        lbl = [gather.remote(lbl[q],
                             *[fwd[p][q] for p in range(P)],
                             *[rev[p][q] for p in range(P)])
               for q in range(P)]

    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], lbl[q]) for q in range(P)])


def cc_oracle_sql(edges_cte: str, *, rounds: int = 8) -> str:
    """Unrolled ``rounds``-step synchronous hash-min in DuckDB. Every
    per-round CTE is AS MATERIALIZED (CLAUDE.md invariant: a CTE
    referenced twice per level re-evaluates exponentially if
    inlined)."""
    parts = [f"""WITH e AS MATERIALIZED ({edges_cte}),
        ee AS MATERIALIZED (
            SELECT src AS a, target AS b FROM e
            UNION ALL SELECT target, src FROM e),
        l0 AS MATERIALIZED (
            SELECT a AS node, min(a) AS lbl FROM (
                SELECT a FROM ee UNION ALL SELECT b FROM ee)
            GROUP BY a)"""]
    for k in range(rounds):
        parts.append(f""",
        l{k + 1} AS MATERIALIZED (
            SELECT node, min(lbl) AS lbl FROM (
                SELECT node, lbl FROM l{k}
                UNION ALL
                SELECT ee.b AS node, l{k}.lbl AS lbl
                FROM ee JOIN l{k} ON ee.a = l{k}.node
            ) GROUP BY node)""")
    parts.append(f"\nSELECT node, lbl AS component FROM l{rounds}")
    return "".join(parts)
