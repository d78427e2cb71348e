"""Bounded-radius closeness centrality (exact bitset balls).

The geometric sibling of ``harmonic.py``: instead of Σ 1/d it carries
the two integer components every closeness variant is built from —

    reached(v)   = |{u : 0 < d(u→v) ≤ R}|
    totdist_w(v) = Σ_{u : 0 < d(u→v) ≤ R} d(u→v)

(classic closeness = reached/totdist, Lin's index = reached²/totdist;
both are post-hoc divisions of these integers, kept un-divided so the
distributed result hash-matches the DuckDB oracle exactly — the
CLAUDE.md integer-aggregate invariant). Directed INBOUND distances
truncated at ``radius``, the bounded-round convention of
``bfs.py``/``harmonic.py``.

Same reach-set recurrence as harmonic (S_{t+1}(v) = S_t(v) ∪
⋃_{(u,v)∈E} S_t(u), idempotent under OR — duplicates and self-loops
are no-ops), weighting each round's cardinality delta by the hop
number k instead of lcm//k. Scale shape identical to harmonic.py:
below ``driver_edge_limit`` one numpy loop over a packed uint8 bit
matrix; beyond, the graphbsp BSP loop (P scatter + P gather per
round, shard-local pre-OR so exchange volume is unique-targets ×
width); at true web scale the bitset swaps for the HLL registers of
``hyperball.py`` — the documented sketch path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .harmonic import _counts, _or_rows

__all__ = ["closeness_centrality", "closeness_oracle_sql"]


def _driver_closeness(df: pd.DataFrame, radius: int) -> pa.Table:
    src = df["src"].to_numpy()
    tgt = df["target"].to_numpy()
    nodes, codes = np.unique(np.concatenate([src, tgt]),
                             return_inverse=True)
    n = len(nodes)
    si, ti = codes[:len(src)], codes[len(src):]
    combo = np.unique(si.astype(np.int64) * n + ti)
    si, ti = combo // n, combo % n
    width = (n + 7) // 8
    bits = np.zeros((n, width), dtype=np.uint8)
    rows = np.arange(n)
    bits[rows, rows >> 3] = np.uint8(1) << (rows & 7).astype(np.uint8)
    cnt = np.ones(n, dtype=np.int64)
    acc = np.zeros(n, dtype=np.int64)
    for k in range(1, radius + 1):
        uniq, red = _or_rows(bits, si, ti)
        nxt = bits.copy()
        nxt[uniq] |= red
        ncnt = _counts(nxt)
        if np.array_equal(ncnt, cnt):
            break                 # balls saturated: later deltas are 0
        acc += (ncnt - cnt) * k
        bits, cnt = nxt, ncnt
    return pa.table({"node": pa.array(nodes.tolist()),
                     "reached": pa.array(cnt - 1, pa.int64()),
                     "totdist_w": pa.array(acc, pa.int64())})


def closeness_centrality(edges: rd.Dataset, *, radius: int = 4,
                         driver_edge_limit: int = 5_000_000,
                         n_part: int | None = None) -> rd.Dataset:
    """(node, reached, totdist_w) over directed (src, target) edges —
    the exact-integer components of ≤``radius``-hop closeness."""
    from ..scale import scale_partitions
    from .bfs import _thin
    from .graphbsp import ShardedGraph

    thin = _thin(edges).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "reached": pa.array([], pa.int64()),
            "totdist_w": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        return rd.from_arrow(_driver_closeness(thin.to_pandas(),
                                               radius))

    P = n_part or scale_partitions()
    g = ShardedGraph.build(thin, P)

    @ray.remote
    def shard_size(node_shard) -> int:
        return len(node_shard[0])

    sizes = ray.get([shard_size.remote(g.node_shards[q])
                     for q in range(P)])
    width = (max(sizes) * P + 7) // 8

    @ray.remote
    def init_state(node_shard, q):
        urls, _ = node_shard
        n_loc = len(urls)
        bits = np.zeros((n_loc, width), dtype=np.uint8)
        gid = np.arange(n_loc, dtype=np.int64) * P + q
        bits[np.arange(n_loc), gid >> 3] = \
            np.uint8(1) << (gid & 7).astype(np.uint8)
        return bits, np.ones(n_loc, dtype=np.int64), \
            np.zeros(n_loc, dtype=np.int64)

    @ray.remote
    def scatter(edge_shard, state):
        src_idx, tgt_idx, offsets = edge_shard
        bits = state[0]
        out = []
        for q in range(P):
            lo, hi = offsets[q], offsets[q + 1]
            if hi <= lo:
                out.append((np.empty(0, dtype=np.int64),
                            np.empty((0, width), dtype=np.uint8)))
                continue
            out.append(_or_rows(bits, src_idx[lo:hi], tgt_idx[lo:hi]))
        return tuple(out) if P > 1 else out[0]

    @ray.remote
    def gather(state, k, *pieces):
        bits, cnt, acc = state
        nxt = bits.copy()
        for idx, rows in pieces:
            if len(idx):
                nxt[idx] |= rows
        ncnt = _counts(nxt)
        return nxt, ncnt, acc + (ncnt - cnt) * k

    @ray.remote
    def finalize(node_shard, state) -> pa.Table:
        urls, _ = node_shard
        return pa.table({
            "node": pa.array(np.asarray(urls).tolist()),
            "reached": pa.array(state[1] - 1, pa.int64()),
            "totdist_w": pa.array(state[2], pa.int64())})

    state = [init_state.remote(g.node_shards[q], q) for q in range(P)]
    for k in range(1, radius + 1):
        scat = [scatter.options(num_returns=P)
                .remote(g.edges_by_src[p], state[p]) for p in range(P)]
        if P == 1:
            scat = [[s] for s in scat]
        state = [gather.remote(state[q], k,
                               *[scat[p][q] for p in range(P)])
                 for q in range(P)]

    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], state[q]) for q in range(P)])


def closeness_oracle_sql(edges_cte: str, *, radius: int = 4) -> str:
    """Unrolled ``radius``-hop reach growth with distance-weighted
    deltas. Per-level CTEs AS MATERIALIZED (CLAUDE.md invariant)."""
    parts = [f"""WITH e AS MATERIALIZED ({edges_cte}),
        n0 AS MATERIALIZED (
            SELECT src AS node FROM e
            UNION SELECT target FROM e),
        r0 AS MATERIALIZED (SELECT node, node AS reach FROM n0),
        c0 AS MATERIALIZED (SELECT node, count(*) AS c FROM r0
                            GROUP BY node)"""]
    for k in range(radius):
        parts.append(f""",
        r{k + 1} AS MATERIALIZED (
            SELECT DISTINCT node, reach FROM (
                SELECT node, reach FROM r{k}
                UNION ALL
                SELECT e.target AS node, r.reach
                FROM e JOIN r{k} r ON e.src = r.node)),
        c{k + 1} AS MATERIALIZED (SELECT node, count(*) AS c
                                  FROM r{k + 1} GROUP BY node)""")
    deltas = " + ".join(
        f"(c{k + 1}.c - c{k}.c) * {k + 1}" for k in range(radius))
    joins = "".join(f" JOIN c{k} ON c{k}.node = n0.node"
                    for k in range(radius + 1))
    parts.append(f"""
        SELECT n0.node AS node,
               CAST(c{radius}.c - 1 AS BIGINT) AS reached,
               CAST({deltas} AS BIGINT) AS totdist_w
        FROM n0{joins}""")
    return "".join(parts)
