"""Bounded-radius harmonic centrality (Boldi & Vigna 2014).

Boldi & Vigna, "Axioms for centrality" (Internet Mathematics 10),
single out HARMONIC centrality H(v) = Σ_{u≠v} 1/d(u→v) (with 1/∞ = 0)
as the only classic geometric centrality satisfying all their axioms,
and compute it on web graphs with HyperBall (Boldi & Vigna 2013,
"In-core computation of geometric centralities with HyperBall"):
per-node reachable-set counters grown one hop per synchronous round,
merged along edges. Ninth member of the graph family (PageRank, HITS,
triangles, BFS, CC, k-core, TrustRank, LPA) — the web-ranking
centrality that, unlike PageRank, rewards being CLOSE to everything
rather than being endorsed.

Semantics: directed distances d(u→v) truncated at ``radius`` R (the
bounded-round convention of ``bfs.py``/``ccomp.py``: the result after
exactly R rounds is a closed form the unrolled SQL oracle replays).
The score is kept EXACT-INTEGER so distributed evaluation hash-matches
the oracle (CLAUDE.md invariant): with W = lcm(1..R),

    harmonic_w(v) = Σ_{k=1..R}  |{u : d(u→v) = k}| · (W // k)

i.e. W × the truncated harmonic sum, an integer because W//k is exact.
Self-loops and duplicate edges are no-ops (the ball recurrence is
idempotent under OR), so no edge-cleaning convention is needed.

Exact counting carries each node's reach SET as a bitset over the
node universe and grows it with S_{t+1}(v) = S_t(v) ∪ ⋃_{(u,v)∈E}
S_t(u) — per-round cost O(m·n/8) bytes of OR-merges, fine up to ~10⁵
nodes. Scale shape: this is bit-for-bit HyperBall's loop — at web
scale one swaps each n/8-byte bitset for a fixed 2^p-register HLL
sketch and the OR-merge for an elementwise register MAX (both
idempotent, commutative, order-independent), making per-round traffic
O(m·2^p) independent of n; counts (hence scores) become approximate,
which is why the exact variant stays the oracle-checked default under
the driver/bitset limits. The sketch twin IS wired —
``hyperball.py::hyperball_sketch`` runs the same loop over md5 HLL
registers with its own exact-integer oracle. The BSP path below reuses
``graphbsp.ShardedGraph``: per round P scatter tasks pre-OR each
destination's incoming rows shard-locally (exchange volume = unique
targets × width, not edges × width) and P gather tasks OR-merge and
re-count; int64 count deltas make the result bit-exact under any
partitioning (locked against the driver path by tests). Below
``driver_edge_limit`` the recurrence is one numpy loop over a packed
uint8 bit matrix with a 256-entry popcount LUT.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["harmonic_centrality", "harmonic_oracle_sql"]

_POPCNT = np.array([bin(i).count("1") for i in range(256)],
                   dtype=np.uint8)


def _weights(radius: int) -> list[int]:
    w = math.lcm(*range(1, radius + 1))
    return [w // k for k in range(1, radius + 1)]


def _or_rows(bits: np.ndarray, src_idx: np.ndarray,
             dst_idx: np.ndarray):
    """(dst-sorted) OR-reduce of ``bits[src_idx]`` per distinct dst:
    returns (unique_dst, reduced rows)."""
    order = np.argsort(dst_idx, kind="stable")
    dst, srt = dst_idx[order], src_idx[order]
    uniq, starts = np.unique(dst, return_index=True)
    return uniq, np.bitwise_or.reduceat(bits[srt], starts, axis=0)


def _counts(bits: np.ndarray) -> np.ndarray:
    return _POPCNT[bits].sum(axis=1, dtype=np.int64)


def _driver_harmonic(df: pd.DataFrame, radius: int) -> pa.Table:
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
    for wk in _weights(radius):
        uniq, red = _or_rows(bits, si, ti)
        nxt = bits.copy()
        nxt[uniq] |= red
        ncnt = _counts(nxt)
        if np.array_equal(ncnt, cnt):
            break                 # balls saturated: later deltas are 0
        acc += (ncnt - cnt) * wk
        bits, cnt = nxt, ncnt
    return pa.table({"node": pa.array(nodes.tolist()),
                     "harmonic_w": pa.array(acc, pa.int64())})


def harmonic_centrality(edges: rd.Dataset, *, radius: int = 4,
                        driver_edge_limit: int = 5_000_000,
                        n_part: int | None = None) -> rd.Dataset:
    """(node, harmonic_w) over directed ``edges`` (src, target):
    harmonic_w = lcm(1..radius) × Σ_{u: 0<d(u→node)≤radius} 1/d(u→node),
    an exact int64. Duplicates/self-loops fine (OR is idempotent)."""
    from ..scale import scale_partitions
    from .bfs import _thin
    from .graphbsp import ShardedGraph

    thin = _thin(edges).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "harmonic_w": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        return rd.from_arrow(_driver_harmonic(thin.to_pandas(), radius))

    P = n_part or scale_partitions()
    g = ShardedGraph.build(thin, P)
    # global bit index of shard q's local node i is i*P + q: unique
    # across shards without a global rank exchange; width covers the
    # largest shard (the ragged tail bits just stay zero)
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
            # pre-OR per destination: exchange volume is unique
            # targets × width, not edges × width
            out.append(_or_rows(bits, src_idx[lo:hi], tgt_idx[lo:hi]))
        return tuple(out) if P > 1 else out[0]

    @ray.remote
    def gather(state, wk, *pieces):
        bits, cnt, acc = state
        nxt = bits.copy()
        for idx, rows in pieces:
            if len(idx):
                nxt[idx] |= rows     # idx unique within each piece
        ncnt = _counts(nxt)
        return nxt, ncnt, acc + (ncnt - cnt) * wk

    @ray.remote
    def finalize(node_shard, state) -> pa.Table:
        urls, _ = node_shard
        return pa.table({"node": pa.array(np.asarray(urls).tolist()),
                         "harmonic_w": pa.array(state[2], pa.int64())})

    state = [init_state.remote(g.node_shards[q], q) for q in range(P)]
    for wk in _weights(radius):
        scat = [scatter.options(num_returns=P)
                .remote(g.edges_by_src[p], state[p]) for p in range(P)]
        if P == 1:
            scat = [[s] for s in scat]
        state = [gather.remote(state[q], wk,
                               *[scat[p][q] for p in range(P)])
                 for q in range(P)]

    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], state[q]) for q in range(P)])


def harmonic_oracle_sql(edges_cte: str, *, radius: int = 4) -> str:
    """Unrolled ``radius``-hop reach-set growth in DuckDB. Every
    per-level CTE is AS MATERIALIZED (CLAUDE.md invariant: r{k} is
    referenced twice per level — carry-over and expansion). Scores
    are the same exact integers as the operator."""
    ws = _weights(radius)
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
        f"(c{k + 1}.c - c{k}.c) * {ws[k]}" for k in range(radius))
    joins = "".join(f" JOIN c{k} ON c{k}.node = n0.node"
                    for k in range(radius + 1))
    parts.append(f"""
        SELECT n0.node AS node,
               CAST({deltas} AS BIGINT) AS harmonic_w
        FROM n0{joins}""")
    return "".join(parts)
