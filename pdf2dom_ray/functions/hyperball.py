"""HyperBall neighborhood sketch (Boldi & Vigna 2013).

Boldi & Vigna, "In-core computation of geometric centralities with
HyperBall" (and Boldi, Rosa & Vigna 2011, "HyperANF"): estimate every
node's neighborhood function |ball(v, r)| at web scale by giving each
node a HyperLogLog counter seeded with its own id and, per synchronous
round, max-merging counters along edges — the same loop as
``harmonic.py``'s exact bitsets with the n/8-byte set swapped for m
one-byte registers, making per-round traffic O(m·edges) INDEPENDENT
of n. This module wires that swap (the scale path the harmonic
docstring documents) as a first-class, oracle-checked operator.

Semantics: after ``radius`` rounds node v's registers are the
register-wise max over exactly ball(v, radius) = {u : d(u→v) ≤
radius} (max is idempotent/commutative/associative, so duplicate
edges, self-loops and delivery order are all no-ops — same argument
as the bitset OR). Register content is the standard HLL pair derived
from md5 of the member id's decimal string: bucket j = first 16 hash
bits mod m, rank ρ = leading-zero count of the next 32 bits + 1.

The CHECKED outputs are kept exact-integer per the CLAUDE.md oracle
invariant: ``ball_regsum = Σ_j 2^(34 − M_j)`` (M_j ≤ 33, so the sum
fits int64 exactly) and ``zero_regs`` (the count of untouched
registers, needed by the small-range correction and NOT recoverable
from the sum) — together the integer core of the HLL estimator. The
float estimate (α·m²·2³⁴ / ball_regsum, linear-counting-corrected)
is exposed as a helper for tests/consumers but kept OUT of the
hashed projection: distributed float arithmetic would flake the
driver's value-hash. md5 of the decimal string evaluates identically
in DuckDB, so the unrolled SQL oracle replays the registers
bit-for-bit.

Scale shape: reuses ``graphbsp.ShardedGraph`` exactly like
``harmonic.py`` — P scatter tasks pre-MAX each destination's incoming
register rows shard-locally (exchange volume = unique targets × m
bytes), P gather tasks max-merge; uint8 max is order-independent, so
results are bit-exact under any partitioning (locked by tests).
Below ``driver_edge_limit`` the recurrence is one numpy loop over an
(n × m) uint8 matrix.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["hyperball_sketch", "hll_ball_estimate",
           "hyperball_oracle_sql"]

_M = 16               # registers per node (p = 4)
_REG_SCALE = 34       # 2^(34 - M_j): M_j ≤ 33 keeps the sum exact
_ALPHA_16 = 0.673     # Flajolet et al. 2007 α_m for m = 16


def _registers(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(bucket j, rank ρ) per id — md5 of the DECIMAL STRING so the
    DuckDB twin reproduces it byte-for-byte."""
    j = np.empty(len(ids), dtype=np.int64)
    rho = np.empty(len(ids), dtype=np.uint8)
    for i, x in enumerate(ids):
        h = hashlib.md5(str(x).encode("utf-8")).hexdigest()
        j[i] = int(h[:4], 16) % _M
        v32 = int(h[4:12], 16)
        rho[i] = 33 if v32 == 0 else 33 - v32.bit_length()
    return j, rho


def _init_regs(ids: np.ndarray) -> np.ndarray:
    regs = np.zeros((len(ids), _M), dtype=np.uint8)
    j, rho = _registers(ids)
    regs[np.arange(len(ids)), j] = rho
    return regs


def _max_rows(regs: np.ndarray, src_idx: np.ndarray,
              dst_idx: np.ndarray):
    """(dst-sorted) register-wise MAX of ``regs[src_idx]`` per
    distinct dst: returns (unique_dst, reduced rows)."""
    order = np.argsort(dst_idx, kind="stable")
    dst, srt = dst_idx[order], src_idx[order]
    uniq, starts = np.unique(dst, return_index=True)
    return uniq, np.maximum.reduceat(regs[srt], starts, axis=0)


def _regsum(regs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(Σ_j 2^(34−M_j), #zero registers) per row — the two exact
    integers the estimator needs (zero count is NOT recoverable from
    the sum: one zero register and two rank-1 registers both
    contribute 2^34)."""
    s = (np.int64(1) << (_REG_SCALE - regs.astype(np.int64))) \
        .sum(axis=1)
    return s, (regs == 0).sum(axis=1).astype(np.int64)


def hll_ball_estimate(ball_regsum: np.ndarray,
                      zero_regs: np.ndarray) -> np.ndarray:
    """Float HLL cardinality estimate from the integer register sum,
    with Flajolet et al.'s small-range linear-counting correction
    (E ≤ 2.5m with zero registers → m·ln(m/V)) — without it the raw
    estimator is badly biased exactly in the ball-size regime."""
    est = _ALPHA_16 * _M * _M * float(1 << _REG_SCALE) \
        / np.asarray(ball_regsum, dtype=np.float64)
    v = np.asarray(zero_regs, dtype=np.float64)
    small = (est <= 2.5 * _M) & (v > 0)
    lin = _M * np.log(_M / np.maximum(v, 1.0))
    return np.where(small, lin, est)


def _driver_hyperball(df: pd.DataFrame, radius: int) -> pa.Table:
    src = df["src"].to_numpy()
    tgt = df["target"].to_numpy()
    nodes, codes = np.unique(np.concatenate([src, tgt]),
                             return_inverse=True)
    n = len(nodes)
    si, ti = codes[:len(src)], codes[len(src):]
    combo = np.unique(si.astype(np.int64) * n + ti)
    si, ti = combo // n, combo % n
    regs = _init_regs(nodes)
    for _ in range(radius):
        uniq, red = _max_rows(regs, si, ti)
        nxt = regs.copy()
        # fancy-indexed assignment (an out= on nxt[uniq] would write
        # into a temporary copy)
        nxt[uniq] = np.maximum(nxt[uniq], red)
        if np.array_equal(nxt, regs):
            break                    # balls saturated
        regs = nxt
    s, z = _regsum(regs)
    return pa.table({"node": pa.array(nodes.tolist()),
                     "ball_regsum": pa.array(s, pa.int64()),
                     "zero_regs": pa.array(z, pa.int64())})


def hyperball_sketch(edges: rd.Dataset, *, radius: int = 4,
                     driver_edge_limit: int = 5_000_000,
                     n_part: int | None = None) -> rd.Dataset:
    """(node, ball_regsum, zero_regs) over directed ``edges``: the
    exact-integer HLL register summary of ball(node, radius) =
    {u : d(u→node) ≤ radius} (self included). Duplicates/self-loops
    fine (max is idempotent); ``hll_ball_estimate`` turns the pair
    into a cardinality estimate."""
    from ..scale import scale_partitions
    from .bfs import _thin
    from .graphbsp import ShardedGraph

    thin = _thin(edges).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "ball_regsum": pa.array([], pa.int64()),
            "zero_regs": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        return rd.from_arrow(_driver_hyperball(thin.to_pandas(),
                                               radius))

    P = n_part or scale_partitions()
    g = ShardedGraph.build(thin, P)

    @ray.remote
    def init_state(node_shard):
        urls, _ = node_shard
        return _init_regs(np.asarray(urls))

    @ray.remote
    def scatter(edge_shard, regs):
        src_idx, tgt_idx, offsets = edge_shard
        out = []
        for q in range(P):
            lo, hi = offsets[q], offsets[q + 1]
            if hi <= lo:
                out.append((np.empty(0, dtype=np.int64),
                            np.empty((0, _M), dtype=np.uint8)))
                continue
            out.append(_max_rows(regs, src_idx[lo:hi], tgt_idx[lo:hi]))
        return tuple(out) if P > 1 else out[0]

    @ray.remote
    def gather(regs, *pieces):
        nxt = regs.copy()
        for idx, rows in pieces:
            if len(idx):
                # idx unique within a piece; an idx repeated across
                # pieces max-merges sequentially (order-independent)
                nxt[idx] = np.maximum(nxt[idx], rows)
        return nxt

    @ray.remote
    def finalize(node_shard, regs) -> pa.Table:
        urls, _ = node_shard
        s, z = _regsum(regs)
        return pa.table({
            "node": pa.array(np.asarray(urls).tolist()),
            "ball_regsum": pa.array(s, pa.int64()),
            "zero_regs": pa.array(z, pa.int64())})

    state = [init_state.remote(g.node_shards[q]) for q in range(P)]
    for _ in range(radius):
        scat = [scatter.options(num_returns=P)
                .remote(g.edges_by_src[p], state[p]) for p in range(P)]
        if P == 1:
            scat = [[s] for s in scat]
        state = [gather.remote(state[q], *[scat[p][q]
                                           for p in range(P)])
                 for q in range(P)]

    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], state[q]) for q in range(P)])


def hyperball_oracle_sql(edges_cte: str, *, radius: int = 4) -> str:
    """Unrolled ``radius``-hop reach-set growth, then md5 registers
    replayed in DuckDB (md5 of the decimal string matches hashlib;
    the 33-arm CASE is the leading-zero count, branch-exact). Every
    per-level CTE is AS MATERIALIZED (CLAUDE.md invariant)."""
    rho_case = "CASE " + " ".join(
        f"WHEN v32 >= {1 << (32 - r)} THEN {r}"
        for r in range(1, 33)) + " ELSE 33 END"
    parts = [f"""WITH e AS MATERIALIZED ({edges_cte}),
        n0 AS MATERIALIZED (
            SELECT src AS node FROM e
            UNION SELECT target FROM e),
        r0 AS MATERIALIZED (SELECT node, node AS reach FROM n0)"""]
    for k in range(radius):
        parts.append(f""",
        r{k + 1} AS MATERIALIZED (
            SELECT DISTINCT node, reach FROM (
                SELECT node, reach FROM r{k}
                UNION ALL
                SELECT e.target AS node, r.reach
                FROM e JOIN r{k} r ON e.src = r.node))""")
    parts.append(f""",
        hashed AS MATERIALIZED (
            SELECT node,
                   CAST(('0x' || substr(md5(CAST(reach AS VARCHAR)),
                                        1, 4)) AS BIGINT) % {_M} AS j,
                   CAST(('0x' || substr(md5(CAST(reach AS VARCHAR)),
                                        5, 8)) AS BIGINT) AS v32
            FROM r{radius}),
        regs AS MATERIALIZED (
            SELECT node, j, max({rho_case}) AS m
            FROM hashed GROUP BY node, j)
        SELECT n0.node AS node,
               CAST(SUM(CAST(1 AS BIGINT)
                        << ({_REG_SCALE} - COALESCE(regs.m, 0)))
                    AS BIGINT) AS ball_regsum,
               CAST(SUM(CASE WHEN regs.m IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS zero_regs
        FROM n0
        CROSS JOIN (SELECT unnest(range({_M})) AS j) js
        LEFT JOIN regs ON regs.node = n0.node AND regs.j = js.j
        GROUP BY n0.node""")
    return "".join(parts)
