"""Neighborhood function / hop plot of the link graph.

N(r) = Σ_v |B_r(v)| — the number of ordered (source, node) pairs
within r hops (including each node itself at r = 0). This is THE
classic whole-graph distance summary (Palmer, Gibbons & Faloutsos
2002's ANF introduced the sketch version; Boldi & Vigna 2013 built
HyperBall to compute exactly this on web graphs): its curve is the
hop plot, and the effective diameter is the smallest r with
N(r) ≥ 0.9 · N(∞). Twelfth member of the graph family — the
whole-graph twin of the per-node balls `harmonic.py`/`hyperball.py`
already grow.

Semantics
---------
Directed reach, rounds truncated at ``radius`` (the bounded-round
convention of ``bfs.py``/``harmonic.py``); output one row per level
r = 0..radius with the EXACT int64 pair count (r = 0 row = node
count). Duplicate edges and self-loops are no-ops (the ball
recurrence is idempotent under OR), and each level's total is a pure
set cardinality — bit-exact under any partitioning, hash-matching
the unrolled DuckDB oracle (``neighborhood_oracle_sql``).

Scale shape (100 TB reading)
----------------------------
The same loop as ``harmonic_centrality`` minus the per-node
weighting: exact bitsets over the node universe, grown by
shard-locally pre-OR'd scatter pieces (exchange volume = unique
targets × width per round), with ONE int64 scalar per shard per
round reaching the driver (the level total — P scalars, not a
vector). At web scale the documented swap is the same as harmonic's:
bitset → HLL registers, OR → register max (``hyperball.py`` wires
that loop), trading exactness for O(m·2^p) round traffic independent
of n. Below ``driver_edge_limit`` the recurrence is one numpy loop
over a packed uint8 bit matrix.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .harmonic import _counts, _or_rows

__all__ = ["effective_diameter",
           "neighborhood_function", "neighborhood_reference",
           "neighborhood_oracle_sql"]


def _result(totals: list[int]) -> pa.Table:
    return pa.table({
        "radius": pa.array(np.arange(len(totals), dtype=np.int64),
                           pa.int64()),
        "n_pairs": pa.array(np.asarray(totals, dtype=np.int64),
                            pa.int64())})


def _driver_hopplot(df: pd.DataFrame, radius: int) -> pa.Table:
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
    totals = [n]
    for _ in range(radius):
        uniq, red = _or_rows(bits, si, ti)
        nxt = bits.copy()
        nxt[uniq] |= red
        total = int(_counts(nxt).sum())
        totals.append(total)
        if total == totals[-2]:
            # saturated: every later level repeats this total
            totals.extend([total] * (radius - len(totals) + 1))
            break
        bits = nxt
    return _result(totals)


def neighborhood_function(edges: rd.Dataset, *, radius: int = 4,
                          driver_edge_limit: int = 5_000_000,
                          n_part: int | None = None) -> rd.Dataset:
    """(radius:int64 0..R, n_pairs:int64) exact reach-pair counts per
    hop level over directed ``edges`` (src, target)."""
    from ..scale import scale_partitions
    from .bfs import _thin
    from .graphbsp import ShardedGraph

    thin = _thin(edges).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "radius": pa.array([], pa.int64()),
            "n_pairs": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        return rd.from_arrow(_driver_hopplot(thin.to_pandas(), radius))

    P = n_part or scale_partitions()
    g = ShardedGraph.build(thin, P)

    @ray.remote
    def shard_size(node_shard) -> int:
        return len(node_shard[0])

    sizes = ray.get([shard_size.remote(g.node_shards[q])
                     for q in range(P)])
    n_nodes = sum(sizes)
    width = (max(sizes) * P + 7) // 8

    @ray.remote
    def init_bits(node_shard, q):
        n_loc = len(node_shard[0])
        bits = np.zeros((n_loc, width), dtype=np.uint8)
        gid = np.arange(n_loc, dtype=np.int64) * P + q
        bits[np.arange(n_loc), gid >> 3] = \
            np.uint8(1) << (gid & 7).astype(np.uint8)
        return bits

    @ray.remote
    def scatter(edge_shard, bits):
        src_idx, tgt_idx, offsets = edge_shard
        out = []
        for q in range(P):
            lo, hi = offsets[q], offsets[q + 1]
            if hi <= lo:
                out.append((np.empty(0, dtype=np.int64),
                            np.empty((0, width), dtype=np.uint8)))
                continue
            out.append(_or_rows(bits, src_idx[lo:hi], tgt_idx[lo:hi]))
        return tuple(out) if P > 1 else out[0]

    @ray.remote(num_returns=2)
    def gather(bits, *pieces):
        nxt = bits.copy()
        for idx, rows in pieces:
            if len(idx):
                nxt[idx] |= rows
        return nxt, int(_counts(nxt).sum())

    bits = [init_bits.remote(g.node_shards[q], q) for q in range(P)]
    totals = [n_nodes]
    for _ in range(radius):
        scat = [scatter.options(num_returns=P)
                .remote(g.edges_by_src[p], bits[p]) for p in range(P)]
        if P == 1:
            scat = [[s] for s in scat]
        outs = [gather.remote(bits[q], *[scat[p][q] for p in range(P)])
                for q in range(P)]
        bits = [o[0] for o in outs]
        totals.append(sum(ray.get([o[1] for o in outs])))
        if totals[-1] == totals[-2]:
            totals.extend([totals[-1]] * (radius - len(totals) + 1))
            break
    return rd.from_arrow(_result(totals))


def neighborhood_reference(edge_list, *, radius: int = 4) -> list[int]:
    """Pure-Python reference (tests): [N(0), N(1), ..., N(radius)]."""
    e = set(edge_list)
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    reach = {v: {v} for v in nodes}
    totals = [len(nodes)]
    for _ in range(radius):
        nxt = {v: set(s) for v, s in reach.items()}
        for u, v in e:
            nxt[v] |= reach[u]
        reach = nxt
        totals.append(sum(len(s) for s in reach.values()))
    return totals


def neighborhood_oracle_sql(edges_cte: str, *, radius: int = 4) -> str:
    """Unrolled ``radius``-hop reach growth in DuckDB, totalled per
    level (harmonic_oracle_sql's CTE structure; AS MATERIALIZED per
    CLAUDE.md — r{k} is referenced twice per level)."""
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
    levels = "\n            UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS radius, "
        f"CAST((SELECT count(*) FROM r{k}) AS BIGINT) AS n_pairs"
        for k in range(radius + 1))
    parts.append(f"""
        {levels}""")
    return "".join(parts)


def effective_diameter(edges: rd.Dataset, *, radius: int = 4,
                       pct: int = 90,
                       driver_edge_limit: int = 5_000_000,
                       n_part: int | None = None) -> rd.Dataset:
    """(eff_diameter, n_pairs_at, n_pairs_max): the classic
    effective-diameter readout of the hop plot (Palmer 2002; the
    number ANF/HyperBall papers report) — the smallest hop count h
    with ``100·N(h) ≥ pct·N(radius)``, exact integers only (no
    interpolation, no floats). Pure composition: the ≤ radius+1-row
    neighborhood function (exact bitsets / BSP) + one driver scan."""
    nf = neighborhood_function(edges, radius=radius,
                               driver_edge_limit=driver_edge_limit,
                               n_part=n_part).to_pandas()
    if not len(nf):
        return rd.from_arrow(pa.table({
            "eff_diameter": pa.array([], pa.int64()),
            "n_pairs_at": pa.array([], pa.int64()),
            "n_pairs_max": pa.array([], pa.int64())}))
    nf = nf.sort_values("radius")
    n_max = int(nf["n_pairs"].iloc[-1])
    hit = nf[100 * nf["n_pairs"] >= pct * n_max].iloc[0]
    return rd.from_arrow(pa.table({
        "eff_diameter": pa.array([int(hit["radius"])], pa.int64()),
        "n_pairs_at": pa.array([int(hit["n_pairs"])], pa.int64()),
        "n_pairs_max": pa.array([n_max], pa.int64())}))
