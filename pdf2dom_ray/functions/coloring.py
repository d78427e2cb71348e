"""Greedy graph coloring by parallel symmetry breaking
(Jones & Plassmann 1993, "A parallel graph coloring heuristic").

The scheduling primitive one step past MIS: assign every node a color
such that no edge is monochromatic, greedily minimizing colors. In a
crawl/corpus setting colors are CONFLICT-FREE SCHEDULE SLOTS — hosts
sharing a rate-limit edge fetch in different waves, near-dup clusters
sharing a candidate edge re-verify in different passes, index shards
sharing a machine compact in different windows; χ ≤ Δ+1 slots always
suffice.

Fixed-priority synchronous JP: p(v) = md5('jp:' ‖ v) (the repo's
seeded-decision convention — DuckDB's ``md5()`` replays it), and each
round every UNCOLORED node with p(v) smaller than every uncolored
neighbor's priority takes the smallest color unused by its colored
neighbors (the mex). Same-round winners are independent by the
priority order, so the mex only needs PRIOR rounds' colors — each
round is a pure function of the previous state and the unrolled SQL
oracle replays the run. After ``rounds`` rounds remaining nodes
report color −1 (JP terminates in O(log n / log log n) expected
rounds on random priorities; bump ``rounds`` for adversarial chains).

Scale shape: below ``driver_edge_limit`` one numpy loop (lexsort
min-per-target + vectorized grouped mex). Beyond: the graphbsp layout
over symmetrized edges; per round TWO scatter/gather waves — (1)
undecided-neighbor priority pre-min (unique-target-wide exchange),
(2) colored-source (target, color) pairs, shard-deduped before the
exchange. All decisions are per-shard vectorized; no driver sync
inside a round.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .pagerank import _thin

__all__ = ["jp_coloring", "coloring_oracle_sql",
           "jp_coloring_reference"]

_HI = "￿"          # sorts above every md5 hex digit


def _pri(nodes: np.ndarray) -> np.ndarray:
    return np.array([hashlib.md5(f"jp:{v}".encode()).hexdigest()
                     for v in nodes], dtype=object)


def _grouped_mex(tgt: np.ndarray, col: np.ndarray,
                 n: int) -> np.ndarray:
    """Per-target mex of the attached color sets: the smallest
    non-negative integer absent from each target's colors. Targets
    with no rows get 0. Vectorized: sort unique (t, c) pairs; within
    a group the mex is the first rank r where c != r, else the group
    size."""
    out = np.zeros(n, dtype=np.int64)
    if not len(tgt):
        return out
    pairs = np.unique(tgt.astype(np.int64) * (col.max() + 2) + col)
    t = pairs // (col.max() + 2)
    c = pairs % (col.max() + 2)
    first = np.ones(len(t), dtype=bool)
    first[1:] = t[1:] != t[:-1]
    grp_start = np.maximum.accumulate(
        np.where(first, np.arange(len(t)), 0))
    r = np.arange(len(t)) - grp_start
    # group sizes → default mex = size
    sizes = np.bincount(t, minlength=n)
    out = sizes.astype(np.int64).copy()
    gap = c != r
    if gap.any():
        # first gap rank per target
        tg, rg = t[gap], r[gap]
        order = np.lexsort((rg, tg))
        tg, rg = tg[order], rg[order]
        f2 = np.ones(len(tg), dtype=bool)
        f2[1:] = tg[1:] != tg[:-1]
        out[tg[f2]] = rg[f2]
    return out


def _driver_jp(t: pa.Table, rounds: int) -> pa.Table:
    src = np.asarray(t.column("src").to_pandas(), dtype=object)
    tgt = np.asarray(t.column("target").to_pandas(), dtype=object)
    keep = src != tgt
    src, tgt = src[keep], tgt[keep]
    if not len(src):
        return pa.table({"node": pa.array([], pa.int64()),
                         "color": pa.array([], pa.int64())})
    nodes, codes = np.unique(np.concatenate([src, tgt]),
                             return_inverse=True)
    n = len(nodes)
    a0, b0 = codes[:len(src)], codes[len(src):]
    combo = np.unique(np.concatenate([a0.astype(np.int64) * n + b0,
                                      b0.astype(np.int64) * n + a0]))
    a, b = combo // n, combo % n
    pri = _pri(nodes)
    color = np.full(n, -1, dtype=np.int64)
    for _ in range(rounds):
        und = color < 0
        if not und.any():
            break
        live = und[a] & und[b]
        mn = np.full(n, _HI, dtype=object)
        if live.any():
            ta, sb = b[live], pri[a[live]]
            order = np.lexsort((sb, ta))
            ta, sb = ta[order], sb[order]
            first = np.ones(len(ta), dtype=bool)
            first[1:] = ta[1:] != ta[:-1]
            mn[ta[first]] = sb[first]
        win = und & (pri < mn)
        if not win.any():
            break
        # colored-neighbor colors flowing into winners
        feed = win[b] & (color[a] >= 0)
        mex = _grouped_mex(b[feed], color[a][feed], n)
        color[win] = mex[win]
    return pa.table({"node": pa.array(nodes.tolist()),
                     "color": pa.array(color, pa.int64())})


def jp_coloring(edges: rd.Dataset, *, rounds: int = 12,
                driver_edge_limit: int = 5_000_000,
                n_part: int | None = None) -> rd.Dataset:
    """(src, target) conflict rows → (node, color); color ≥ 0 is a
    proper greedy coloring, −1 = undecided after ``rounds``."""
    from ..scale import scale_partitions
    from .graphbsp import ShardedGraph

    thin = _thin(edges, ["src", "target"]).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "color": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        tab = pa.concat_tables(b for b in ray.get(thin.to_arrow_refs())
                               if b.num_columns)
        return rd.from_arrow(_driver_jp(tab, rounds))

    def sym(t: pa.Table) -> pa.Table:
        s, g = t.column("src"), t.column("target")
        ne = pa.compute.invert(pa.compute.equal(s, g))
        s, g = s.filter(ne), g.filter(ne)
        return pa.table({
            "src": pa.concat_arrays([s.combine_chunks(),
                                     g.combine_chunks()]),
            "target": pa.concat_arrays([g.combine_chunks(),
                                        s.combine_chunks()])})

    P = n_part or scale_partitions()
    g = ShardedGraph.build(
        thin.map_batches(sym, batch_format="pyarrow"), P)

    @ray.remote
    def init_state(node_shard):
        urls, _ = node_shard
        return _pri(np.asarray(urls)), \
            np.full(len(urls), -1, dtype=np.int64)

    @ray.remote
    def scatter_pri(edge_shard, state):
        src_idx, tgt_idx, offsets = edge_shard
        pri, color = state
        out = []
        for q in range(P):
            lo, hi = offsets[q], offsets[q + 1]
            sl_t, sl_s = tgt_idx[lo:hi], src_idx[lo:hi]
            live = color[sl_s] < 0
            sl_t, sl_s = sl_t[live], sl_s[live]
            if not len(sl_t):
                out.append((np.empty(0, dtype=np.int64),
                            np.empty(0, dtype=object)))
                continue
            ps = pri[sl_s]
            order = np.lexsort((ps, sl_t))
            ta, sb = sl_t[order], ps[order]
            first = np.ones(len(ta), dtype=bool)
            first[1:] = ta[1:] != ta[:-1]
            out.append((ta[first], sb[first]))
        return tuple(out) if P > 1 else out[0]

    @ray.remote
    def decide(state, *pieces):
        pri, color = state
        mn = np.full(len(pri), _HI, dtype=object)
        for idx, pmin in pieces:
            if len(idx):
                np.minimum.at(mn, idx, pmin)
        win = (color < 0) & (pri < mn)
        return pri, color, win

    @ray.remote
    def scatter_colors(edge_shard, decided):
        """(target, src_color) pairs from COLORED sources, deduped
        shard-side before the exchange."""
        src_idx, tgt_idx, offsets = edge_shard
        _, color, _ = decided
        out = []
        for q in range(P):
            lo, hi = offsets[q], offsets[q + 1]
            sl_t, sl_s = tgt_idx[lo:hi], src_idx[lo:hi]
            has = color[sl_s] >= 0
            sl_t, cs = sl_t[has], color[sl_s[has]]
            if not len(sl_t):
                out.append((np.empty(0, dtype=np.int64),
                            np.empty(0, dtype=np.int64)))
                continue
            key = np.unique(sl_t * (cs.max() + 2) + cs)
            out.append((key // (cs.max() + 2), key % (cs.max() + 2)))
        return tuple(out) if P > 1 else out[0]

    @ray.remote
    def assign(decided, *pieces):
        pri, color, win = decided
        if not win.any():
            return pri, color
        ts = [p[0] for p in pieces if len(p[0])]
        cs = [p[1] for p in pieces if len(p[0])]
        tgt = np.concatenate(ts) if ts else np.empty(0, np.int64)
        col = np.concatenate(cs) if cs else np.empty(0, np.int64)
        keep = win[tgt] if len(tgt) else np.empty(0, bool)
        mex = _grouped_mex(tgt[keep], col[keep], len(pri))
        color = color.copy()
        color[win] = mex[win]
        return pri, color

    @ray.remote
    def finalize(node_shard, state) -> pa.Table:
        urls, _ = node_shard
        return pa.table({
            "node": pa.array(np.asarray(urls).tolist()),
            "color": pa.array(state[1], pa.int64())})

    state = [init_state.remote(s) for s in g.node_shards]
    for _ in range(rounds):
        scat = [scatter_pri.options(num_returns=P)
                .remote(g.edges_by_src[p], state[p]) for p in range(P)]
        if P == 1:
            scat = [[s] for s in scat]
        decided = [decide.remote(state[q],
                                 *[scat[p][q] for p in range(P)])
                   for q in range(P)]
        cols = [scatter_colors.options(num_returns=P)
                .remote(g.edges_by_src[p], decided[p])
                for p in range(P)]
        if P == 1:
            cols = [[c] for c in cols]
        state = [assign.remote(decided[q],
                               *[cols[p][q] for p in range(P)])
                 for q in range(P)]

    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], state[q]) for q in range(P)])


def jp_coloring_reference(edge_list, rounds: int = 12) -> dict:
    """Single-process reference (for tests): the same synchronous
    fixed-priority JP semantics."""
    und = {tuple(e) for e in edge_list if e[0] != e[1]}
    adj: dict = {}
    for x, y in und:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    pri = {v: hashlib.md5(f"jp:{v}".encode()).hexdigest()
           for v in adj}
    color = {v: -1 for v in adj}
    for _ in range(rounds):
        undec = [v for v in adj if color[v] < 0]
        if not undec:
            break
        wins = [v for v in undec
                if all(color[u] >= 0 or pri[v] < pri[u]
                       for u in adj[v])]
        if not wins:
            break
        for v in wins:
            used = {color[u] for u in adj[v] if color[u] >= 0}
            c = 0
            while c in used:
                c += 1
            color[v] = c
    return color


def coloring_oracle_sql(edges_cte: str, *, rounds: int = 12) -> str:
    """Unrolled fixed-priority JP rounds in DuckDB (md5 priorities via
    the builtin; per-round CTEs AS MATERIALIZED per CLAUDE.md; mex via
    the rank-gap trick)."""
    parts = [f"""
        WITH raw_e AS ({edges_cte}),
        und AS MATERIALIZED (
            SELECT DISTINCT a, b FROM (
              SELECT src AS a, target AS b FROM raw_e
              UNION ALL SELECT target, src FROM raw_e)
            WHERE a <> b),
        nodes AS (SELECT DISTINCT a AS node FROM und),
        pri AS MATERIALIZED (
            SELECT node, md5('jp:' || CAST(node AS VARCHAR)) AS p
            FROM nodes),
        c0 AS MATERIALIZED (
            SELECT node, CAST(-1 AS BIGINT) AS color FROM nodes)"""]
    for k in range(rounds):
        parts.append(f""",
        mn{k} AS MATERIALIZED (
            SELECT e.b AS node, min(p.p) AS mk
            FROM und e JOIN c{k} ca ON ca.node = e.a
                       JOIN c{k} cb ON cb.node = e.b
                       JOIN pri p ON p.node = e.a
            WHERE ca.color < 0 AND cb.color < 0
            GROUP BY e.b),
        win{k} AS MATERIALIZED (
            SELECT c.node FROM c{k} c
            JOIN pri p ON p.node = c.node
            LEFT JOIN mn{k} m ON m.node = c.node
            WHERE c.color < 0 AND (m.mk IS NULL OR p.p < m.mk)),
        used{k} AS MATERIALIZED (
            SELECT DISTINCT e.b AS node, ca.color
            FROM und e JOIN win{k} w ON w.node = e.b
                       JOIN c{k} ca ON ca.node = e.a
            WHERE ca.color >= 0),
        mex{k} AS MATERIALIZED (
            SELECT node,
                   COALESCE(MIN(CASE WHEN color <> r THEN r END),
                            COUNT(*)) AS mex
            FROM (SELECT node, color,
                         row_number() OVER (PARTITION BY node
                                            ORDER BY color) - 1 AS r
                  FROM used{k}) GROUP BY node),
        c{k + 1} AS MATERIALIZED (
            SELECT c.node,
                   CASE WHEN w.node IS NOT NULL
                        THEN CAST(COALESCE(m.mex, 0) AS BIGINT)
                        ELSE c.color END AS color
            FROM c{k} c
            LEFT JOIN win{k} w ON w.node = c.node
            LEFT JOIN mex{k} m ON m.node = c.node)""")
    parts.append(f"""
        SELECT node, color FROM c{rounds}""")
    return "".join(parts)
