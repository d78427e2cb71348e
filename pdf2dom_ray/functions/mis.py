"""Maximal independent set by parallel symmetry breaking (Luby 1986).

The parallel-scheduling primitive: pick a maximal set of vertices no
two of which are adjacent. In a crawl/corpus setting the edges are
CONFLICTS — near-dup candidate pairs (pick one representative per
conflict neighborhood without waiting for full connected components),
co-scheduled fetches sharing a rate-limited host, overlapping index
shards — and the MIS is a one-shot conflict-free selection.

This is the fixed-priority variant of Luby's algorithm: every node
draws a deterministic priority p(v) = md5('mis:' ‖ v) (the repo's
seeded-decision convention — DuckDB's ``md5()`` builtin replays it
verbatim), and each synchronous round

    IN : undecided v with p(v) < p(u) for EVERY undecided neighbor u
    OUT: undecided neighbors of newly-IN nodes

Fixed priorities make each round a pure function of the previous
state, so the unrolled SQL oracle replays the whole run; md5
collisions (2⁻⁶⁴-scale) would leave both nodes undecided — the same
deterministic outcome on both sides. After ``rounds`` rounds any
still-undecided nodes report ``undecided`` (random priorities decide
a graph in O(log n) rounds w.h.p.; bump ``rounds`` for adversarial
chains). Self-loops are dropped (a node cannot conflict with
itself); the edge set is symmetrized internally.

Scale shape: below ``driver_edge_limit`` one numpy loop (lexsort
min-per-target for the blocking test). Beyond: the graphbsp layout
over the symmetrized edges; per round TWO scatter/gather waves —
(1) undecided-neighbor priority min (shard-local pre-min, so the
exchange is unique-targets wide), (2) IN-flag propagation for
exclusion. All decisions are per-shard vectorized; no driver sync
inside a round.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .pagerank import _thin

__all__ = ["mis_select", "mis_oracle_sql"]

_ST = np.array(["undecided", "in", "out"], dtype=object)
_HI = "￿"          # sorts above every md5 hex digit


def _pri(nodes: np.ndarray) -> np.ndarray:
    return np.array([hashlib.md5(f"mis:{v}".encode()).hexdigest()
                     for v in nodes], dtype=object)


def _driver_mis(t: pa.Table, rounds: int) -> pa.Table:
    src = np.asarray(t.column("src").to_pandas(), dtype=object)
    tgt = np.asarray(t.column("target").to_pandas(), dtype=object)
    keep = src != tgt                   # self-conflicts are dropped —
    src, tgt = src[keep], tgt[keep]     # the node universe too (a
    if not len(src):                    # node appears iff it touches
        return pa.table({               # a real conflict edge)
            "node": pa.array([], pa.int64()),
            "status": pa.array([], pa.string())})
    nodes, codes = np.unique(np.concatenate([src, tgt]),
                             return_inverse=True)
    n = len(nodes)
    a, b = codes[:len(src)], codes[len(src):]
    # symmetrize + dedup via integer codes
    combo = np.unique(np.concatenate([a * n + b, b * n + a]))
    a, b = combo // n, combo % n
    pri = _pri(nodes)
    st = np.zeros(n, dtype=np.int8)     # 0=U 1=I 2=X
    for _ in range(rounds):
        und = st == 0
        if not und.any():
            break
        # min undecided-neighbor priority per node (lexsort trick)
        live = und[a] & und[b]
        mn = np.full(n, _HI, dtype=object)
        if live.any():
            ta, sb = b[live], pri[a[live]]
            order = np.lexsort((sb, ta))
            ta, sb = ta[order], sb[order]
            first = np.ones(len(ta), dtype=bool)
            first[1:] = ta[1:] != ta[:-1]
            mn[ta[first]] = sb[first]
        go_in = und & (pri < mn)
        st[go_in] = 1
        # exclude undecided neighbors of new IN nodes
        hit = go_in[a] & (st[b] == 0)
        st[b[hit]] = 2
    return pa.table({"node": pa.array(nodes.tolist()),
                     "status": pa.array(_ST[st].tolist(), pa.string())})


def mis_select(edges: rd.Dataset, *, rounds: int = 8,
               driver_edge_limit: int = 5_000_000,
               n_part: int | None = None) -> rd.Dataset:
    """(src, target) conflict rows → (node, status) with status ∈
    {in, out, undecided}; ``in`` rows form an independent set, maximal
    once no ``undecided`` remain."""
    from ..scale import scale_partitions
    from .graphbsp import ShardedGraph

    thin = _thin(edges, ["src", "target"]).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "status": pa.array([], pa.string())}))
    if n_thin <= driver_edge_limit:
        tab = pa.concat_tables(b for b in ray.get(thin.to_arrow_refs())
                               if b.num_columns)
        return rd.from_arrow(_driver_mis(tab, rounds))

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
            np.zeros(len(urls), dtype=np.int8)

    @ray.remote
    def scatter_pri(edge_shard, state):
        """Per destination shard: pre-MIN of undecided-source
        priorities toward undecided-agnostic targets (target status
        filters at the gather)."""
        src_idx, tgt_idx, offsets = edge_shard
        pri, st = state
        out = []
        for q in range(P):
            lo, hi = offsets[q], offsets[q + 1]
            sl_t, sl_s = tgt_idx[lo:hi], src_idx[lo:hi]
            live = st[sl_s] == 0
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
        pri, st = state
        mn = np.full(len(pri), _HI, dtype=object)
        for idx, pmin in pieces:
            if len(idx):
                np.minimum.at(mn, idx, pmin)
        go_in = (st == 0) & (pri < mn)
        st = st.copy()
        st[go_in] = 1
        return pri, st, go_in

    @ray.remote
    def scatter_in(edge_shard, decided):
        src_idx, tgt_idx, offsets = edge_shard
        _, _, go_in = decided
        out = []
        for q in range(P):
            lo, hi = offsets[q], offsets[q + 1]
            sl_t = tgt_idx[lo:hi][go_in[src_idx[lo:hi]]]
            out.append(np.unique(sl_t))
        return tuple(out) if P > 1 else out[0]

    @ray.remote
    def exclude(decided, *hit_idx):
        pri, st, _ = decided
        st = st.copy()
        for idx in hit_idx:
            sel = idx[st[idx] == 0]
            st[sel] = 2
        return pri, st

    @ray.remote
    def finalize(node_shard, state) -> pa.Table:
        urls, _ = node_shard
        return pa.table({
            "node": pa.array(np.asarray(urls).tolist()),
            "status": pa.array(_ST[state[1]].tolist(), pa.string())})

    state = [init_state.remote(s) for s in g.node_shards]
    for _ in range(rounds):
        scat = [scatter_pri.options(num_returns=P)
                .remote(g.edges_by_src[p], state[p]) for p in range(P)]
        if P == 1:
            scat = [[s] for s in scat]
        decided = [decide.remote(state[q],
                                 *[scat[p][q] for p in range(P)])
                   for q in range(P)]
        flags = [scatter_in.options(num_returns=P)
                 .remote(g.edges_by_src[p], decided[p])
                 for p in range(P)]
        if P == 1:
            flags = [[f] for f in flags]
        state = [exclude.remote(decided[q],
                                *[flags[p][q] for p in range(P)])
                 for q in range(P)]

    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], state[q]) for q in range(P)])


def mis_oracle_sql(edges_cte: str, *, rounds: int = 8) -> str:
    """Unrolled fixed-priority Luby rounds in DuckDB (md5 priorities
    via the builtin; per-round CTEs AS MATERIALIZED per CLAUDE.md)."""
    parts = [f"""
        WITH raw_e AS ({edges_cte}),
        und AS MATERIALIZED (
            SELECT DISTINCT a, b FROM (
              SELECT src AS a, target AS b FROM raw_e
              UNION ALL SELECT target, src FROM raw_e)
            WHERE a <> b),
        nodes AS (SELECT DISTINCT a AS node FROM und),
        pri AS MATERIALIZED (
            SELECT node, md5('mis:' || CAST(node AS VARCHAR)) AS p
            FROM nodes),
        s0 AS MATERIALIZED (SELECT node, 'U' AS st FROM nodes)"""]
    for k in range(rounds):
        parts.append(f""",
        mn{k} AS MATERIALIZED (
            SELECT e.b AS node, min(p.p) AS mk
            FROM und e JOIN s{k} sa ON sa.node = e.a
                       JOIN s{k} sb ON sb.node = e.b
                       JOIN pri p ON p.node = e.a
            WHERE sa.st = 'U' AND sb.st = 'U'
            GROUP BY e.b),
        in{k} AS MATERIALIZED (
            SELECT s.node FROM s{k} s
            JOIN pri p ON p.node = s.node
            LEFT JOIN mn{k} m ON m.node = s.node
            WHERE s.st = 'U' AND (m.mk IS NULL OR p.p < m.mk)),
        s{k + 1} AS MATERIALIZED (
            SELECT s.node,
                   CASE WHEN i.node IS NOT NULL THEN 'I'
                        WHEN s.st = 'U' AND x.node IS NOT NULL THEN 'X'
                        ELSE s.st END AS st
            FROM s{k} s
            LEFT JOIN in{k} i ON i.node = s.node
            LEFT JOIN (SELECT DISTINCT e.b AS node
                       FROM und e JOIN in{k} i2 ON i2.node = e.a)
                 x ON x.node = s.node)""")
    parts.append(f"""
        SELECT node,
               CASE st WHEN 'I' THEN 'in' WHEN 'X' THEN 'out'
                       ELSE 'undecided' END AS status
        FROM s{rounds}""")
    return "".join(parts)
