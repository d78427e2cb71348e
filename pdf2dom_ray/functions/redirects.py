"""Redirect-chain resolution by pointer doubling (crawl-index op).

A crawl archive stores redirects as (url → location) rows; dedup,
canonical-URL election and link-graph construction all need each
url's FINAL destination (CDX-style "resolve the 301/302 chain").
Following chains one hop per round is O(longest chain) sequential
rounds; **pointer jumping** (`f ← f∘f`, the classic PRAM list-ranking
contraction) resolves chains of length ≤ 2^R in R rounds — at web
scale a chain cap of 16 (R=4) is the standard politeness bound, so
four synchronizations suffice regardless of corpus size.

Semantics
---------
``next(x)`` = MIN(target) over x's redirect rows (deterministic under
dirty multi-target data), or x itself if x never redirects. With
``f₀ = next`` and ``h₀(x) = 1`` iff x redirects:

    f_{k+1}(x) = f_k(f_k(x))        h_{k+1}(x) = h_k(x) + h_k(f_k(x))

After R rounds ``final = f_R`` is the chain end for every chain of
length ≤ 2^R and ``hops`` its exact length (terminals: final = self,
hops = 0). Redirect LOOPS never resolve: their ``final`` stays inside
the loop and ``hops`` saturates toward 2^R — a deterministic,
synchronous closed form the unrolled DuckDB oracle
(``redirect_oracle_sql``) replays exactly (loop detection =
``hops ≥ 2^R`` downstream).

Scale shape (100 TB reading)
----------------------------
Below ``driver_edge_limit`` distinct rows: one numpy loop (factorize,
``f = f[f]``). Beyond: node shards hash-partitioned via the pinned
``ShardedGraph`` layout (functions/graphbsp.py); each doubling round
is P ask + P answer + P apply raw tasks exchanging P² small
(positions, urls) pieces — total traffic O(n) urls per round, R·3P
tasks overall, no Dataset operators and no per-round driver
reduction. Peak task memory O(n/P + m/P).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .pagerank import _thin

__all__ = ["resolve_redirects", "redirect_reference",
           "redirect_oracle_sql"]


def resolve_redirects(edges: rd.Dataset, *, rounds: int = 4,
                      driver_edge_limit: int = 5_000_000,
                      n_part: int | None = None) -> rd.Dataset:
    """(src, target) redirect rows → (node, final, hops:int64) for
    every node in the universe; chains ≤ 2**rounds fully resolved.
    Node dtype follows the input (url strings or int ids)."""
    from ..scale import scale_partitions
    from .graphbsp import ShardedGraph, _shard_of

    thin = _thin(edges, ["src", "target"]).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "final": pa.array([], pa.string()),
            "hops": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        return _resolve_driver(thin, rounds)

    P = n_part or scale_partitions()
    g = ShardedGraph.build(thin, P)

    @ray.remote(num_returns=2)
    def init_state(node_shard, edge_shard, url_refs):
        """f₀ (min target per src, self otherwise) + h₀ for one
        shard. Target url arrays are fetched one at a time (peak =
        this shard's edges + one url array), mirroring
        graphbsp._build_edge_shard."""
        urls, _ = node_shard
        src_idx, tgt_idx, offsets = edge_shard
        f = urls.copy()
        h = np.zeros(len(urls), dtype=np.int64)
        sparts, tparts = [], []
        for q in range(P):
            lo, hi = offsets[q], offsets[q + 1]
            if hi <= lo:
                continue
            urls_q = ray.get(url_refs[q])
            sparts.append(src_idx[lo:hi])
            tparts.append(np.asarray(urls_q)[tgt_idx[lo:hi]])
        if sparts:
            s = np.concatenate(sparts)
            t = np.concatenate(tparts)
            order = np.lexsort((t, s))      # per-src MIN target first
            s, t = s[order], t[order]
            first = np.ones(len(s), dtype=bool)
            first[1:] = s[1:] != s[:-1]
            f[s[first]] = t[first]
            h[s[first]] = 1
        return f, h

    @ray.remote
    def ask(f):
        """Group this shard's f values by their owner shard."""
        osh = _shard_of(f, P)
        order = np.argsort(osh, kind="stable")
        pos, fo = order, f[order]
        bounds = np.searchsorted(osh[order], np.arange(P + 1))
        out = tuple((pos[bounds[q]:bounds[q + 1]],
                     fo[bounds[q]:bounds[q + 1]]) for q in range(P))
        return out if P > 1 else out[0]

    @ray.remote
    def answer(node_shard, f, h, *pieces):
        """Resolve (f(x), h(x)) lookups addressed to this shard."""
        urls, _ = node_shard
        out = []
        for pos, queries in pieces:
            if len(urls):
                at = np.minimum(np.searchsorted(urls, queries),
                                len(urls) - 1)
                hit = urls[at] == queries
                fv = np.where(hit, f[at], queries)
                hv = np.where(hit, h[at], 0)
            else:               # query urls all exist by construction
                fv, hv = queries, np.zeros(len(queries), np.int64)
            out.append((pos, fv, hv.astype(np.int64)))
        return tuple(out) if P > 1 else out[0]

    @ray.remote(num_returns=2)
    def apply(f, h, *pieces):
        fn, hn = f.copy(), h.copy()
        for pos, fv, hv in pieces:
            fn[pos] = fv
            hn[pos] = h[pos] + hv
        return fn, hn

    @ray.remote
    def finalize(node_shard, f, h) -> pa.Table:
        urls, _ = node_shard
        return pa.table({"node": pa.array(urls.tolist()),
                         "final": pa.array(f.tolist()),
                         "hops": pa.array(h, pa.int64())})

    @ray.remote
    def _urls(node_shard):
        return node_shard[0]

    # per-shard url arrays as refs WITHOUT driver materialization
    url_refs = [_urls.remote(s) for s in g.node_shards]
    states = [init_state.remote(g.node_shards[q], g.edges_by_src[q],
                                url_refs) for q in range(P)]
    fs = [s[0] for s in states]
    hs = [s[1] for s in states]
    for _ in range(rounds):
        asks = [ask.options(num_returns=P).remote(fs[q])
                for q in range(P)]
        if P == 1:
            asks = [[a] for a in asks]
        answers = [answer.options(num_returns=P)
                   .remote(g.node_shards[p], fs[p], hs[p],
                           *[asks[q][p] for q in range(P)])
                   for p in range(P)]
        if P == 1:
            answers = [[a] for a in answers]
        nxt = [apply.remote(fs[q], hs[q],
                            *[answers[p][q] for p in range(P)])
               for q in range(P)]
        fs = [s[0] for s in nxt]
        hs = [s[1] for s in nxt]

    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], fs[q], hs[q])
         for q in range(P)])


def _resolve_driver(e: rd.Dataset, rounds: int) -> rd.Dataset:
    """Bounded-size exact path: factorize, ``f = f[f]`` numpy loop."""
    t = pa.concat_tables(b for b in ray.get(e.to_arrow_refs())
                         if b.num_columns)
    src = np.asarray(t.column("src").to_pandas(), dtype=object)
    tgt = np.asarray(t.column("target").to_pandas(), dtype=object)
    nodes, idx = np.unique(np.concatenate([src, tgt]),
                           return_inverse=True)
    n = len(nodes)
    src_id, tgt_id = idx[:len(src)], idx[len(src):]
    f = np.arange(n, dtype=np.int64)
    h = np.zeros(n, dtype=np.int64)
    order = np.lexsort((tgt_id, src_id))    # per-src MIN target first
    s, tg = src_id[order], tgt_id[order]
    first = np.ones(len(s), dtype=bool)
    first[1:] = s[1:] != s[:-1]
    f[s[first]] = tg[first]
    h[s[first]] = 1
    for _ in range(rounds):
        h = h + h[f]
        f = f[f]
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes.tolist()),
        "final": pa.array(nodes[f].tolist()),
        "hops": pa.array(h, pa.int64())}))


def redirect_reference(edge_list, *, rounds: int = 4) -> dict:
    """Pure-Python reference of the same doubling recurrence (tests)."""
    m: dict = {}
    for u, v in sorted(set(edge_list)):
        if u not in m:
            m[u] = v
    nodes = sorted({u for u, _ in edge_list}
                   | {v for _, v in edge_list})
    f = {x: m.get(x, x) for x in nodes}
    h = {x: 1 if x in m else 0 for x in nodes}
    for _ in range(rounds):
        f2 = {x: f[f[x]] for x in nodes}
        h2 = {x: h[x] + h[f[x]] for x in nodes}
        f, h = f2, h2
    return {x: (f[x], h[x]) for x in nodes}


def redirect_oracle_sql(edges_cte: str, *, rounds: int = 4) -> str:
    """Unrolled pointer-doubling in DuckDB. f{k} is referenced twice
    per level — AS MATERIALIZED per the CLAUDE.md invariant."""
    parts = [f"""
        WITH raw_e AS ({edges_cte}),
        m AS (SELECT src, MIN(target) AS target FROM raw_e GROUP BY src),
        nodes AS (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM raw_e
                   UNION ALL SELECT target FROM raw_e)),
        f0 AS MATERIALIZED (SELECT n.node,
                        COALESCE(m.target, n.node) AS fx,
                        CAST(CASE WHEN m.src IS NULL THEN 0 ELSE 1 END
                             AS BIGINT) AS hops
                 FROM nodes n LEFT JOIN m ON n.node = m.src)"""]
    for k in range(rounds):
        parts.append(f""",
        f{k + 1} AS MATERIALIZED (SELECT a.node, b.fx AS fx,
                        a.hops + b.hops AS hops
                 FROM f{k} a JOIN f{k} b ON a.fx = b.node)""")
    parts.append(f"""
        SELECT node, fx AS final, hops FROM f{rounds}""")
    return "".join(parts)
