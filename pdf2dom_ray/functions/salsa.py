"""SALSA: the Stochastic Approach for Link-Structure Analysis.

Lempel & Moran 2000/2001 (TOIS 19(2), "SALSA: The Stochastic Approach
for Link-Structure Analysis"): HITS' mutually-reinforcing sums replaced
by two RANDOM WALKS on the bipartite hub/authority view of the link
graph — the authority chain hops target→(uniform in-edge)→hub→(uniform
out-edge)→target, the hub chain the mirror image. Column-stochastic
steps make SALSA far less vulnerable than HITS to the
tightly-knit-community (TKC) effect: a dense clique cannot soak up all
the score mass because each page only redistributes what it holds.
The eleventh member of the graph family (PageRank, HITS, triangles,
BFS, CC, k-core, TrustRank, LPA, harmonic, HyperBall); the reference
engine has no graph op (corpus-level addition per SURVEY §2).

Semantics
---------
Over the distinct (src, target) edge set with in/out-degrees
``id``/``od``, fixed-point int64 state a0(v) = h0(v) = SCALE, and
``iterations`` rounds of the two independent two-hop walks:

    t_k(u)     = sum_{(u,v) in E}  a_k(v) // id(v)      (back-hop)
    a_{k+1}(w) = sum_{(u,w) in E}  t_k(u) // od(u)      (forward-hop)

    s_k(v)     = sum_{(u,v) in E}  h_k(u) // od(u)      (forward-hop)
    h_{k+1}(u) = sum_{(u,v) in E}  s_k(v) // id(v)      (back-hop)

Every division is an integer floor over a positive degree (a node only
contributes along edges it actually has), so per-node sums are
order-independent and results are bit-exact under any shuffle
partitioning; the unrolled DuckDB oracle (``salsa_oracle_sql``)
hash-matches exactly (CLAUDE.md integer-aggregate rule). The walk
redistributes mass without amplifying it — each hop's total is <= the
previous total (floors only lose mass) — so no normalization step is
needed and every intermediate stays <= n * SCALE (int64-safe to ~9e9
nodes, the same bound hits.py documents). Nodes with no in-edges hold
authority 0 from round 1 on; nodes with no out-edges hub 0 (the
chains live on the sides of the bipartite graph, per the paper).

Scale shape (100 TB reading)
----------------------------
Identical machinery to ``hits.py``'s BSP path (pinned
``graphbsp.ShardedGraph`` with BOTH edge layouts + the in-degree
vector the tgt-layout build already produces): each hop is P scatter +
P gather raw tasks exchanging P² small (idx, contrib) pieces, four
hops per iteration. Unlike HITS there is NO per-round driver
synchronization at all (no max-normalizer to agree on) — the whole
K-iteration task graph is submitted asynchronously and only the final
arrow conversion blocks. Below ``driver_edge_limit`` distinct edges
the loop is one vectorized numpy pass on the driver — same
arithmetic, bit-identical (locked by tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .pagerank import _n_partitions, _thin

__all__ = ["SCALE", "salsa", "salsa_reference", "salsa_oracle_sql"]

SCALE = 10 ** 9


def salsa(edges: rd.Dataset, *, iterations: int = 4, scale: int = SCALE,
          driver_edge_limit: int = 5_000_000,
          n_part: int | None = None) -> rd.Dataset:
    """(src, target) edge rows -> (url, authority:int64, hub:int64)
    fixed-point SALSA scores for every node.

    ``edges`` may carry extra columns and duplicate edges (the graph
    is the distinct (src, target) set, self-loops kept).
    ``driver_edge_limit`` picks the numpy driver path below, the
    raw-task BSP loop above (0 forces BSP).
    """
    thin = _thin(edges, ["src", "target"]).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "authority": pa.array([], pa.int64()),
            "hub": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        return rd.from_arrow(_driver_salsa(
            thin.to_pandas(), iterations=iterations, scale=scale))
    return _salsa_bsp(thin, iterations, scale,
                      n_part or _n_partitions())


def _driver_salsa(df, *, iterations: int, scale: int) -> pa.Table:
    """Vectorized numpy loop for small graphs (same exact arithmetic)."""
    src = df["src"].to_numpy()
    tgt = df["target"].to_numpy()
    nodes = np.unique(np.concatenate([src, tgt]))
    n = len(nodes)
    codes = np.unique(np.searchsorted(nodes, src).astype(np.int64) * n
                      + np.searchsorted(nodes, tgt))
    si, ti = codes // n, codes % n
    outdeg = np.bincount(si, minlength=n).astype(np.int64)
    indeg = np.bincount(ti, minlength=n).astype(np.int64)
    # degree-0 entries are never read (a node only divides by a degree
    # along its own edges) — substitute 1 to keep numpy quiet
    safe_od = np.where(outdeg == 0, 1, outdeg)
    safe_id = np.where(indeg == 0, 1, indeg)
    a = np.full(n, scale, dtype=np.int64)
    h = np.full(n, scale, dtype=np.int64)
    for _ in range(iterations):
        c = a // safe_id
        t = np.zeros(n, dtype=np.int64)
        np.add.at(t, si, c[ti])
        c = t // safe_od
        a = np.zeros(n, dtype=np.int64)
        np.add.at(a, ti, c[si])

        c = h // safe_od
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, ti, c[si])
        c = s // safe_id
        h = np.zeros(n, dtype=np.int64)
        np.add.at(h, si, c[ti])
    return pa.table({"url": pa.array(nodes.tolist(), pa.string()),
                     "authority": pa.array(a, pa.int64()),
                     "hub": pa.array(h, pa.int64())})


def _salsa_bsp(e: rd.Dataset, iterations: int, scale: int,
               n_part: int) -> rd.Dataset:
    """Raw-task BSP loop (functions/graphbsp.py, both edge layouts +
    the in-degree vector). Each two-hop walk step = 2×(P scatter + P
    gather); no driver sync inside the loop — the contribution floor
    happens at the scoring node before the scatter, so there is no
    global scalar to agree on. Bit-exact vs the driver path (int64
    floors, order-independent ``np.add.at``), locked by tests."""
    from .graphbsp import ShardedGraph

    g = ShardedGraph.build(e, n_part, both_directions=True)
    P = g.n_part

    @ray.remote(num_returns=2)
    def safe_degs(node_shard, indeg):
        outdeg = node_shard[1]
        return (np.where(outdeg == 0, 1, outdeg),
                np.where(indeg == 0, 1, indeg))

    @ray.remote
    def init_score(node_shard):
        return np.full(len(node_shard[0]), scale, dtype=np.int64)

    @ray.remote
    def scatter(edge_shard, score, safe_deg):
        key_idx, other_idx, offsets = edge_shard
        contrib = (score // safe_deg)[key_idx]
        out = tuple((other_idx[offsets[q]:offsets[q + 1]],
                     contrib[offsets[q]:offsets[q + 1]])
                    for q in range(P))
        # num_returns=P only unpacks for P>1; at P==1 return the
        # single piece itself so the gather unpack sees (idx, contrib)
        return out if P > 1 else out[0]

    @ray.remote
    def gather(node_shard, *pieces):
        acc = np.zeros(len(node_shard[0]), dtype=np.int64)
        for idx, contrib in pieces:
            np.add.at(acc, idx, contrib)
        return acc

    @ray.remote
    def finalize(node_shard, a, h) -> pa.Table:
        return pa.table({
            "url": pa.array(node_shard[0].tolist(), pa.string()),
            "authority": pa.array(a, pa.int64()),
            "hub": pa.array(h, pa.int64())})

    def hop(score, layout, degs):
        scat = [scatter.options(num_returns=P)
                .remote(layout[p], score[p], degs[p]) for p in range(P)]
        if P == 1:
            scat = [[s] for s in scat]
        return [gather.remote(g.node_shards[q],
                              *[scat[p][q] for p in range(P)])
                for q in range(P)]

    sd = [safe_degs.options(num_returns=2)
          .remote(g.node_shards[q], g.indegs[q]) for q in range(P)]
    safe_out = [s[0] for s in sd]
    safe_in = [s[1] for s in sd]
    a = [init_score.remote(s) for s in g.node_shards]
    h = [init_score.remote(s) for s in g.node_shards]
    for _ in range(iterations):
        a = hop(hop(a, g.edges_by_tgt, safe_in), g.edges_by_src,
                safe_out)
        h = hop(hop(h, g.edges_by_src, safe_out), g.edges_by_tgt,
                safe_in)
    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], a[q], h[q])
         for q in range(P)])


def salsa_reference(edge_list, *, iterations: int = 4,
                    scale: int = SCALE) -> dict[str, tuple[int, int]]:
    """Pure-Python reference of the same integer recurrence (tests):
    url -> (authority, hub)."""
    edges = sorted(set(edge_list))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    od: dict[str, int] = {}
    ind: dict[str, int] = {}
    for u, v in edges:
        od[u] = od.get(u, 0) + 1
        ind[v] = ind.get(v, 0) + 1
    a = {n: scale for n in nodes}
    h = {n: scale for n in nodes}
    for _ in range(iterations):
        t = {n: 0 for n in nodes}
        for u, v in edges:
            t[u] += a[v] // ind[v]
        a = {n: 0 for n in nodes}
        for u, v in edges:
            a[v] += t[u] // od[u]
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += h[u] // od[u]
        h = {n: 0 for n in nodes}
        for u, v in edges:
            h[u] += s[v] // ind[v]
    return {n: (a[n], h[n]) for n in nodes}


def salsa_oracle_sql(edges_cte: str, *, iterations: int = 4,
                     scale: int = SCALE) -> str:
    """Unrolled-iteration DuckDB SQL for the same integer recurrence.

    ``edges_cte`` yields (src, target) with possible duplicates. Every
    per-round CTE is AS MATERIALIZED (CLAUDE.md invariant: a CTE
    referenced twice per level re-evaluates exponentially if inlined).
    """
    parts = [f"""
        WITH raw_e AS ({edges_cte}),
        e AS (SELECT DISTINCT src, target FROM raw_e),
        outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS od
                   FROM e GROUP BY src),
        indeg AS (SELECT target, CAST(count(*) AS BIGINT) AS id
                  FROM e GROUP BY target),
        nodes AS (SELECT DISTINCT url FROM
                  (SELECT src AS url FROM e
                   UNION ALL SELECT target FROM e)),
        a0 AS MATERIALIZED (
            SELECT url, CAST({scale} AS BIGINT) AS s FROM nodes),
        h0 AS MATERIALIZED (
            SELECT url, CAST({scale} AS BIGINT) AS s FROM nodes)"""]
    for k in range(iterations):
        parts.append(f""",
        at{k} AS MATERIALIZED (
            SELECT e.src AS url, SUM(a.s // i.id) AS s
            FROM e JOIN a{k} a ON e.target = a.url
                   JOIN indeg i ON e.target = i.target
            GROUP BY e.src),
        a{k + 1} AS MATERIALIZED (
            SELECT nd.url, CAST(COALESCE(x.s, 0) AS BIGINT) AS s
            FROM nodes nd LEFT JOIN (
                SELECT e.target AS url, SUM(t.s // o.od) AS s
                FROM e JOIN at{k} t ON e.src = t.url
                       JOIN outdeg o ON e.src = o.src
                GROUP BY e.target) x ON nd.url = x.url),
        ht{k} AS MATERIALIZED (
            SELECT e.target AS url, SUM(h.s // o.od) AS s
            FROM e JOIN h{k} h ON e.src = h.url
                   JOIN outdeg o ON e.src = o.src
            GROUP BY e.target),
        h{k + 1} AS MATERIALIZED (
            SELECT nd.url, CAST(COALESCE(x.s, 0) AS BIGINT) AS s
            FROM nodes nd LEFT JOIN (
                SELECT e.src AS url, SUM(t.s // i.id) AS s
                FROM e JOIN ht{k} t ON e.target = t.url
                       JOIN indeg i ON e.target = i.target
                GROUP BY e.src) x ON nd.url = x.url)""")
    parts.append(f"""
        SELECT a.url, a.s AS authority, h.s AS hub
        FROM a{iterations} a JOIN h{iterations} h ON a.url = h.url""")
    return "".join(parts)
