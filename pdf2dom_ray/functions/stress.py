"""Pivot-sampled stress centrality (exact-integer Brandes–Pich).

Stress centrality (Shimbel 1953) counts the shortest paths THROUGH a
node — the load measure link-spam auditors and crawl-bottleneck
analyses want when betweenness' fractional weighting is overkill:

    stress(v) = Σ_{s≠v≠t} σ_st(v)

where σ_st(v) = number of shortest s→t paths passing through v.
Exact all-sources is O(n·m); Brandes & Pich 2007 ("Centrality
estimation in large networks") showed a small deterministic pivot
sample preserves ranking, and the per-pivot work is one BFS forward
plus one level-ordered backward accumulation. Unlike betweenness,
stress needs NO fractional dependency split: with

    σ_s(v)  = shortest-path count from pivot s        (forward BFS)
    T_s(v)  = Σ_{w DAG-succ of v} (1 + T_s(w))        (backward)

every shortest s→t path through v factors as σ_s(v) · (DAG paths
v→t), so the pivot's contribution at interior v is σ_s(v)·T_s(v) —
pure int64 products and order-independent sums, which is exactly what
the CLAUDE.md integer-aggregate invariant demands for a hash-matched
DuckDB oracle. Distances are truncated at ``radius`` (the bounded-
round convention of bfs.py/closeness.py: only paths fully inside the
radius ball are counted); path counts must stay below 2^62.

Pivots are md5-derandomized — the K nodes minimizing
md5("{salt}:{node}") — the repo's standard SQL-replayable sampler, so
the unrolled oracle elects the identical set via ORDER BY md5 LIMIT K.

Scale shape: below ``driver_edge_limit`` one numpy loop over the
deduped integer-coded edge list with (n × K) state panels; beyond,
the graphbsp BSP loop over a both-directions ``ShardedGraph`` —
``radius`` forward supersteps scatter σ frontiers along by-src edge
shards, ``radius`` backward supersteps scatter (1 + T) credits along
the mirror by-tgt shards (no reversed rebuild: the tgt layout IS the
reverse adjacency). Per-superstep traffic is O(m/P · K) int64 values;
K is a constant (default 8), so the panels ride at bitset-comparable
width. All arithmetic is int64 with np.add.at scatter-adds — bit-exact
under any partitioning (locked against the driver path by tests).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["stress_centrality", "stress_oracle_sql"]


def _digests(nodes: np.ndarray, salt: str) -> np.ndarray:
    return np.array([hashlib.md5(f"{salt}:{v}".encode()).hexdigest()
                     for v in nodes], dtype=object)


def _forward(dist, sigma, si, ti, radius):
    """Level-synchronous BFS with path counts over the (n, K) panels:
    frontier level L−1 scatters σ along edges; nodes first reached at
    L take the summed σ. np.add.at keeps the sums order-independent."""
    n, K = dist.shape
    for level in range(1, radius + 1):
        contrib = sigma[si] * (dist[si] == level - 1)
        acc = np.zeros((n, K), dtype=np.int64)
        np.add.at(acc, ti, contrib)
        new = (dist == -1) & (acc > 0)
        if not new.any():
            break
        dist[new] = level
        sigma[new] = acc[new]


def _backward(dist, si, ti, radius):
    """Level-descending DAG-path accumulation: T(v) = Σ over DAG
    successors w (dist w = dist v + 1) of (1 + T(w)); nodes at the
    radius frontier keep T = 0 (bounded-ball semantics)."""
    n, K = dist.shape
    T = np.zeros((n, K), dtype=np.int64)
    for level in range(radius - 1, -1, -1):
        val = (1 + T[ti]) * ((dist[ti] == level + 1)
                             & (dist[si] == level))
        acc = np.zeros((n, K), dtype=np.int64)
        np.add.at(acc, si, val)
        here = dist == level
        T[here] = acc[here]
    return T


def _driver_stress(df: pd.DataFrame, pivots: int, radius: int,
                   salt: str) -> pa.Table:
    src = df["src"].to_numpy()
    tgt = df["target"].to_numpy()
    nodes, codes = np.unique(np.concatenate([src, tgt]),
                             return_inverse=True)
    n = len(nodes)
    si, ti = codes[:len(src)], codes[len(src):]
    combo = np.unique(si.astype(np.int64) * n + ti)
    si, ti = combo // n, combo % n
    K = min(pivots, n)
    order = np.lexsort((nodes, _digests(nodes, salt)))
    piv = order[:K]
    dist = np.full((n, K), -1, dtype=np.int64)
    sigma = np.zeros((n, K), dtype=np.int64)
    cols = np.arange(K)
    dist[piv, cols] = 0
    sigma[piv, cols] = 1
    _forward(dist, sigma, si, ti, radius)
    T = _backward(dist, si, ti, radius)
    stress = (sigma * T * (dist > 0)).sum(axis=1)
    return pa.table({"node": pa.array(nodes.tolist()),
                     "stress_w": pa.array(stress, pa.int64())})


def stress_centrality(edges: rd.Dataset, *, pivots: int = 8,
                      radius: int = 4, salt: str = "stress",
                      driver_edge_limit: int = 5_000_000,
                      n_part: int | None = None) -> rd.Dataset:
    """(node, stress_w) over directed (src, target) edges: Σ over the
    K md5-elected pivots of σ_s(v)·T_s(v) — the number of ≤``radius``
    shortest paths from a pivot passing THROUGH v."""
    from ..scale import scale_partitions
    from .bfs import _thin
    from .graphbsp import ShardedGraph

    thin = _thin(edges).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "stress_w": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        return rd.from_arrow(_driver_stress(thin.to_pandas(),
                                            pivots, radius, salt))

    P = n_part or scale_partitions()
    g = ShardedGraph.build(thin, P, both_directions=True)

    @ray.remote
    def elect_local(node_shard, k: int):
        """This shard's k smallest (digest, url) pairs."""
        urls, _ = node_shard
        urls = np.asarray(urls)
        dig = _digests(urls, salt)
        order = np.lexsort((urls, dig))[:k]
        return dig[order], urls[order]

    cand = ray.get([elect_local.remote(g.node_shards[q], pivots)
                    for q in range(P)])
    dig_all = np.concatenate([c[0] for c in cand])
    url_all = np.concatenate([c[1] for c in cand])
    order = np.lexsort((url_all, dig_all))[:pivots]
    piv_urls = url_all[order]          # global pivots, digest order
    K = len(piv_urls)

    @ray.remote
    def init_state(node_shard):
        urls, _ = node_shard
        urls = np.asarray(urls)
        n_loc = len(urls)
        dist = np.full((n_loc, K), -1, dtype=np.int64)
        sigma = np.zeros((n_loc, K), dtype=np.int64)
        if n_loc:
            pos = np.minimum(np.searchsorted(urls, piv_urls), n_loc - 1)
            hit = urls[pos] == piv_urls
            dist[pos[hit], np.arange(K)[hit]] = 0
            sigma[pos[hit], np.arange(K)[hit]] = 1
        return dist, sigma

    @ray.remote
    def scatter_fwd(edge_shard, state, level: int):
        src_idx, tgt_idx, offsets = edge_shard
        dist, sigma = state
        contrib = sigma[src_idx] * (dist[src_idx] == level - 1)
        out = tuple((tgt_idx[offsets[q]:offsets[q + 1]],
                     contrib[offsets[q]:offsets[q + 1]])
                    for q in range(P))
        return out if P > 1 else out[0]

    @ray.remote
    def gather_fwd(state, level: int, *pieces):
        dist, sigma = state
        acc = np.zeros_like(sigma)
        for idx, c in pieces:
            if len(idx):
                np.add.at(acc, idx, c)
        new = (dist == -1) & (acc > 0)
        dist = dist.copy()
        sigma = sigma.copy()
        dist[new] = level
        sigma[new] = acc[new]
        return dist, sigma

    @ray.remote
    def scatter_bwd(tgt_shard, fwd, T, level: int):
        tgt_idx, src_idx, offsets = tgt_shard   # by-tgt mirror layout
        dist = fwd[0]
        val = (1 + T[tgt_idx]) * (dist[tgt_idx] == level + 1)
        out = tuple((src_idx[offsets[q]:offsets[q + 1]],
                     val[offsets[q]:offsets[q + 1]])
                    for q in range(P))
        return out if P > 1 else out[0]

    @ray.remote
    def gather_bwd(fwd, T, level: int, *pieces):
        dist = fwd[0]
        acc = np.zeros_like(T)
        for idx, c in pieces:
            if len(idx):
                np.add.at(acc, idx, c)
        T = T.copy()
        here = dist == level
        T[here] = acc[here]
        return T

    @ray.remote
    def finalize(node_shard, fwd, T) -> pa.Table:
        urls, _ = node_shard
        dist, sigma = fwd
        stress = (sigma * T * (dist > 0)).sum(axis=1)
        return pa.table({
            "node": pa.array(np.asarray(urls).tolist()),
            "stress_w": pa.array(stress, pa.int64())})

    state = [init_state.remote(g.node_shards[q]) for q in range(P)]
    for level in range(1, radius + 1):
        scat = [scatter_fwd.options(num_returns=P)
                .remote(g.edges_by_src[p], state[p], level)
                for p in range(P)]
        if P == 1:
            scat = [[s] for s in scat]
        state = [gather_fwd.remote(state[q], level,
                                   *[scat[p][q] for p in range(P)])
                 for q in range(P)]

    @ray.remote
    def zero_T(state):
        return np.zeros_like(state[1])

    T = [zero_T.remote(state[q]) for q in range(P)]
    for level in range(radius - 1, -1, -1):
        scat = [scatter_bwd.options(num_returns=P)
                .remote(g.edges_by_tgt[p], state[p], T[p], level)
                for p in range(P)]
        if P == 1:
            scat = [[s] for s in scat]
        T = [gather_bwd.remote(state[q], T[q], level,
                               *[scat[p][q] for p in range(P)])
             for q in range(P)]

    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], state[q], T[q])
         for q in range(P)])


def stress_oracle_sql(edges_cte: str, *, pivots: int = 8,
                      radius: int = 4, salt: str = "stress") -> str:
    """Unrolled pivot BFS-with-path-counts plus level-descending DAG
    accumulation. Per-level CTEs AS MATERIALIZED (CLAUDE.md invariant:
    r{k} is referenced twice per level — by f{k+1}'s join AND its
    anti-join — and again by every tb{L})."""
    parts = [f"""WITH raw_e AS ({edges_cte}),
        e AS MATERIALIZED (SELECT DISTINCT src, target FROM raw_e),
        nodes AS MATERIALIZED (
            SELECT src AS node FROM e UNION SELECT target FROM e),
        piv AS MATERIALIZED (
            SELECT node FROM nodes
            ORDER BY md5('{salt}:' || CAST(node AS VARCHAR)), node
            LIMIT {pivots}),
        f0 AS MATERIALIZED (
            SELECT node AS p, node, CAST(1 AS BIGINT) AS sigma
            FROM piv),
        r0 AS MATERIALIZED (
            SELECT p, node, CAST(0 AS BIGINT) AS dist, sigma FROM f0)"""]
    for k in range(radius):
        parts.append(f""",
        f{k + 1} AS MATERIALIZED (
            SELECT f.p, e.target AS node,
                   CAST(SUM(f.sigma) AS BIGINT) AS sigma
            FROM f{k} f JOIN e ON e.src = f.node
            LEFT JOIN r{k} r ON r.p = f.p AND r.node = e.target
            WHERE r.node IS NULL
            GROUP BY f.p, e.target),
        r{k + 1} AS MATERIALIZED (
            SELECT p, node, dist, sigma FROM r{k}
            UNION ALL
            SELECT p, node, CAST({k + 1} AS BIGINT) AS dist, sigma
            FROM f{k + 1})""")
    parts.append(f""",
        tb{radius} AS MATERIALIZED (
            SELECT p, node, CAST(0 AS BIGINT) AS t
            FROM r{radius} WHERE dist = {radius})""")
    for level in range(radius - 1, -1, -1):
        parts.append(f""",
        tb{level} AS MATERIALIZED (
            SELECT rv.p, rv.node,
                   CAST(COALESCE(SUM(CASE WHEN tw.node IS NOT NULL
                                          THEN 1 + tw.t END), 0)
                        AS BIGINT) AS t
            FROM (SELECT p, node FROM r{radius} WHERE dist = {level}) rv
            LEFT JOIN e ON e.src = rv.node
            LEFT JOIN tb{level + 1} tw
                   ON tw.p = rv.p AND tw.node = e.target
            GROUP BY rv.p, rv.node)""")
    t_union = " UNION ALL ".join(
        f"SELECT * FROM tb{level}" for level in range(radius + 1))
    parts.append(f""",
        tt AS MATERIALIZED ({t_union}),
        contrib AS MATERIALIZED (
            SELECT r.node, CAST(SUM(r.sigma * t.t) AS BIGINT) AS s
            FROM r{radius} r
            JOIN tt t ON t.p = r.p AND t.node = r.node
            WHERE r.dist > 0
            GROUP BY r.node)
        SELECT n.node AS node,
               CAST(COALESCE(c.s, 0) AS BIGINT) AS stress_w
        FROM nodes n LEFT JOIN contrib c ON c.node = n.node""")
    return "".join(parts)
