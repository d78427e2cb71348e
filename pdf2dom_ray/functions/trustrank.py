"""TrustRank: seed-biased PageRank for web-spam demotion.

Gyöngyi, Garcia-Molina & Pedersen 2004 ("Combating Web Spam with
TrustRank", VLDB): PageRank whose teleport vector is concentrated on a
small human-curated trusted seed set — trust flows outward from the
seeds through outlinks, so pages unreachable from any trusted page
score 0. The seventh member of the graph family (PageRank, HITS,
triangles, BFS depths, connected components, k-core); the reference
engine has no graph op (corpus-level addition per SURVEY §2).

Semantics
---------
Same unnormalized fixed-point int64 convention as ``pagerank.py``
(SCALE = 1e9, d = 85/100), with the teleport AND the dangling-mass
redistribution both restricted to the seed nodes present in the graph
(the paper's static-score formulation; dangling-to-seeds keeps total
mass bounded the way uniform redistribution does for PageRank):

    S        = distinct(seeds) ∩ nodes;  |S| = s
    r0(v)    = SCALE · 1[v ∈ S]
    dang_k   = sum of r_k over nodes with outdeg 0
    r_{k+1}(v) = 1[v∈S]·base
                 + d · ( sum_{u->v} r_k(u) // outdeg(u)
                         + 1[v∈S] · dang_k // s )
    base     = SCALE·(1-d)

Every division is an integer floor, so the distributed per-target
sums are order-independent: results are bit-exact under any shuffle
partitioning and the unrolled DuckDB oracle
(``trustrank_oracle_sql``) hash-matches exactly. If no seed occurs in
the graph every node scores 0 (nothing to teleport to).

Scale shape (100 TB reading)
----------------------------
Identical to ``pagerank.py``: the seed set is small by construction
(a curated trust list — thousands, not billions), so it is a driver
list broadcast once via ``ray.put``; each node shard derives its own
0/1 seed mask at init with one ``np.isin``. Beyond
``driver_edge_limit`` the iteration is the raw-task BSP loop over a
pinned ``graphbsp.ShardedGraph`` (P scatter + P gather tasks per
round, O(m) int64 exchange, one scalar driver sync); below it, one
numpy loop over integer codes. Both paths bit-identical (tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .pagerank import DAMP_DEN, DAMP_NUM, SCALE, _thin

__all__ = ["trustrank", "trustrank_reference", "trustrank_oracle_sql"]


def _seed_array(seeds) -> np.ndarray:
    return np.unique(np.asarray(list(seeds), dtype=object))


def trustrank(edges: rd.Dataset, seeds, *, iterations: int = 5,
              scale: int = SCALE,
              driver_edge_limit: int = 5_000_000,
              n_part: int | None = None) -> rd.Dataset:
    """(src, target) edge rows + trusted seed urls -> (url,
    trust:int64) fixed-point TrustRank scores for every node.

    ``edges`` may carry extra columns and duplicate edges (the graph
    is the distinct (src, target) set, self-loops kept); ``seeds`` is
    a small sequence of node ids (duplicates and ids absent from the
    graph are ignored). ``driver_edge_limit`` picks the numpy driver
    path below, the raw-task BSP loop above (0 forces BSP).
    """
    thin = _thin(edges, ["src", "target"]).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "trust": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        return _trustrank_driver(thin, _seed_array(seeds),
                                 iterations, scale)
    from ..scale import scale_partitions
    return _trustrank_bsp(thin, _seed_array(seeds), iterations, scale,
                          n_part or scale_partitions())


def _trustrank_driver(e: rd.Dataset, seed_arr: np.ndarray,
                      iterations: int, scale: int) -> rd.Dataset:
    """Bounded-size exact path: factorize urls, numpy int64 loop
    (same conventions as ``pagerank._pagerank_driver``)."""
    t = pa.concat_tables(b for b in ray.get(e.to_arrow_refs())
                         if b.num_columns)
    src = np.asarray(t.column("src").to_pandas(), dtype=object)
    tgt = np.asarray(t.column("target").to_pandas(), dtype=object)
    urls, idx = np.unique(np.concatenate([src, tgt]),
                          return_inverse=True)
    n = len(urls)
    codes = np.unique(idx[:len(src)].astype(np.int64) * n
                      + idx[len(src):])
    src_id, tgt_id = codes // n, codes % n
    outdeg = np.bincount(src_id, minlength=n).astype(np.int64)
    mask = np.isin(urls, seed_arr).astype(np.int64)
    s = int(mask.sum())
    base = scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    rank = mask * scale
    dangling = outdeg == 0
    safe_od = np.where(dangling, 1, outdeg)
    for _ in range(iterations):
        share = int(rank[dangling].sum()) // s if s else 0
        contrib = rank // safe_od
        in_sum = np.zeros(n, dtype=np.int64)
        np.add.at(in_sum, tgt_id, contrib[src_id])
        rank = mask * base + (in_sum + mask * share) \
            * DAMP_NUM // DAMP_DEN
    return rd.from_arrow(pa.table({
        "url": pa.array(urls.tolist(), pa.string()),
        "trust": pa.array(rank, pa.int64()),
    }))


@ray.remote(num_returns=3)
def _tr_init_shard(shard, seed_arr, scale: int):
    """(seed mask, trust0, (dangling0, n_seeds)) for one node shard."""
    urls, outdeg = shard
    mask = np.isin(urls, seed_arr).astype(np.int64)
    rank = mask * scale
    return mask, rank, (int(rank[outdeg == 0].sum()), int(mask.sum()))


def _trustrank_bsp(e: rd.Dataset, seed_arr: np.ndarray,
                   iterations: int, scale: int,
                   n_part: int) -> rd.Dataset:
    """Raw-task BSP loop (functions/graphbsp.py, the PageRank single
    layout): per iteration P scatter + P gather tasks, P² small
    contribution objects, one P-scalar driver sync. The seed mask is
    computed once per shard at init from the broadcast seed array and
    pinned. Bit-exact vs the driver path (int64 floor arithmetic,
    order-independent ``np.add.at``), locked by tests."""
    from .graphbsp import ShardedGraph

    base = scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    g = ShardedGraph.build(e, n_part)
    P = g.n_part

    @ray.remote
    def scatter(edge_shard, node_shard, rank):
        src_idx, tgt_idx, offsets = edge_shard
        outdeg = node_shard[1]
        contrib = rank[src_idx] // outdeg[src_idx]
        out = tuple((tgt_idx[offsets[q]:offsets[q + 1]],
                     contrib[offsets[q]:offsets[q + 1]])
                    for q in range(P))
        # num_returns=P only unpacks for P>1; at P==1 return the
        # single piece itself so the gather unpack sees (idx, contrib)
        return out if P > 1 else out[0]

    @ray.remote(num_returns=2)
    def gather(node_shard, mask, share: int, *pieces):
        urls, outdeg = node_shard
        in_sum = np.zeros(len(urls), dtype=np.int64)
        for tgt_idx, contrib in pieces:
            np.add.at(in_sum, tgt_idx, contrib)
        rank = mask * base + (in_sum + mask * share) \
            * DAMP_NUM // DAMP_DEN
        return rank, int(rank[outdeg == 0].sum())

    @ray.remote
    def finalize(node_shard, rank) -> pa.Table:
        return pa.table({
            "url": pa.array(node_shard[0].tolist(), pa.string()),
            "trust": pa.array(rank, pa.int64())})

    seed_ref = ray.put(seed_arr)
    inits = [_tr_init_shard.options(num_returns=3)
             .remote(g.node_shards[q], seed_ref, scale)
             for q in range(P)]
    masks = [i[0] for i in inits]
    ranks = [i[1] for i in inits]
    parts = ray.get([i[2] for i in inits])
    dang = sum(p[0] for p in parts)
    s = sum(p[1] for p in parts)

    for _ in range(iterations):
        share = dang // s if s else 0
        scat = [scatter.options(num_returns=P)
                .remote(g.edges_by_src[p], g.node_shards[p], ranks[p])
                for p in range(P)]
        if P == 1:
            scat = [[sc] for sc in scat]
        outs = [gather.remote(g.node_shards[q], masks[q], share,
                              *[scat[p][q] for p in range(P)])
                for q in range(P)]
        ranks = [o[0] for o in outs]
        dang = sum(ray.get([o[1] for o in outs]))

    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], ranks[q]) for q in range(P)])


def trustrank_reference(edge_list, seeds, *, iterations: int = 5,
                        scale: int = SCALE) -> dict[str, int]:
    """Pure-Python reference of the same integer recurrence (tests)."""
    edges = sorted(set(edge_list))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    seed_set = set(seeds) & set(nodes)
    s = len(seed_set)
    out: dict[str, int] = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    base = scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    rank = {v: (scale if v in seed_set else 0) for v in nodes}
    for _ in range(iterations):
        share = (sum(r for v, r in rank.items()
                     if out.get(v, 0) == 0) // s) if s else 0
        in_sum = {v: 0 for v in nodes}
        for u, v in edges:
            in_sum[v] += rank[u] // out[u]
        rank = {v: (base if v in seed_set else 0)
                + (in_sum[v] + (share if v in seed_set else 0))
                * DAMP_NUM // DAMP_DEN
                for v in nodes}
    return rank


def trustrank_oracle_sql(edges_cte: str, seeds_cte: str, *,
                         iterations: int = 5,
                         scale: int = SCALE) -> str:
    """Unrolled-iteration DuckDB SQL for the same integer recurrence.

    ``edges_cte`` yields (src, target) with possible duplicates;
    ``seeds_cte`` yields url (duplicates / urls absent from the graph
    fine). Every per-round CTE is AS MATERIALIZED (CLAUDE.md
    invariant: a CTE referenced twice per level re-evaluates
    exponentially if inlined).
    """
    base = scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    parts = [f"""
        WITH raw_e AS ({edges_cte}),
        e AS (SELECT DISTINCT src, target FROM raw_e),
        outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS od
                   FROM e GROUP BY src),
        nodes AS (SELECT DISTINCT url FROM
                  (SELECT src AS url FROM e
                   UNION ALL SELECT target FROM e)),
        raw_sd AS ({seeds_cte}),
        sd AS (SELECT DISTINCT n.url FROM nodes n
               JOIN raw_sd s ON n.url = s.url),
        sn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sd),
        nsd AS MATERIALIZED (
            SELECT n.url,
                   CAST(CASE WHEN s.url IS NULL THEN 0 ELSE 1 END
                        AS BIGINT) AS is_seed
            FROM nodes n LEFT JOIN sd s ON n.url = s.url),
        r0 AS MATERIALIZED (SELECT url,
                 CAST(is_seed * {scale} AS BIGINT) AS trust
                 FROM nsd)"""]
    for k in range(iterations):
        parts.append(f""",
        d{k} AS MATERIALIZED (
            SELECT CASE WHEN (SELECT n FROM sn) = 0 THEN 0
                   ELSE COALESCE(SUM(r.trust), 0) // (SELECT n FROM sn)
                   END AS share
            FROM r{k} r LEFT JOIN outdeg o ON r.url = o.src
            WHERE o.src IS NULL),
        s{k} AS MATERIALIZED (
            SELECT e.target AS url, SUM(r.trust // o.od) AS in_sum
            FROM e JOIN r{k} r ON e.src = r.url
                   JOIN outdeg o ON e.src = o.src
            GROUP BY e.target),
        r{k + 1} AS MATERIALIZED (
            SELECT nd.url,
                   CAST(nd.is_seed * {base}
                        + (COALESCE(s.in_sum, 0)
                           + nd.is_seed * (SELECT share FROM d{k}))
                          * {DAMP_NUM} // {DAMP_DEN}
                        AS BIGINT) AS trust
            FROM nsd nd LEFT JOIN s{k} s ON nd.url = s.url)""")
    parts.append(f"\n        SELECT url, trust FROM r{iterations}")
    return "".join(parts)
