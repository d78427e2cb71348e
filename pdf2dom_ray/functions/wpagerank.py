"""Weighted PageRank — edge-weighted random surfer.

The variant real host-rank pipelines run (the host graph collapse,
``functions/hostgraph.py``, naturally produces an ``n_links`` weight
per host pair; Common-Crawl-style host ranks weight endorsement by
link multiplicity rather than flattening it): the surfer follows edge
(u, v) with probability w(u,v) / W(u), W(u) = Σ_x w(u,x).

Semantics
---------
Over (src, target, w>0) rows — duplicate (src, target) rows have
their weights SUMMED (so the URL-level collapse can feed raw
occurrence rows straight in) — the fixed-point int64 recurrence
(SCALE = 1e9, d = 85/100):

    W(u)       = sum of w over u's distinct out-edges
    share_k(u) = r_k(u) // W(u)
    dang_k     = sum of r_k over nodes with no out-edges
    r_{k+1}(v) = base + (sum_{u->v} share_k(u) * w(u,v)
                         + dang_k // N) * 85 // 100
    base       = SCALE * 15 // 100,   r0 = SCALE

The per-edge contribution is floor-then-multiply
(``(r // W) * w``, never ``r * w // W``): bit-identical under any
partitioning (each term is a pure function of one edge + one node),
and overflow-safe — a node sends at most ``(r//W)·W <= r``, so every
intermediate stays <= N * SCALE (the same ~9e9-node int64 bound as
``pagerank.py``; ``r * w`` would overflow at web scale). With all
weights equal to 1 the recurrence degenerates to exactly
``pagerank.py``'s (locked by a test). The unrolled DuckDB oracle
(``weighted_pagerank_oracle_sql``) hash-matches exactly.

Scale shape (100 TB reading)
----------------------------
Below ``driver_edge_limit`` distinct weighted edges: one vectorized
numpy loop on the driver. Above: the raw-task BSP loop over the
WEIGHTED ``graphbsp.ShardedGraph`` layout (edge shards carry per-edge
int64 weights summed shard-locally across duplicate copies, node
shards the out-strength W(u); P scatter + P gather tasks and one
scalar dangling sync per iteration — ``pagerank._pagerank_bsp``'s
exact shape). The Dataset-join formulation (one edges×ranks hash
join + one target groupby + one left join per iteration) is kept as
the ``mode="joins"`` fallback; all three paths are bit-identical
(tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from .dedup import _to_arrow_blocks, join_ready
from .pagerank import DAMP_DEN, DAMP_NUM, SCALE, _distinct, \
    _n_partitions

__all__ = ["weighted_pagerank", "weighted_pagerank_reference",
           "weighted_pagerank_oracle_sql"]


def weighted_pagerank(edges: rd.Dataset, *, weight_col: str = "w",
                      iterations: int = 5, scale: int = SCALE,
                      driver_edge_limit: int = 5_000_000,
                      num_partitions: int | None = None,
                      mode: str = "bsp") -> rd.Dataset:
    """(src, target, w) rows → (url, rank:int64). Duplicate
    (src, target) rows sum their weights; rows must have w > 0.
    ``driver_edge_limit=0`` forces the distributed path; ``mode``
    picks it: ``"bsp"`` (default) the raw-task loop over the weighted
    ``graphbsp.ShardedGraph`` layout, ``"joins"`` the Dataset-join
    fallback."""
    # batch-local weight pre-sum (no shuffle) thins duplicate-heavy
    # inputs; residual cross-batch duplicates are summed again by the
    # driver numpy pass / the distributed global aggregation
    def presum(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("src"),
                         "target": t.column("target"),
                         "w": t.column(weight_col).cast(pa.int64())}) \
            .group_by(["src", "target"]).aggregate([("w", "sum")]) \
            .rename_columns(["src", "target", "w"])

    thin = edges.select_columns(["src", "target", weight_col]) \
        .map_batches(presum, batch_format="pyarrow").materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "rank": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        return rd.from_arrow(_wpr_driver(thin.to_pandas(),
                                         iterations, scale))
    n_part = num_partitions or _n_partitions()
    if mode == "bsp":
        # the weighted shard build sums duplicate copies' weights and
        # derives out-strengths itself — no global aggregation
        # exchanges before the loop
        return _wpr_bsp(thin, iterations, scale, n_part)
    return _wpr_joins(thin, iterations, scale, n_part)


def _wpr_driver(df: pd.DataFrame, iterations: int,
                scale: int) -> pa.Table:
    """Vectorized numpy loop (same exact arithmetic)."""
    src = df["src"].to_numpy()
    tgt = df["target"].to_numpy()
    w = df["w"].to_numpy().astype(np.int64)
    urls = np.unique(np.concatenate([src, tgt]))
    n = len(urls)
    codes = np.searchsorted(urls, src).astype(np.int64) * n \
        + np.searchsorted(urls, tgt)
    uniq, inv = np.unique(codes, return_inverse=True)
    wsum = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(wsum, inv, w)
    src_id, tgt_id = uniq // n, uniq % n
    W = np.zeros(n, dtype=np.int64)
    np.add.at(W, src_id, wsum)
    dangling = W == 0
    safe_W = np.where(dangling, 1, W)
    base = scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    rank = np.full(n, scale, dtype=np.int64)
    for _ in range(iterations):
        dang_share = int(rank[dangling].sum()) // n
        contrib = (rank // safe_W)[src_id] * wsum
        in_sum = np.zeros(n, dtype=np.int64)
        np.add.at(in_sum, tgt_id, contrib)
        rank = base + (in_sum + dang_share) * DAMP_NUM // DAMP_DEN
    return pa.table({"url": pa.array(urls.tolist(), pa.string()),
                     "rank": pa.array(rank, pa.int64())})


def _wpr_bsp(e: rd.Dataset, iterations: int, scale: int,
             n_part: int) -> rd.Dataset:
    """Raw-task BSP loop over the WEIGHTED ``graphbsp.ShardedGraph``
    layout (edge shards carry per-edge int64 weights, node shards the
    out-strength W(u)): per iteration P scatter + P gather tasks, P²
    small contribution objects, one scalar driver sync (dangling
    mass) — the same shape as ``pagerank._pagerank_bsp``. Bit-exact
    vs the driver and join paths (floor-then-multiply contributions,
    order-independent ``np.add.at``), locked by tests."""
    import ray

    from .graphbsp import ShardedGraph

    base = scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    g = ShardedGraph.build(e, n_part, weighted=True)
    P = g.n_part

    @ray.remote(num_returns=3)
    def init_shard(shard):
        urls, W = shard
        rank = np.full(len(urls), scale, dtype=np.int64)
        return rank, int(rank[W == 0].sum()), len(urls)

    @ray.remote
    def scatter(edge_shard, node_shard, rank):
        src_idx, tgt_idx, offsets, w = edge_shard
        W = node_shard[1]
        # W==0 nodes never appear as a src (they have no out-edges);
        # substitute 1 to keep the vectorized divide quiet
        share = rank // np.where(W == 0, 1, W)
        contrib = share[src_idx] * w
        out = tuple((tgt_idx[offsets[q]:offsets[q + 1]],
                     contrib[offsets[q]:offsets[q + 1]])
                    for q in range(P))
        # num_returns=P only unpacks for P>1; at P==1 return the
        # single piece itself so the gather unpack sees (idx, contrib)
        return out if P > 1 else out[0]

    @ray.remote(num_returns=2)
    def gather(node_shard, share: int, *pieces):
        urls, W = node_shard
        in_sum = np.zeros(len(urls), dtype=np.int64)
        for idx, contrib in pieces:
            np.add.at(in_sum, idx, contrib)
        rank = base + (in_sum + share) * DAMP_NUM // DAMP_DEN
        return rank, int(rank[W == 0].sum())

    @ray.remote
    def finalize(node_shard, rank) -> pa.Table:
        return pa.table({
            "url": pa.array(node_shard[0].tolist(), pa.string()),
            "rank": pa.array(rank, pa.int64())})

    inits = [init_shard.options(num_returns=3)
             .remote(g.node_shards[q]) for q in range(P)]
    ranks = [i[0] for i in inits]
    parts = ray.get([i[1] for i in inits] + [i[2] for i in inits])
    dang = sum(parts[:P])
    n_nodes = sum(parts[P:])
    if n_nodes == 0:
        return rd.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "rank": pa.array([], pa.int64())}))

    for _ in range(iterations):
        share = dang // n_nodes
        scat = [scatter.options(num_returns=P)
                .remote(g.edges_by_src[p], g.node_shards[p], ranks[p])
                for p in range(P)]
        if P == 1:
            scat = [[sc] for sc in scat]
        outs = [gather.remote(g.node_shards[q], share,
                              *[scat[p][q] for p in range(P)])
                for q in range(P)]
        ranks = [o[0] for o in outs]
        dang = sum(ray.get([o[1] for o in outs]))

    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], ranks[q])
         for q in range(P)])


def _wpr_joins(thin: rd.Dataset, iterations: int, scale: int,
               n_part: int) -> rd.Dataset:
    """Dataset-join formulation (pagerank.py's ``mode="joins"`` plan
    with weighted contributions)."""
    from ..stages.hashagg import hash_aggregate

    def wsum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["src", "target"], as_index=False) \
            .agg(w=("w", "sum"))

    e = join_ready(hash_aggregate(thin, ["src", "target"], wsum,
                                  num_partitions=n_part), n_part)
    wout = _to_arrow_blocks(
        e.groupby("src").aggregate(Sum("w", alias_name="W"))
    ).materialize()
    wout = wout.repartition(min(n_part, max(1, wout.count())))
    srcs = e.select_columns(["src"]).rename_columns({"src": "url"})
    tgts = e.select_columns(["target"]).rename_columns(
        {"target": "url"})
    nodes = _distinct(srcs.union(tgts), ["url"]).materialize()
    npn = min(n_part, max(1, nodes.count()))
    nodes = nodes.repartition(npn)
    state = nodes.join(wout, join_type="left_outer",
                       num_partitions=npn, on=("url",),
                       right_on=("src",))

    def init_rank(t: pa.Table) -> pa.Table:
        W = pc.coalesce(t.column("W"),
                        pa.scalar(0, pa.int64())).cast(pa.int64())
        return pa.table({
            "url": t.column("url"),
            "W": W,
            "rank": pa.array([scale] * len(t), pa.int64())})

    ranks = _to_arrow_blocks(state.map_batches(
        init_rank, batch_format="pyarrow")).repartition(npn) \
        .materialize()
    n_nodes = ranks.count()
    if n_nodes == 0:
        return ranks.select_columns(["url", "rank"])
    base = scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN

    for _ in range(iterations):
        dang = ranks.map_batches(
            lambda t: pa.table({"rank": t.filter(
                pc.equal(t.column("W"), 0)).column("rank")}),
            batch_format="pyarrow").sum("rank") or 0
        dang_share = dang // n_nodes

        joined = e.join(ranks, join_type="inner",
                        num_partitions=n_part,
                        on=("src",), right_on=("url",))
        contrib = joined.map_batches(
            lambda t: pa.table({
                "target": t.column("target"),
                "contrib": pc.multiply(
                    pc.divide(t.column("rank"), t.column("W")),
                    t.column("w")),
            }), batch_format="pyarrow")
        in_sums = _to_arrow_blocks(
            contrib.groupby("target").aggregate(
                Sum("contrib", alias_name="in_sum"))).materialize()
        in_sums = in_sums.repartition(
            min(n_part, max(1, in_sums.count())))

        new = ranks.join(in_sums, join_type="left_outer",
                         num_partitions=npn, on=("url",),
                         right_on=("target",))

        def update(t: pa.Table, _base=base,
                   _share=dang_share) -> pa.Table:
            in_s = pc.coalesce(t.column("in_sum"),
                               pa.scalar(0, pa.int64())).cast(pa.int64())
            rank = pc.add(
                _base,
                pc.divide(pc.multiply(pc.add(in_s, _share), DAMP_NUM),
                          DAMP_DEN))
            return pa.table({"url": t.column("url"),
                             "W": t.column("W").cast(pa.int64()),
                             "rank": rank.cast(pa.int64())})

        ranks = _to_arrow_blocks(new.map_batches(
            update, batch_format="pyarrow")).repartition(npn) \
            .materialize()

    return ranks.select_columns(["url", "rank"])


def weighted_pagerank_reference(weighted_edges, *, iterations: int = 5,
                                scale: int = SCALE) -> dict[str, int]:
    """Pure-Python reference of the same integer recurrence (tests).
    ``weighted_edges``: (src, target, w) triples; duplicate pairs sum."""
    wmap: dict = {}
    for u, v, w in weighted_edges:
        wmap[(u, v)] = wmap.get((u, v), 0) + int(w)
    nodes = sorted({u for u, _ in wmap} | {v for _, v in wmap})
    W: dict = {}
    for (u, _), w in wmap.items():
        W[u] = W.get(u, 0) + w
    n = len(nodes)
    base = scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    rank = {v: scale for v in nodes}
    for _ in range(iterations):
        dang_share = sum(r for v, r in rank.items()
                         if W.get(v, 0) == 0) // n
        in_sum = {v: 0 for v in nodes}
        for (u, v), w in wmap.items():
            in_sum[v] += (rank[u] // W[u]) * w
        rank = {v: base + (in_sum[v] + dang_share)
                * DAMP_NUM // DAMP_DEN for v in nodes}
    return rank


def weighted_pagerank_oracle_sql(edges_cte: str, *,
                                 iterations: int = 5,
                                 scale: int = SCALE) -> str:
    """Unrolled-iteration DuckDB SQL for the same integer recurrence.

    ``edges_cte`` yields (src, target, w) rows; duplicate pairs sum.
    Every per-round CTE is AS MATERIALIZED (CLAUDE.md invariant)."""
    base = scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    parts = [f"""
        WITH raw_e AS ({edges_cte}),
        e AS (SELECT src, target, CAST(SUM(w) AS BIGINT) AS w
              FROM raw_e GROUP BY src, target),
        wout AS (SELECT src, CAST(SUM(w) AS BIGINT) AS W
                 FROM e GROUP BY src),
        nodes AS (SELECT DISTINCT url FROM
                  (SELECT src AS url FROM e
                   UNION ALL SELECT target FROM e)),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        r0 AS MATERIALIZED (
            SELECT url, CAST({scale} AS BIGINT) AS rank FROM nodes)"""]
    for k in range(iterations):
        parts.append(f""",
        d{k} AS MATERIALIZED (
            SELECT COALESCE(SUM(r.rank), 0) // (SELECT n FROM nn)
                   AS share
            FROM r{k} r LEFT JOIN wout o ON r.url = o.src
            WHERE o.src IS NULL),
        s{k} AS MATERIALIZED (
            SELECT e.target AS url,
                   SUM((r.rank // o.W) * e.w) AS in_sum
            FROM e JOIN r{k} r ON e.src = r.url
                   JOIN wout o ON e.src = o.src
            GROUP BY e.target),
        r{k + 1} AS MATERIALIZED (
            SELECT nd.url,
                   CAST({base} + (COALESCE(s.in_sum, 0)
                                  + (SELECT share FROM d{k}))
                        * {DAMP_NUM} // {DAMP_DEN} AS BIGINT) AS rank
            FROM nodes nd LEFT JOIN s{k} s ON nd.url = s.url)""")
    parts.append(f"\n        SELECT url, rank FROM r{iterations}")
    return "".join(parts)
