"""Distributed PageRank over the outlink web graph.

The classic iterative graph op a Common-Crawl-scale pipeline needs
(harmonic/PageRank centrality drives crawl prioritization and quality
weighting — cf. Common Crawl's published host-level rank datasets).
The reference engine has no graph op; this is a corpus-level addition
in the spirit of SURVEY §2's training-data operators.

Semantics
---------
Standard damped PageRank with uniform dangling-mass redistribution,
over the *distinct* canonicalized edge set (self-loops kept — the
share-bar fragment links canonicalize to the page itself):

    r0(v)   = 1                                    (unnormalized unit mass)
    r_{k+1}(v) = (1-d) + d * ( sum_{u->v} r_k(u)/outdeg(u) + dang_k/N )
    dang_k  = sum of r_k over nodes with outdeg 0

**Fixed-point int64 arithmetic** (SCALE = 1e9, d = 85/100): every
division is an integer floor, so the distributed per-target sums are
order-independent — the result is bit-exact regardless of shuffle
partitioning, and the DuckDB oracle (the same unrolled integer
recurrence in SQL, see ``pagerank_oracle_sql``) hash-matches exactly.
Float PageRank would differ in the last ulps between any two runs.
Mass bound: sum of all ranks <= N*SCALE, so int64 is safe to ~9e9
nodes; beyond that drop SCALE or shard the dangling accumulator.

Scale shape (100 TB reading)
----------------------------
Per iteration: one hash join (edges x ranks on src) + one groupby
(contributions on target) + one left join (nodes x in-sums) + one
scalar aggregate (dangling mass). Two all-to-all exchanges per
iteration is the floor for join-based PageRank in a Dataset API —
the alternating key (src, then target) prevents partition reuse
without a persistent partitioned-state abstraction. Edges are
materialized once (narrow string pairs); the rank state is O(nodes)
and is materialized per iteration (iterative lineage would otherwise
re-execute all prior rounds). Dangling mass is a single int64 scalar
on the driver — the only driver-side state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from .dedup import _to_arrow_blocks

__all__ = ["SCALE", "DAMP_NUM", "DAMP_DEN", "pagerank",
           "pagerank_reference", "pagerank_oracle_sql",
           "pagerank_convergence", "pagerank_convergence_oracle_sql"]

SCALE = 10 ** 9
DAMP_NUM, DAMP_DEN = 85, 100      # d = 0.85


def _n_partitions() -> int:
    from ..scale import scale_partitions
    return scale_partitions()


def _thin(ds: rd.Dataset, cols: list[str]) -> rd.Dataset:
    """Per-batch Arrow distinct partial — thins duplicate-heavy rows
    with NO shuffle (batch-local); rows may still repeat across
    batches."""
    return ds.select_columns(cols).map_batches(
        lambda t: t.group_by(cols).aggregate([]),
        batch_format="pyarrow")


def _distinct(ds: rd.Dataset, cols: list[str]) -> rd.Dataset:
    """Distinct rows: per-batch Arrow distinct partial, then a global
    groupby on the (already thinned) narrow rows."""
    agg = _thin(ds, cols).groupby(cols).aggregate(Count(alias_name="__c"))
    return _to_arrow_blocks(agg).select_columns(cols)


def pagerank(edges: rd.Dataset, *, iterations: int = 5,
             scale: int = SCALE,
             driver_edge_limit: int = 5_000_000,
             mode: str = "bsp") -> rd.Dataset:
    """(src, target) edge rows -> (url, rank:int64) fixed-point ranks.

    ``edges`` may carry extra columns (e.g. ``is_content``) and
    duplicate edges; the graph is the distinct (src, target) set.

    Below ``driver_edge_limit`` distinct edges the iteration runs as a
    vectorized numpy loop on the driver (the K x 4 Ray jobs of the
    distributed path are pure fixed overhead at that size) — same
    pattern as ``minhash_cluster``'s driver union-find and
    ``line_dedup``'s broadcast set, and because the recurrence is
    integer-exact all paths return bit-identical ranks (locked by
    ``test_driver_and_distributed_paths_identical``). Set the limit to
    0 to force the distributed path.

    ``mode`` picks the distributed iteration: ``"bsp"`` (default) runs
    raw scatter/gather tasks over pinned hash shards
    (``_pagerank_bsp``); ``"joins"`` keeps the Dataset-join
    formulation as the fallback (2 joins + 2 groupbys per iteration).
    """
    # thin with a batch-local distinct FIRST (no shuffle): the driver
    # path needs no global distinct at all (it dedupes in numpy), so
    # small graphs skip the sort-groupby exchange entirely — that
    # exchange was the dominant fixed cost of the whole query
    thin = _thin(edges, ["src", "target"]).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        empty = pa.table({"url": pa.array([], pa.string()),
                          "rank": pa.array([], pa.int64())})
        return rd.from_arrow(empty)
    if n_thin <= driver_edge_limit:
        return _pagerank_driver(thin, iterations, scale)
    if mode == "bsp":
        # the BSP build derives node universe, global edge dedup and
        # out-degrees from the batch-distinct edge blocks with raw
        # tasks — no global distinct / groupby / join init exchanges
        return _pagerank_bsp(thin, iterations, scale, _n_partitions())
    e = _distinct(thin, ["src", "target"]).materialize()
    n_edges = e.count()
    n_part = _n_partitions()
    # Ray's hash join rejects 0-row input blocks on either side, and
    # the streaming executor picks block boundaries adaptively (run-
    # order-dependent) — even-repartition every narrow join side so
    # no input block is empty (see crawl.py / cohort.py / hits.py)
    e = e.repartition(min(n_part, n_edges)).materialize()

    outdeg = _to_arrow_blocks(
        e.groupby("src").aggregate(Count(alias_name="outdeg"))
    ).materialize()
    outdeg = outdeg.repartition(min(n_part, max(1, outdeg.count())))
    srcs = e.select_columns(["src"]).rename_columns({"src": "url"})
    tgts = e.select_columns(["target"]).rename_columns({"target": "url"})
    nodes = _distinct(srcs.union(tgts), ["url"]).materialize()
    npn = min(n_part, max(1, nodes.count()))
    nodes = nodes.repartition(npn)
    # node state: (url, outdeg, rank); outdeg 0 = dangling
    state = nodes.join(outdeg, join_type="left_outer",
                       num_partitions=npn, on=("url",),
                       right_on=("src",))

    def init_rank(t: pa.Table) -> pa.Table:
        od = pc.coalesce(t.column("outdeg"),
                         pa.scalar(0, pa.int64())).cast(pa.int64())
        return pa.table({
            "url": t.column("url"),
            "outdeg": od,
            "rank": pa.array([scale] * len(t), pa.int64()),
        })

    ranks = _to_arrow_blocks(state.map_batches(
        init_rank, batch_format="pyarrow")).repartition(npn).materialize()
    n_nodes = ranks.count()
    if n_nodes == 0:
        return ranks.select_columns(["url", "rank"])
    base = scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN

    for _ in range(iterations):
        dang = ranks.map_batches(
            lambda t: pa.table({"rank": t.filter(
                pc.equal(t.column("outdeg"), 0)).column("rank")}),
            batch_format="pyarrow").sum("rank") or 0
        dang_share = dang // n_nodes

        joined = e.join(ranks, join_type="inner", num_partitions=n_part,
                        on=("src",), right_on=("url",))
        contrib = joined.map_batches(
            lambda t: pa.table({
                "target": t.column("target"),
                "contrib": pc.divide(t.column("rank"),
                                     t.column("outdeg")),
            }), batch_format="pyarrow")
        in_sums = _to_arrow_blocks(
            contrib.groupby("target").aggregate(
                Sum("contrib", alias_name="in_sum"))).materialize()
        in_sums = in_sums.repartition(
            min(n_part, max(1, in_sums.count())))

        new = ranks.join(in_sums, join_type="left_outer",
                         num_partitions=npn, on=("url",),
                         right_on=("target",))

        def update(t: pa.Table, _base=base, _share=dang_share) -> pa.Table:
            in_s = pc.coalesce(t.column("in_sum"),
                               pa.scalar(0, pa.int64())).cast(pa.int64())
            rank = pc.add(
                _base,
                pc.divide(pc.multiply(pc.add(in_s, _share), DAMP_NUM),
                          DAMP_DEN))
            return pa.table({"url": t.column("url"),
                             "outdeg": t.column("outdeg").cast(pa.int64()),
                             "rank": rank.cast(pa.int64())})

        ranks = _to_arrow_blocks(new.map_batches(
            update, batch_format="pyarrow")).repartition(npn).materialize()

    return ranks.select_columns(["url", "rank"])


@ray.remote
def _pr_init_shard(shard, scale: int):
    """(rank0, dangling0, n_q) for one node shard."""
    urls, outdeg = shard
    rank = np.full(len(urls), scale, dtype=np.int64)
    return rank, int(rank[outdeg == 0].sum()), len(urls)


def _pagerank_bsp(e: rd.Dataset, iterations: int,
                  scale: int, n_part: int) -> rd.Dataset:
    """Raw-task BSP loop (see functions/graphbsp.py): the >limit path.

    ``e`` needs only batch-local distinct edges — the shard build
    dedups globally and derives the node universe + out-degrees
    itself, so the whole query is raw tasks after one narrow
    ``map_batches`` scan. Per iteration: P scatter + P gather tasks,
    P² small contribution objects, one P-scalar driver sync (dangling
    mass). No Dataset operators anywhere — the Dataset-join
    formulation's 2 joins + 2 groupbys of per-iteration fixed cost
    (~1 s each at bench scale) collapse to plain task scheduling.
    Bit-exact vs the driver and join paths (int64 floor arithmetic,
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
    def gather(node_shard, share: int, *pieces):
        urls, outdeg = node_shard
        in_sum = np.zeros(len(urls), dtype=np.int64)
        for tgt_idx, contrib in pieces:
            np.add.at(in_sum, tgt_idx, contrib)
        rank = base + (in_sum + share) * DAMP_NUM // DAMP_DEN
        return rank, int(rank[outdeg == 0].sum())

    @ray.remote
    def finalize(node_shard, rank) -> pa.Table:
        return pa.table({
            "url": pa.array(node_shard[0].tolist(), pa.string()),
            "rank": pa.array(rank, pa.int64())})

    inits = [_pr_init_shard.remote(s, scale) for s in g.node_shards]
    parts = ray.get(inits)
    ranks = [ray.put(p[0]) for p in parts]
    dang = sum(p[1] for p in parts)
    n_nodes = sum(p[2] for p in parts)
    if n_nodes == 0:
        return rd.from_arrow(pa.table({"url": pa.array([], pa.string()),
                                       "rank": pa.array([], pa.int64())}))

    for _ in range(iterations):
        share = dang // n_nodes
        scat = [scatter.options(num_returns=P)
                .remote(g.edges_by_src[p], g.node_shards[p], ranks[p])
                for p in range(P)]
        if P == 1:
            scat = [[s] for s in scat]
        outs = [gather.remote(g.node_shards[q], share,
                              *[scat[p][q] for p in range(P)])
                for q in range(P)]
        ranks = [o[0] for o in outs]
        dang = sum(ray.get([o[1] for o in outs]))

    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], ranks[q]) for q in range(P)])


def _pagerank_driver(e: rd.Dataset, iterations: int,
                     scale: int) -> rd.Dataset:
    """Bounded-size exact path: factorize urls, numpy int64 iteration.

    Accepts batch-thinned rows (duplicates may remain ACROSS batches)
    and dedupes here via integer edge codes — so the caller never pays
    a distributed distinct for a driver-sized graph. ``np.add.at`` on
    an int64 accumulator is an order-independent integer scatter-add —
    identical to the distributed groupby sums.
    """
    import numpy as np
    # schema-less zero-row blocks (groupby artifacts) break concat
    t = pa.concat_tables(b for b in ray.get(e.to_arrow_refs())
                         if b.num_columns)
    src = np.asarray(t.column("src").to_pandas(), dtype=object)
    tgt = np.asarray(t.column("target").to_pandas(), dtype=object)
    urls, idx = np.unique(np.concatenate([src, tgt]), return_inverse=True)
    n = len(urls)
    # global dedupe: one int64 code per edge (driver-path sizes keep
    # n*n well under 2^63)
    codes = np.unique(idx[:len(src)].astype(np.int64) * n
                      + idx[len(src):])
    src_id, tgt_id = codes // n, codes % n
    outdeg = np.bincount(src_id, minlength=n).astype(np.int64)
    rank = np.full(n, scale, dtype=np.int64)
    base = scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    dangling = outdeg == 0
    safe_od = np.where(dangling, 1, outdeg)
    for _ in range(iterations):
        dang_share = int(rank[dangling].sum()) // n
        contrib = rank // safe_od
        in_sum = np.zeros(n, dtype=np.int64)
        np.add.at(in_sum, tgt_id, contrib[src_id])
        rank = base + (in_sum + dang_share) * DAMP_NUM // DAMP_DEN
    return rd.from_arrow(pa.table({
        "url": pa.array(urls.tolist(), pa.string()),
        "rank": pa.array(rank, pa.int64()),
    }))


def pagerank_convergence(edges: rd.Dataset, *, iterations: int = 5,
                         scale: int = SCALE,
                         driver_edge_limit: int = 5_000_000,
                         n_part: int | None = None) -> rd.Dataset:
    """(iteration, l1_delta): per-round Σ|rank_k − rank_{k−1}| of the
    SAME integer PageRank recurrence — the convergence diagnostic that
    tells you whether the iteration budget is sized right before
    spending K passes over a 100 TB graph (a flat tail means wasted
    rounds, a fat tail means under-iterated ranks). Exact int64, so
    the unrolled oracle hash-matches, and bit-identical on the driver
    and BSP paths (the recurrence and the delta are both
    order-independent integer sums).

    Scale shape: the pagerank BSP loop with one extra O(P) scalar
    fold per round (each gather also returns its shard's Σ|Δ|); the
    K-row curve is the only driver-side state beyond the usual
    dangling-mass sync."""
    empty = pa.table({"iteration": pa.array([], pa.int64()),
                      "l1_delta": pa.array([], pa.int64())})
    thin = _thin(edges, ["src", "target"]).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(empty)
    if n_thin <= driver_edge_limit:
        t = pa.concat_tables(b for b in ray.get(thin.to_arrow_refs())
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
        rank = np.full(n, scale, dtype=np.int64)
        base = scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
        dangling = outdeg == 0
        safe_od = np.where(dangling, 1, outdeg)
        deltas = []
        for _ in range(iterations):
            dang_share = int(rank[dangling].sum()) // n
            contrib = rank // safe_od
            in_sum = np.zeros(n, dtype=np.int64)
            np.add.at(in_sum, tgt_id, contrib[src_id])
            new = base + (in_sum + dang_share) * DAMP_NUM // DAMP_DEN
            deltas.append(int(np.abs(new - rank).sum()))
            rank = new
        return rd.from_arrow(pa.table({
            "iteration": pa.array(
                np.arange(1, iterations + 1, dtype=np.int64),
                pa.int64()),
            "l1_delta": pa.array(np.asarray(deltas, np.int64),
                                 pa.int64())}))

    from .graphbsp import ShardedGraph
    base = scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    g = ShardedGraph.build(thin, n_part or _n_partitions())
    P = g.n_part

    @ray.remote
    def scatter(edge_shard, node_shard, rank):
        src_idx, tgt_idx, offsets = edge_shard
        outdeg = node_shard[1]
        contrib = rank[src_idx] // outdeg[src_idx]
        out = tuple((tgt_idx[offsets[q]:offsets[q + 1]],
                     contrib[offsets[q]:offsets[q + 1]])
                    for q in range(P))
        return out if P > 1 else out[0]

    @ray.remote(num_returns=3)
    def gather(node_shard, share: int, old_rank, *pieces):
        urls, outdeg = node_shard
        in_sum = np.zeros(len(urls), dtype=np.int64)
        for tgt_idx, contrib in pieces:
            np.add.at(in_sum, tgt_idx, contrib)
        rank = base + (in_sum + share) * DAMP_NUM // DAMP_DEN
        return (rank, int(rank[outdeg == 0].sum()),
                int(np.abs(rank - old_rank).sum()))

    inits = [_pr_init_shard.remote(s, scale) for s in g.node_shards]
    parts = ray.get(inits)
    ranks = [ray.put(p[0]) for p in parts]
    dang = sum(p[1] for p in parts)
    n_nodes = sum(p[2] for p in parts)
    if n_nodes == 0:
        return rd.from_arrow(empty)
    deltas = []
    for _ in range(iterations):
        share = dang // n_nodes
        scat = [scatter.options(num_returns=P)
                .remote(g.edges_by_src[p], g.node_shards[p], ranks[p])
                for p in range(P)]
        if P == 1:
            scat = [[s] for s in scat]
        outs = [gather.remote(g.node_shards[q], share, ranks[q],
                              *[scat[p][q] for p in range(P)])
                for q in range(P)]
        ranks = [o[0] for o in outs]
        dparts = ray.get([o[1] for o in outs])
        dang = sum(dparts)
        deltas.append(sum(ray.get([o[2] for o in outs])))
    return rd.from_arrow(pa.table({
        "iteration": pa.array(
            np.arange(1, iterations + 1, dtype=np.int64), pa.int64()),
        "l1_delta": pa.array(np.asarray(deltas, np.int64),
                             pa.int64())}))


def pagerank_convergence_oracle_sql(edges_cte: str, *,
                                    iterations: int = 5,
                                    scale: int = SCALE) -> str:
    """Unrolled twin: the pagerank CTE chain + per-round |Δ| sums."""
    inner = pagerank_oracle_sql(edges_cte, iterations=iterations,
                                scale=scale)
    # strip the final SELECT, keep the CTE chain
    head = inner.rsplit("SELECT url, rank FROM", 1)[0].rstrip()
    parts = [head]
    for k in range(iterations):
        parts.append(f""",
        dl{k} AS MATERIALIZED (
            SELECT CAST(SUM(ABS(a.rank - b.rank)) AS BIGINT) AS d
            FROM r{k + 1} a JOIN r{k} b ON a.url = b.url)""")
    arms = [f"SELECT CAST({k + 1} AS BIGINT) AS iteration, "
            f"(SELECT d FROM dl{k}) AS l1_delta"
            for k in range(iterations)]
    parts.append("\n        " + "\n        UNION ALL ".join(arms))
    return "".join(parts)


def pagerank_reference(edge_list, *, iterations: int = 5,
                       scale: int = SCALE) -> dict[str, int]:
    """Pure-Python reference of the same integer recurrence (tests)."""
    edges = sorted(set(edge_list))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out: dict[str, int] = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    rank = {v: scale for v in nodes}
    n = len(nodes)
    base = scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    for _ in range(iterations):
        dang_share = sum(r for v, r in rank.items()
                         if out.get(v, 0) == 0) // n
        in_sum = {v: 0 for v in nodes}
        for u, v in edges:
            in_sum[v] += rank[u] // out[u]
        rank = {v: base + (in_sum[v] + dang_share) * DAMP_NUM // DAMP_DEN
                for v in nodes}
    return rank


def pagerank_oracle_sql(edges_cte: str, *, iterations: int = 5,
                        scale: int = SCALE) -> str:
    """Unrolled-iteration DuckDB SQL for the same integer recurrence.

    ``edges_cte`` must be a SELECT yielding (src, target) with
    possible duplicates — typically the htmlgen link-rule CTE shared
    with the ``html_outlinks`` oracle.
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
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        r0 AS MATERIALIZED (SELECT url, CAST({scale} AS BIGINT) AS rank FROM nodes)"""]
    for k in range(iterations):
        parts.append(f""",
        d{k} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0) // (SELECT n FROM nn)
                        AS share
                 FROM r{k} r LEFT JOIN outdeg o ON r.url = o.src
                 WHERE o.src IS NULL),
        s{k} AS MATERIALIZED (SELECT e.target AS url,
                        SUM(r.rank // o.od) AS in_sum
                 FROM e JOIN r{k} r ON e.src = r.url
                        JOIN outdeg o ON e.src = o.src
                 GROUP BY e.target),
        r{k + 1} AS MATERIALIZED (SELECT nd.url,
                        CAST({base} + (COALESCE(s.in_sum, 0)
                             + (SELECT share FROM d{k}))
                            * {DAMP_NUM} // {DAMP_DEN} AS BIGINT) AS rank
                     FROM nodes nd LEFT JOIN s{k} s ON nd.url = s.url)""")
    parts.append(f"\n        SELECT url, rank FROM r{iterations}")
    return "".join(parts)
