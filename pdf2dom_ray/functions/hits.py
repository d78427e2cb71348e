"""Distributed HITS (hubs & authorities, Kleinberg 1999) over the
outlink web graph.

Complements ``functions/pagerank.py``: where PageRank measures global
endorsement mass, HITS separates *hub* quality (links to good
authorities) from *authority* quality (linked from good hubs) — the
classic pair of crawl-prioritization signals.

Semantics
---------
Over the distinct (src, target) edge set, starting from h0 = SCALE
for every node, ``iterations`` alternating updates:

    a_raw(v) = sum_{u->v} h_k(u)
    a_{k+1}  = a_raw // max(1, ceil(max_v a_raw(v) / SCALE))
    h_raw(u) = sum_{u->v} a_{k+1}(v)
    h_{k+1}  = h_raw // max(1, ceil(max_u h_raw(u) / SCALE))

**Fixed-point int64 arithmetic, divide-by-ceil normalization**: the
usual ``x * SCALE // max`` rescale overflows int64 once raw sums
approach 1e9 nodes x SCALE, so the normalizer divides by
``ceil(max / SCALE)`` instead — every intermediate stays <= N * SCALE
(int64-safe to ~9e9 nodes), all operations are integer floor
divisions, and per-target sums are order-independent. The result is
bit-exact under any shuffle partitioning, and the DuckDB oracle
(the same unrolled recurrence, ``hits_oracle_sql``) hash-matches
exactly (CLAUDE.md integer-aggregate rule).

Scale shape (100 TB reading)
----------------------------
Per iteration: two hash joins (edges x scores, alternating on src
then target) + two narrow groupbys + two scalar max aggregates. The
score state is O(nodes), materialized per half-step (iterative
lineage would otherwise re-execute all prior rounds). Below
``driver_edge_limit`` distinct edges the whole loop runs as
vectorized numpy on the driver (the distributed path's K x 4 Ray
jobs are pure overhead at that size) — same arithmetic, bit-identical
result (locked by a test).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .dedup import _to_arrow_blocks
from .pagerank import _distinct, _n_partitions, _thin

__all__ = ["SCALE", "hits", "hits_reference", "hits_oracle_sql"]

SCALE = 10 ** 9


def _divisor(mx: int, scale: int) -> int:
    return max(1, (int(mx) + scale - 1) // scale)


def hits_reference(edge_list: list[tuple[str, str]], *,
                   iterations: int = 4,
                   scale: int = SCALE) -> dict[str, tuple[int, int]]:
    """Single-process reference: url -> (authority, hub)."""
    e = sorted(set(edge_list))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    h = {n: scale for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(iterations):
        a_raw = {n: 0 for n in nodes}
        for u, v in e:
            a_raw[v] += h[u]
        d = _divisor(max(a_raw.values(), default=0), scale)
        a = {n: s // d for n, s in a_raw.items()}
        h_raw = {n: 0 for n in nodes}
        for u, v in e:
            h_raw[u] += a[v]
        d = _divisor(max(h_raw.values(), default=0), scale)
        h = {n: s // d for n, s in h_raw.items()}
    return {n: (a[n], h[n]) for n in nodes}


def _driver_hits(df, *, iterations: int, scale: int) -> pa.Table:
    """Vectorized numpy loop for small graphs (same exact arithmetic)."""
    src = df["src"].to_numpy()
    tgt = df["target"].to_numpy()
    nodes = np.unique(np.concatenate([src, tgt]))
    n = len(nodes)
    # dedupe edges as integer codes (np.unique has no axis=0 for
    # object/string arrays)
    codes = np.unique(np.searchsorted(nodes, src).astype(np.int64) * n
                      + np.searchsorted(nodes, tgt))
    si, ti = codes // n, codes % n
    h = np.full(n, scale, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iterations):
        a = np.zeros(n, dtype=np.int64)
        np.add.at(a, ti, h[si])
        a //= _divisor(a.max(initial=0), scale)
        h = np.zeros(n, dtype=np.int64)
        np.add.at(h, si, a[ti])
        h //= _divisor(h.max(initial=0), scale)
    return pa.table({"url": pa.array(nodes.tolist(), pa.string()),
                     "authority": pa.array(a, pa.int64()),
                     "hub": pa.array(h, pa.int64())})


def _hits_bsp(e: rd.Dataset, iterations: int,
              scale: int, n_part: int) -> rd.Dataset:
    """Raw-task BSP loop (functions/graphbsp.py) — the >limit path.

    ``e`` needs only batch-local distinct edges (the shard build
    dedups globally and derives the node universe itself). Needs BOTH
    edge layouts (the a-step scatters along src→target, the h-step
    along target→src). Per half-step: P scatter + P gather + P
    normalize tasks and one P-scalar driver max-sync. Bit-exact vs the
    driver and join paths (int64 floors, order-independent
    ``np.add.at``), locked by tests."""
    from .graphbsp import ShardedGraph

    g = ShardedGraph.build(e, n_part, both_directions=True)
    P = g.n_part

    @ray.remote
    def scatter(edge_shard, score):
        key_idx, other_idx, offsets = edge_shard
        contrib = score[key_idx]
        out = tuple((other_idx[offsets[q]:offsets[q + 1]],
                     contrib[offsets[q]:offsets[q + 1]])
                    for q in range(P))
        # num_returns=P only unpacks for P>1; at P==1 return the
        # single piece itself so the gather unpack sees (idx, contrib)
        return out if P > 1 else out[0]

    @ray.remote(num_returns=2)
    def gather(node_shard, *pieces):
        raw = np.zeros(len(node_shard[0]), dtype=np.int64)
        for idx, contrib in pieces:
            np.add.at(raw, idx, contrib)
        return raw, int(raw.max(initial=0))

    @ray.remote
    def normalize(raw, d: int):
        return raw // d

    @ray.remote
    def init_score(node_shard):
        return np.full(len(node_shard[0]), scale, dtype=np.int64)

    @ray.remote
    def finalize(node_shard, a, h) -> pa.Table:
        return pa.table({
            "url": pa.array(node_shard[0].tolist(), pa.string()),
            "authority": pa.array(a, pa.int64()),
            "hub": pa.array(h, pa.int64())})

    def half_step(score, layout):
        scat = [scatter.options(num_returns=P)
                .remote(layout[p], score[p]) for p in range(P)]
        if P == 1:
            scat = [[s] for s in scat]
        outs = [gather.remote(g.node_shards[q],
                              *[scat[p][q] for p in range(P)])
                for q in range(P)]
        d = _divisor(max(ray.get([o[1] for o in outs]), default=0),
                     scale)
        return [normalize.remote(o[0], d) for o in outs]

    h = [init_score.remote(s) for s in g.node_shards]
    a = [ray.put(np.zeros(0, dtype=np.int64))] * P   # replaced below
    for _ in range(iterations):
        a = half_step(h, g.edges_by_src)
        h = half_step(a, g.edges_by_tgt)

    return rd.from_arrow_refs(
        [finalize.remote(g.node_shards[q], a[q], h[q])
         for q in range(P)])


def hits(edges: rd.Dataset, *, iterations: int = 4, scale: int = SCALE,
         driver_edge_limit: int = 5_000_000,
         mode: str = "bsp") -> rd.Dataset:
    """(src, target) edge rows -> (url, authority:int64, hub:int64).

    ``edges`` may carry extra columns and duplicate edges; the graph
    is the distinct (src, target) set. Set ``driver_edge_limit=0`` to
    force the distributed path.
    """
    # batch-local distinct first (no shuffle); the driver path dedupes
    # in numpy itself, so small graphs skip the global distinct
    # exchange entirely (see pagerank.py)
    thin = _thin(edges, ["src", "target"]).materialize()
    n_thin = thin.count()
    if n_thin == 0:
        return rd.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "authority": pa.array([], pa.int64()),
            "hub": pa.array([], pa.int64())}))
    if n_thin <= driver_edge_limit:
        return rd.from_arrow(_driver_hits(
            thin.to_pandas(), iterations=iterations, scale=scale))

    n_part = _n_partitions()
    if mode == "bsp":
        # the BSP build derives node universe + global edge dedup from
        # the batch-distinct edge blocks with raw tasks — no global
        # distinct / union / repartition init exchanges
        return _hits_bsp(thin, iterations, scale, n_part)

    e = _distinct(thin, ["src", "target"]).materialize()
    n_edges = e.count()
    # Ray's hash join rejects 0-row input blocks on either side —
    # even-repartition every narrow join side to merge empties away
    # (see crawl.py::stale_urls / cohort.py)
    e = e.repartition(min(n_part, n_edges)).materialize()
    srcs = e.select_columns(["src"]).rename_columns({"src": "url"})
    tgts = e.select_columns(["target"]).rename_columns({"target": "url"})
    nodes = _distinct(srcs.union(tgts), ["url"]).materialize()
    npn = min(n_part, max(1, nodes.count()))
    nodes = nodes.repartition(npn).materialize()

    def init_score(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t.column("url"),
            "s": pa.array([scale] * t.num_rows, pa.int64())})

    h = _to_arrow_blocks(
        nodes.map_batches(init_score, batch_format="pyarrow")
    ).materialize()
    a = h

    def half_step(score: rd.Dataset, join_on: str,
                  emit: str) -> rd.Dataset:
        """Propagate score across edges (joined on ``join_on``, summed
        per ``emit``), zero-fill over the node set, normalize."""
        prop = e.join(score, join_type="inner", num_partitions=n_part,
                      on=(join_on,), right_on=("url",))
        sums = _to_arrow_blocks(
            prop.select_columns([emit, "s"])
            .rename_columns({emit: "url"})
            .groupby("url").aggregate(Sum("s", alias_name="s"))
        ).materialize()
        sums = sums.repartition(min(n_part, max(1, sums.count())))
        filled = nodes.join(sums, join_type="left_outer",
                            num_partitions=npn, on=("url",))
        raw = _to_arrow_blocks(filled.map_batches(
            lambda t: pa.table({
                "url": t.column("url"),
                "s": pc.coalesce(t.column("s"),
                                 pa.scalar(0, pa.int64()))
                .cast(pa.int64())}),
            batch_format="pyarrow")).materialize()
        d = _divisor(raw.max("s") or 0, scale)
        norm = _to_arrow_blocks(raw.map_batches(
            lambda t, _d=d: pa.table({
                "url": t.column("url"),
                "s": pc.divide(t.column("s"), _d).cast(pa.int64())}),
            batch_format="pyarrow"))
        return norm.repartition(npn).materialize()

    for _ in range(iterations):
        a = half_step(h, "src", "target")
        h = half_step(a, "target", "src")

    out = a.rename_columns({"s": "authority"}).join(
        h.rename_columns({"s": "hub"}), join_type="inner",
        num_partitions=npn, on=("url",))
    return out.select_columns(["url", "authority", "hub"])


def hits_oracle_sql(edges_cte: str, *, iterations: int = 4,
                    scale: int = SCALE) -> str:
    """Unrolled-iteration DuckDB SQL for the same integer recurrence.

    ``edges_cte`` must be a SELECT yielding (src, target) with
    possible duplicates (shared with the pagerank oracle CTE).
    """
    parts = [f"""
        WITH raw_e AS ({edges_cte}),
        e AS (SELECT DISTINCT src, target FROM raw_e),
        nodes AS (SELECT DISTINCT url FROM
                  (SELECT src AS url FROM e
                   UNION ALL SELECT target FROM e)),
        h0 AS MATERIALIZED (SELECT url, CAST({scale} AS BIGINT) AS s FROM nodes)"""]
    for k in range(iterations):
        parts.append(f""",
        ar{k} AS MATERIALIZED (SELECT nd.url, CAST(COALESCE(x.s, 0) AS BIGINT) AS s
                  FROM nodes nd LEFT JOIN (
                    SELECT e.target AS url, SUM(h.s) AS s
                    FROM e JOIN h{k} h ON e.src = h.url
                    GROUP BY e.target) x ON nd.url = x.url),
        a{k + 1} AS MATERIALIZED (SELECT url, s // GREATEST(1,
                        ((SELECT MAX(s) FROM ar{k}) + {scale} - 1)
                        // {scale}) AS s FROM ar{k}),
        hr{k} AS MATERIALIZED (SELECT nd.url, CAST(COALESCE(x.s, 0) AS BIGINT) AS s
                  FROM nodes nd LEFT JOIN (
                    SELECT e.src AS url, SUM(a.s) AS s
                    FROM e JOIN a{k + 1} a ON e.target = a.url
                    GROUP BY e.src) x ON nd.url = x.url),
        h{k + 1} AS MATERIALIZED (SELECT url, s // GREATEST(1,
                        ((SELECT MAX(s) FROM hr{k}) + {scale} - 1)
                        // {scale}) AS s FROM hr{k})""")
    parts.append(f"""
        SELECT a.url, a.s AS authority, h.s AS hub
        FROM a{iterations} a JOIN h{iterations} h ON a.url = h.url""")
    return "".join(parts)
