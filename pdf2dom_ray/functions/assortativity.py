"""Degree assortativity moments (exact-integer Pearson components).

"Do well-linked pages link to well-linked pages?" — Newman 2002's
assortativity coefficient is the standard one-number answer (hub-hub
cores vs hub-leaf stars; web graphs are famously DISassortative, and
a crawl slice that suddenly isn't is usually a link farm). The
coefficient is a Pearson correlation over edges of the endpoint
degrees:

    r = (m·Σxy − Σx·Σy) / sqrt((m·Σx² − (Σx)²) · (m·Σy² − (Σy)²))

with x = deg(u), y = deg(v) per distinct edge (u, v) (total degree
in + out on the directed edge list — the undirected-style variant;
the synthetic digraphs have constant outdegree, which would make a
pure out-degree x degenerate). The square root is irrational, so the
divided r would flake the value hash (the CLAUDE.md float rule);
the operator therefore emits the SIX exact int64 moments
(m, sx, sy, sxy, sxx, syy) — r is one post-hoc division away, and
every moment hash-matches the DuckDB oracle bit-exactly. Bounds:
Σx² ≤ m·dmax², far inside int64 for any real degree distribution.

Distributed shape: one (src, target) distinct exchange (batch-local
dedup first), ONE narrow (node, count) groupby for total degrees
(each distinct edge emits both endpoints), degrees attached to edges
by broadcast sorted-array searchsorted under ``broadcast_limit``
(``join_ready`` double hash join — src then target — past it), then
each batch folds to one 6-column moment row and the driver folds
O(blocks) rows."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["assortativity_moments", "assortativity_oracle_sql"]

_COLS = ("m", "sx", "sy", "sxy", "sxx", "syy")


def assortativity_moments(edges: rd.Dataset, *,
                          broadcast_limit: int = 5_000_000,
                          n_part: int | None = None) -> rd.Dataset:
    """One row (m, sx, sy, sxy, sxx, syy): exact Pearson moments of
    (deg(u), deg(v)) over the distinct directed edges."""
    from ..scale import scale_partitions
    from .bfs import _thin
    from .dedup import _to_arrow_blocks, join_ready

    P = n_part or scale_partitions()
    thin = _thin(edges)
    dedup = _to_arrow_blocks(
        thin.map_batches(
            lambda t: pa.table({
                "src": t.column("src"), "target": t.column("target"),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64),
                                pa.int64())}),
            batch_format="pyarrow")
        .groupby(["src", "target"])
        .aggregate(Sum("one", alias_name="one"))).materialize()
    m = dedup.count()
    if m == 0:
        return rd.from_arrow(pa.table(
            {c: pa.array([0], pa.int64()) for c in _COLS}))
    # even-repartition kills the sort-aggregate's schema-less empty
    # blocks (join_ready rationale), so every downstream batch is
    # typed off real input columns — int64 and string node ids both
    dedup = dedup.repartition(max(1, min(P, m))).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        both = np.concatenate([
            np.asarray(t.column("src").to_pandas(), dtype=object),
            np.asarray(t.column("target").to_pandas(),
                       dtype=object)])
        uv, cnt = np.unique(both, return_counts=True)
        return pa.table({
            "node": pa.array(uv.tolist(),
                             t.column("src").type),
            "c": pa.array(cnt.astype(np.int64), pa.int64())})

    deg = _to_arrow_blocks(
        dedup.map_batches(endpoints, batch_format="pyarrow")
             .groupby("node").aggregate(Sum("c", alias_name="deg"))) \
        .materialize()
    n_nodes = deg.count()
    deg = deg.repartition(max(1, min(P, n_nodes))).materialize()

    def moments_from(x: np.ndarray, y: np.ndarray) -> pa.Table:
        return pa.table({
            "m": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64())})

    if n_nodes <= broadcast_limit:
        dt = deg.to_pandas().sort_values("node")
        nodes_ref = ray.put(np.asarray(dt["node"], dtype=object))
        deg_ref = ray.put(dt["deg"].to_numpy(np.int64))

        def partial(t: pa.Table) -> pa.Table:
            nodes = ray.get(nodes_ref)
            dv = ray.get(deg_ref)
            s = np.asarray(t.column("src").to_pandas(), dtype=object)
            g = np.asarray(t.column("target").to_pandas(),
                           dtype=object)
            x = dv[np.searchsorted(nodes, s)]
            y = dv[np.searchsorted(nodes, g)]
            return moments_from(x, y)

        parts = dedup.map_batches(partial, batch_format="pyarrow")
    else:                            # honest big-graph path
        e1 = join_ready(dedup, P).join(
            join_ready(deg, P), join_type="inner", num_partitions=P,
            on=("src",), right_on=("node",))
        e1 = e1.map_batches(
            lambda t: pa.table({"target": t.column("target"),
                                "x": t.column("deg")})
            if t.num_columns else pa.table({}),
            batch_format="pyarrow")
        e2 = join_ready(e1, P).join(
            join_ready(deg, P), join_type="inner", num_partitions=P,
            on=("target",), right_on=("node",))

        def jpartial(t: pa.Table) -> pa.Table:
            if not t.num_columns or not t.num_rows:
                return moments_from(np.empty(0, np.int64),
                                    np.empty(0, np.int64))
            return moments_from(t.column("x").to_numpy(),
                                t.column("deg").to_numpy())

        parts = e2.map_batches(jpartial, batch_format="pyarrow")

    parts = parts.materialize()
    vals = {c: int(parts.sum(c) or 0) for c in _COLS}
    return rd.from_arrow(pa.table(
        {c: pa.array([vals[c]], pa.int64()) for c in _COLS}))


def assortativity_oracle_sql(edges_cte: str) -> str:
    """The same six moments over DISTINCT edges and total degrees in
    DuckDB (all CTEs AS MATERIALIZED; deg referenced twice)."""
    return f"""
        WITH raw_e AS ({edges_cte}),
        e AS MATERIALIZED (SELECT DISTINCT src, target FROM raw_e),
        deg AS MATERIALIZED (
            SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
                SELECT src AS node FROM e
                UNION ALL SELECT target FROM e)
            GROUP BY node),
        xy AS MATERIALIZED (
            SELECT du.deg AS x, dv.deg AS y
            FROM e JOIN deg du ON du.node = e.src
                   JOIN deg dv ON dv.node = e.target)
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM xy"""
