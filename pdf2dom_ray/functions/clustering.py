"""Local clustering coefficient (Watts & Strogatz 1998) per node.

The per-node cohesion metric link-spam and community analyses read
next to triangle counts: cc(v) = 2·T(v) / (d(v)·(d(v)−1)) — how close
v's neighborhood is to a clique. Link farms show near-1 coefficients
at high degree (mesh spam); genuine hub pages show near-0. Kept as
exact integer ppm (CLAUDE.md invariant):

    cc_ppm(v) = 2 · T(v) · 10⁶ // (d(v) · (d(v)−1))        d(v) ≥ 2

over the canonical undirected distinct edge set (self-loops dropped);
nodes of degree < 2 have no defined coefficient and are omitted.

Scale shape: a composition with ZERO joins — T(v) from the
degree-ordered distributed triangle counter (functions/triangles.py)
and d(v) from one symmetrize+count groupby are unioned as tagged
(node, degree, n_triangles) partial rows and merged by ONE narrow
groupby-sum (the bowtie.py tag-sum trick); the ppm division is a
vectorized post-aggregate map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from .dedup import _to_arrow_blocks
from .triangles import triangle_counts

__all__ = ["clustering_coefficient"]


def clustering_coefficient(edges: rd.Dataset, *, src_col: str = "a",
                           dst_col: str = "b") -> rd.Dataset:
    """(a, b) edge rows (duplicates/self-loops fine) →
    (node, degree, n_triangles, cc_ppm) for every node of undirected
    degree ≥ 2."""

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src_col].to_numpy()
        b = df[dst_col].to_numpy()
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()

    und = edges.map_batches(canon, batch_format="pandas")

    # exact undirected degree: global distinct of canonical edges,
    # then symmetrize + count — one narrow exchange
    from ray.data.aggregate import Count
    dedup = _to_arrow_blocks(
        und.groupby(["a", "b"]).aggregate(Count(alias_name="__c"))) \
        .select_columns(["a", "b"]).materialize()

    def sym_counts(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        node = pa.concat_arrays([a, b])
        n = len(node)
        return pa.table({
            "node": node,
            "degree": pa.array(np.ones(n, np.int64), pa.int64()),
            "n_triangles": pa.array(np.zeros(n, np.int64), pa.int64())})

    deg_rows = dedup.map_batches(sym_counts, batch_format="pyarrow")

    def tri_rows(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "node": pa.array(df["node"].to_numpy()),
            "degree": pa.array(np.zeros(len(df), np.int64), pa.int64()),
            "n_triangles": pa.array(df["n_triangles"]
                                    .to_numpy(np.int64), pa.int64())})

    tri = triangle_counts(dedup, src_col="a", dst_col="b") \
        .map_batches(tri_rows, batch_format="pandas")

    agg = _to_arrow_blocks(
        deg_rows.union(tri).groupby("node").aggregate(
            Sum("degree", alias_name="degree"),
            Sum("n_triangles", alias_name="n_triangles")))

    def finish(t: pa.Table) -> pa.Table:
        if not t.num_columns:
            # schema-less empty groupby artifact; dropped by concat
            return pa.table({
                "node": pa.array([], pa.int64()),
                "degree": pa.array([], pa.int64()),
                "n_triangles": pa.array([], pa.int64()),
                "cc_ppm": pa.array([], pa.int64())})
        d = np.asarray(t.column("degree"), dtype=np.int64)
        tr = np.asarray(t.column("n_triangles"), dtype=np.int64)
        keep = d >= 2
        d, tr = d[keep], tr[keep]
        # node dtype follows the input (int or string url) — no cast
        node = t.column("node").combine_chunks().filter(pa.array(keep))
        cc = 2 * tr * 1_000_000 // (d * (d - 1))
        return pa.table({
            "node": node,
            "degree": pa.array(d, pa.int64()),
            "n_triangles": pa.array(tr, pa.int64()),
            "cc_ppm": pa.array(cc, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def clustering_oracle_sql(edges_cte: str) -> str:
    """DuckDB twin: canonical distinct undirected edges → oriented
    triangle expansion + symmetrized degree + integer ppm."""
    return f"""
        WITH e0 AS ({edges_cte}),
        und AS (SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b
                FROM e0 WHERE a <> b),
        deg AS (SELECT nd, CAST(count(*) AS BIGINT) AS d FROM
                (SELECT a AS nd FROM und UNION ALL SELECT b FROM und)
                GROUP BY nd),
        tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
                FROM und e1
                JOIN und e2 ON e2.a = e1.b
                JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        tc AS (SELECT nd, CAST(count(*) AS BIGINT) AS t FROM
               (SELECT u AS nd FROM tri UNION ALL SELECT v FROM tri
                UNION ALL SELECT w FROM tri) GROUP BY nd)
        SELECT deg.nd AS node, deg.d AS degree,
               CAST(COALESCE(tc.t, 0) AS BIGINT) AS n_triangles,
               CAST(2 * COALESCE(tc.t, 0) * 1000000
                    // (deg.d * (deg.d - 1)) AS BIGINT) AS cc_ppm
        FROM deg LEFT JOIN tc ON tc.nd = deg.nd
        WHERE deg.d >= 2"""
