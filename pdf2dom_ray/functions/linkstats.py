"""Per-node degree and reciprocity statistics over the link graph.

The descriptive web-graph health metrics every crawl report leads
with (cf. the classic web-structure studies — Broder et al. 2000's
bow-tie analysis starts from exactly these distributions): in-degree,
out-degree, and link reciprocity (how many of a node's neighbors link
BACK — navigational/partner links reciprocate, endorsement links
rarely do, so a high reciprocal fraction flags link-exchange spam).

Semantics
---------
Over the distinct (src, target) edge set:

    out_deg(u)      = #distinct targets of u
    in_deg(v)       = #distinct sources of v
    n_reciprocal(u) = #v != u with BOTH (u,v) and (v,u) edges

Self-loops count in in/out degree but never in reciprocity. Every
output is an integer over the distinct edge set, so the DuckDB
oracle (``degree_stats_oracle_sql``) hash-matches exactly.

Scale shape (100 TB reading)
----------------------------
ONE hash exchange keyed on the UNORDERED endpoint pair
(min, max) — that co-locates every copy of (u,v) with every copy of
(v,u), so global dedup AND the reciprocity test are both
partition-local (an ``np.isin`` of each edge's reversed integer code
against the partition's code set — no self-join). Per-partition
(url, in, out, recip) partials then combine through one narrow
``hash_aggregate`` sum per url. No payload ever shuffles; skewed
nodes spread across partitions (the pair hash mixes both endpoints)
and are re-summed by the final combiner.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["degree_stats", "degree_stats_reference",
           "degree_stats_oracle_sql", "avg_neighbor_degree", "annd_oracle_sql"]


def _n_partitions() -> int:
    from ..scale import scale_partitions
    return scale_partitions()


def degree_stats(edges: rd.Dataset, *, src_col: str = "src",
                 target_col: str = "target",
                 num_partitions: int | None = None) -> rd.Dataset:
    """(src, target) edge rows → (url, in_deg, out_deg,
    n_reciprocal) int64 stats for every node of the distinct edge
    set (duplicates and extra columns ignored)."""
    from ..stages.hashagg import hash_aggregate
    from .pagerank import _thin

    n_part = num_partitions or _n_partitions()
    thin = _thin(edges.select_columns([src_col, target_col])
                 .rename_columns({src_col: "src",
                                  target_col: "target"}),
                 ["src", "target"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df["src"], df["target"]
        lo, hi = a.where(a <= b, b), b.where(a <= b, a)
        h = pd.util.hash_pandas_object(
            pd.DataFrame({"lo": lo, "hi": hi}), index=False)
        return df.assign(__part=(h % n_part).astype("int64")
                         .to_numpy())

    def partials(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["src", "target"]].drop_duplicates()
        src = g["src"].to_numpy(dtype=object)
        tgt = g["target"].to_numpy(dtype=object)
        urls = np.unique(np.concatenate([src, tgt]))
        L = max(len(urls), 1)
        sc = np.searchsorted(urls, src).astype(np.int64)
        tc = np.searchsorted(urls, tgt).astype(np.int64)
        codes = sc * L + tc
        # reciprocity: does each edge's reverse exist in this
        # partition? (it must be HERE if it exists at all — both
        # directions hash to the same unordered pair)
        rec = np.isin(tc * L + sc, codes) & (sc != tc)
        out_d = np.bincount(sc, minlength=len(urls))
        in_d = np.bincount(tc, minlength=len(urls))
        n_rec = np.zeros(len(urls), dtype=np.int64)
        np.add.at(n_rec, sc[rec], 1)
        return pd.DataFrame({
            "url": urls,
            "in_deg": in_d.astype("int64"),
            "out_deg": out_d.astype("int64"),
            "n_reciprocal": n_rec,
        })

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("url", as_index=False).agg(
            in_deg=("in_deg", "sum"), out_deg=("out_deg", "sum"),
            n_reciprocal=("n_reciprocal", "sum"))

    parts = thin.map_batches(tag, batch_format="pandas") \
        .groupby("__part").map_groups(
            lambda g: partials(g.drop(columns="__part")),
            batch_format="pandas")
    out = hash_aggregate(parts, ["url"], combine,
                         num_partitions=n_part)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if "url" not in df.columns:
            return pd.DataFrame({
                "url": pd.Series([], dtype="object"),
                "in_deg": pd.Series([], dtype="int64"),
                "out_deg": pd.Series([], dtype="int64"),
                "n_reciprocal": pd.Series([], dtype="int64")})
        for c in ("in_deg", "out_deg", "n_reciprocal"):
            df[c] = df[c].astype("int64")
        return df

    return out.map_batches(finish, batch_format="pandas")


def degree_stats_reference(edge_list) -> dict:
    """Pure-Python reference (tests): url -> (in, out, reciprocal)."""
    e = set(edge_list)
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    out: dict = {n: [0, 0, 0] for n in nodes}
    for u, v in e:
        out[v][0] += 1
        out[u][1] += 1
        if u != v and (v, u) in e:
            out[u][2] += 1
    return {n: tuple(c) for n, c in out.items()}


def degree_stats_oracle_sql(edges_cte: str) -> str:
    """DuckDB twin of ``degree_stats``."""
    return f"""
        WITH raw_e AS ({edges_cte}),
        e AS (SELECT DISTINCT src, target FROM raw_e),
        nodes AS (SELECT DISTINCT url FROM
                  (SELECT src AS url FROM e
                   UNION ALL SELECT target FROM e)),
        outd AS (SELECT src AS url, count(*) AS c FROM e GROUP BY 1),
        ind AS (SELECT target AS url, count(*) AS c FROM e GROUP BY 1),
        rec AS (SELECT e.src AS url, count(*) AS c
                FROM e JOIN e r ON e.src = r.target
                                AND e.target = r.src
                WHERE e.src <> e.target GROUP BY 1)
        SELECT n.url,
               CAST(COALESCE(i.c, 0) AS BIGINT) AS in_deg,
               CAST(COALESCE(o.c, 0) AS BIGINT) AS out_deg,
               CAST(COALESCE(r.c, 0) AS BIGINT) AS n_reciprocal
        FROM nodes n
        LEFT JOIN ind i ON n.url = i.url
        LEFT JOIN outd o ON n.url = o.url
        LEFT JOIN rec r ON n.url = r.url"""


def avg_neighbor_degree(edges: rd.Dataset, *,
                        src_col: str = "src",
                        dst_col: str = "target",
                        num_partitions: int | None = None
                        ) -> rd.Dataset:
    """Degree-binned average neighbor degree — Barabási's knn(k)
    curve (Pastor-Satorras et al. 2001), THE degree-correlation
    readout: decreasing knn(k) = disassortative hub-periphery webs,
    increasing = assortative social-style meshes. Over the distinct
    UNDIRECTED pair set: per degree k, annd_ppm =
    10⁶·Σ_{v:d(v)=k} Σ_{u∼v} d(u) // (k·|{v:d(v)=k}|) — exact
    integers (the float-free counterpart of `assortativity.py`'s
    moment Pearson).

    Scale shape: distinct-pair dedup → one degree hash aggregate →
    TWO ``join_ready`` joins re-attach endpoint degrees per edge →
    per-node neighbor-degree sums (narrow combiner) → a ≤ max-degree
    driver fold.
    """
    from ..scale import scale_partitions
    from ..stages.hashagg import hash_aggregate
    from .dedup import join_ready
    n_part = num_partitions or scale_partitions()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[src_col], df[dst_col]
        lo, hi = a.where(a <= b, b), b.where(a <= b, a)
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[lo != hi].drop_duplicates()

    und = hash_aggregate(
        edges.map_batches(canon, batch_format="pandas"),
        ["a", "b"], lambda df: df.drop_duplicates(),
        num_partitions=n_part).materialize()
    empty = pa.table({"degree": pa.array([], pa.int64()),
                      "n_nodes": pa.array([], pa.int64()),
                      "annd_ppm": pa.array([], pa.int64())})
    if und.count() == 0:
        return rd.from_arrow(empty)

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        if "d" in df.columns:
            return df.groupby("node", as_index=False) \
                .agg(d=("d", "sum"))
        out = pd.DataFrame({"node": pd.concat([df["a"], df["b"]],
                                              ignore_index=True),
                            "d": 1})
        return out.groupby("node", as_index=False) \
            .agg(d=("d", "sum"))

    deg = join_ready(hash_aggregate(und, ["node"], endpoints,
                                    num_partitions=n_part), n_part)
    e1 = join_ready(und, n_part).join(
        deg, join_type="inner", num_partitions=n_part,
        on=("a",), right_on=("node",))
    e1 = join_ready(e1.map_batches(
        lambda df: df.rename(columns={"d": "da"}),
        batch_format="pandas"), n_part)
    e2 = e1.join(deg, join_type="inner", num_partitions=n_part,
                 on=("b",), right_on=("node",))

    def nd_partial(df: pd.DataFrame) -> pd.DataFrame:
        if "snd" in df.columns:
            return df.groupby("node", as_index=False) \
                .agg(snd=("snd", "sum"), d=("d_", "max")) \
                .rename(columns={"d": "d_"}) \
                if "d_" in df.columns else df
        out = pd.concat([
            pd.DataFrame({"node": df["a"], "snd": df["d"],
                          "d_": df["da"]}),
            pd.DataFrame({"node": df["b"], "snd": df["da"],
                          "d_": df["d"]})], ignore_index=True)
        return out.groupby("node", as_index=False) \
            .agg(snd=("snd", "sum"), d_=("d_", "max"))

    per_node = hash_aggregate(e2, ["node"], nd_partial,
                              num_partitions=n_part)

    from .fold import bounded_fold_tables
    tables = bounded_fold_tables(per_node)
    if not tables:
        return rd.from_arrow(empty)
    g = pa.concat_tables(
        [t.select(["node", "snd", "d_"]).cast(
            pa.schema([("node", t.schema.field("node").type),
                       ("snd", pa.int64()), ("d_", pa.int64())]))
         for t in tables]).to_pandas() \
        .groupby("node", as_index=False) \
        .agg(snd=("snd", "sum"), d_=("d_", "max"))
    k = g.groupby("d_", as_index=False) \
        .agg(n_nodes=("node", "size"), snd=("snd", "sum")) \
        .sort_values("d_")
    d = k["d_"].to_numpy(np.int64)
    nn = k["n_nodes"].to_numpy(np.int64)
    snd = k["snd"].to_numpy(np.int64)
    return rd.from_arrow(pa.table({
        "degree": pa.array(d, pa.int64()),
        "n_nodes": pa.array(nn, pa.int64()),
        "annd_ppm": pa.array((1_000_000 * snd)
                             // np.maximum(d * nn, 1), pa.int64())}))


def annd_oracle_sql(edges_cte: str) -> str:
    return f"""
        WITH raw_e AS ({edges_cte}),
        e AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, target) AS a,
                   GREATEST(src, target) AS b
            FROM raw_e WHERE src <> target),
        bd AS MATERIALIZED (
            SELECT a AS u, b AS v FROM e
            UNION ALL SELECT b, a FROM e),
        deg AS MATERIALIZED (
            SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM bd GROUP BY 1),
        nd AS MATERIALIZED (
            SELECT bd.u AS node, MAX(x.d) AS d,
                   CAST(SUM(y.d) AS BIGINT) AS snd
            FROM bd
            JOIN deg x ON bd.u = x.node
            JOIN deg y ON bd.v = y.node
            GROUP BY 1)
        SELECT CAST(d AS BIGINT) AS degree,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST((1000000 * SUM(snd))
                    // GREATEST(d * COUNT(*), 1) AS BIGINT)
                   AS annd_ppm
        FROM nd GROUP BY d ORDER BY 1
    """
