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
           "degree_stats_oracle_sql"]


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
