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

    Scale shape: JOIN-FREE two-round node-keyed message passing
    (the standard knn(k) BSP shape). Round 1 hash-partitions the
    DOUBLED directed copies (u→v and v→u) on u — every directed
    copy of an edge keyed by u lands in u's partition, so global
    dedup AND d(u) are both partition-local; each partition then
    emits (v, d(u)) neighbor-degree messages plus a (u, d(u))
    marker. Round 2 hash-partitions those on the node: snd(v) and
    d(v) meet, and each partition bins its (complete) nodes by
    degree. Only the ≤ P·max-degree bin partials reach the driver.
    Replaces the previous dedup-exchange + degree-aggregate + two
    ``join_ready`` joins (≈5 exchanges) with 2 exchanges and no
    join artifacts to guard.
    """
    from ..scale import scale_partitions
    from .fold import bounded_fold_tables
    n_part = num_partitions or scale_partitions()
    empty = pa.table({"degree": pa.array([], pa.int64()),
                      "n_nodes": pa.array([], pa.int64()),
                      "annd_ppm": pa.array([], pa.int64())})

    def doubled(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[src_col], df[dst_col]
        keep = (a != b).to_numpy()
        a, b = a[keep], b[keep]
        out = pd.DataFrame({
            "u": pd.concat([a, b], ignore_index=True),
            "v": pd.concat([b, a], ignore_index=True)}) \
            .drop_duplicates()               # batch-local combiner
        h = pd.util.hash_pandas_object(out["u"], index=False)
        out["__part"] = (h % n_part).astype("int64").to_numpy()
        return out

    def degree_messages(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["u", "v"]].drop_duplicates()  # authoritative dedup
        if not len(g):
            return pd.DataFrame({
                "node": pd.Series([], dtype=object),
                "k": pd.Series([], dtype="int8"),
                "val": pd.Series([], dtype="int64"),
                "__p2": pd.Series([], dtype="int64")})
        d = g.groupby("u")["v"].transform("size") \
            .to_numpy(np.int64)              # d(u), complete here
        du = g.groupby("u", as_index=False).size()
        out = pd.concat([
            pd.DataFrame({"node": g["v"].to_numpy(dtype=object),
                          "k": np.int8(0), "val": d}),
            pd.DataFrame({"node": du["u"].to_numpy(dtype=object),
                          "k": np.int8(1),
                          "val": du["size"].to_numpy(np.int64)}),
        ], ignore_index=True)
        # pre-combine messages headed to the same neighbor
        out = out.groupby(["node", "k"], as_index=False)["val"].sum()
        h = pd.util.hash_pandas_object(out["node"], index=False)
        out["__p2"] = (h % n_part).astype("int64").to_numpy()
        return out

    def bin_partial(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["node", "k"], as_index=False)["val"].sum()
        mark = s[s["k"] == 1].set_index("node")["val"]
        msg = s[s["k"] == 0].set_index("node")["val"] \
            .reindex(mark.index, fill_value=0)
        df = pd.DataFrame({"d_": mark.to_numpy(np.int64),
                           "snd": msg.to_numpy(np.int64)})
        return df.groupby("d_", as_index=False) \
            .agg(n_nodes=("snd", "size"), snd=("snd", "sum"))

    partials = edges.map_batches(doubled, batch_format="pandas") \
        .groupby("__part").map_groups(
            lambda g: degree_messages(g.drop(columns="__part")),
            batch_format="pandas") \
        .groupby("__p2").map_groups(
            lambda g: bin_partial(g.drop(columns="__p2")),
            batch_format="pandas")

    tables = bounded_fold_tables(partials)
    tables = [t for t in tables if getattr(t, "num_columns", 0)]
    if not tables:
        return rd.from_arrow(empty)
    k = pa.concat_tables(
        [t.select(["d_", "n_nodes", "snd"]).cast(
            pa.schema([("d_", pa.int64()), ("n_nodes", pa.int64()),
                       ("snd", pa.int64())]))
         for t in tables]).to_pandas() \
        .groupby("d_", as_index=False) \
        .agg(n_nodes=("n_nodes", "sum"), snd=("snd", "sum")) \
        .sort_values("d_")
    if not len(k):
        return rd.from_arrow(empty)
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
