"""Per-edge neighbor-overlap features (link-prediction primitives).

The feature row behind every classic link-prediction / spam-edge
scorer (Liben-Nowell & Kleinberg 2003): for each undirected edge,
how much do its endpoints' neighborhoods overlap?

    cn          = |N(u) ∩ N(v)|          (common neighbors)
    jaccard_ppm = 1e6·cn // (deg_u + deg_v − cn)

— a LOW overlap on a high-degree pair is the hallmark of a paid/spam
link (no organic context); a high one is an embedded, trustworthy
edge. Adamic–Adar needs logs, so the emitted features stay the two
integer primitives every variant is built from (the CLAUDE.md rule).

cn(u,v) is exactly the number of triangles the edge participates in,
so the distributed plan is the degree-ordered triangle pipeline of
``triangles.py`` with EDGE crediting instead of corner crediting:
orient by (degree, node) rank so wedge fan-out is O(√m) even at
hubs, one wedge exchange + one closing-edge hash join enumerates each
triangle once, and each triangle credits its three canonical edges
through a hash-partitioned sum; degrees ride the same two narrow
joins that built the orientation. Triangle-free edges surface with
cn = 0 via a left-outer join back to the degree-attached edge table.

Below ``driver_edge_limit`` distinct edges the whole thing is one
numpy/dict pass on the driver (the pagerank/triangles fast-path
convention), locked identical to the distributed path by tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["edge_neighbor_overlap", "edge_overlap_reference",
           "edge_overlap_oracle_sql"]


def edge_overlap_reference(edge_list) -> dict:
    """{(lo, hi): (cn, d_lo, d_hi, jaccard_ppm)} over the distinct
    undirected edge set — single-process reference AND driver path."""
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for a, b in sorted(und):
        cn = len(adj[a] & adj[b])
        da, db = len(adj[a]), len(adj[b])
        out[(a, b)] = (cn, da, db,
                       1_000_000 * cn // (da + db - cn))
    return out


def edge_neighbor_overlap(edges: rd.Dataset, *,
                          src_col: str = "src",
                          dst_col: str = "target",
                          num_partitions: int | None = None,
                          driver_edge_limit: int = 5_000_000
                          ) -> rd.Dataset:
    """(a, b, cn, da, db, jaccard_ppm) for every distinct undirected
    edge (a < b); self-loops and duplicates dropped."""
    from ..scale import scale_partitions
    from ..stages.hashagg import hash_aggregate
    from .dedup import join_ready

    n_part = num_partitions or scale_partitions()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[src_col], df[dst_col]
        lo, hi = a.where(a <= b, b), b.where(a <= b, a)
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[lo != hi].drop_duplicates()

    thin = edges.map_batches(canon, batch_format="pandas") \
        .materialize()

    sch = edges.schema()
    t = dict(zip(sch.names, sch.types))[src_col]
    node_dtype = t.to_pandas_dtype() if hasattr(t, "to_pandas_dtype") \
        else ("object" if t is object else t)
    arrow_node_t = t if isinstance(t, pa.DataType) else \
        pa.array(np.array([], dtype=node_dtype)).type

    def _empty_out() -> pd.DataFrame:
        return pd.DataFrame({
            "a": pd.Series([], dtype=node_dtype),
            "b": pd.Series([], dtype=node_dtype),
            "cn": pd.Series([], dtype="int64"),
            "da": pd.Series([], dtype="int64"),
            "db": pd.Series([], dtype="int64"),
            "jaccard_ppm": pd.Series([], dtype="int64")})

    if thin.count() <= driver_edge_limit:
        df = thin.to_pandas()
        ref = edge_overlap_reference(list(zip(df["a"], df["b"])))
        rows = [(a, b, *vals) for (a, b), vals in ref.items()]
        out = pd.DataFrame(rows, columns=["a", "b", "cn", "da", "db",
                                          "jaccard_ppm"]) \
            if rows else _empty_out()
        for c in ("cn", "da", "db", "jaccard_ppm"):
            out[c] = out[c].astype("int64")
        return rd.from_pandas(out)

    def dedup_edges(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["a", "b"])

    und = join_ready(hash_aggregate(thin, ["a", "b"], dedup_edges,
                                    num_partitions=n_part), n_part)

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": pd.concat([df["a"], df["b"]],
                                            ignore_index=True)})

    def count_nodes(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("n", as_index=False).agg(d=("n", "size")) \
            if "d" not in df.columns else \
            df.groupby("n", as_index=False).agg(d=("d", "sum"))

    deg = join_ready(hash_aggregate(
        und.map_batches(endpoints, batch_format="pandas"), ["n"],
        count_nodes, num_partitions=n_part), n_part)

    e1 = und.join(deg, join_type="inner", num_partitions=n_part,
                  on=("a",), right_on=("n",))
    e1 = join_ready(e1.map_batches(
        lambda df: df[["a", "b", "d"]].rename(columns={"d": "da"}),
        batch_format="pandas"), n_part)
    edge_deg = e1.join(deg, join_type="inner",
                       num_partitions=n_part,
                       on=("b",), right_on=("n",))
    edge_deg = join_ready(edge_deg.map_batches(
        lambda df: df[["a", "b", "da", "d"]]
        .rename(columns={"d": "db"}),
        batch_format="pandas"), n_part)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if "a" not in df.columns or not len(df):
            return _empty_out()
        cnv = df["cn"].fillna(0).astype("int64") \
            if "cn" in df.columns else 0
        da = df["da"].astype("int64")
        db = df["db"].astype("int64")
        return pd.DataFrame({
            "a": df["a"], "b": df["b"], "cn": cnv,
            "da": da, "db": db,
            "jaccard_ppm": (1_000_000 * cnv) // (da + db - cnv)})

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        fwd = (df["da"] < df["db"]) | ((df["da"] == df["db"]) &
                                       (df["a"] < df["b"]))
        return pd.DataFrame({
            "x": df["a"].where(fwd, df["b"]),
            "y": df["b"].where(fwd, df["a"]),
            "dy": df["db"].where(fwd, df["da"]).astype("int64")})

    oriented = edge_deg.map_batches(orient, batch_format="pandas") \
        .materialize()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["x"], index=False)
        return df.assign(__part=(h % n_part).astype("int64")
                         .to_numpy())

    def _empty_wedges() -> pa.Table:
        # typed off the INPUT node dtype: a null-typed empty block
        # mixed with int64/string wedge blocks re-creates the
        # empty-schema join flake CLAUDE.md documents
        e = pa.array([], arrow_node_t)
        return pa.table({"u": e, "v": e, "w": e})

    def emit_wedges(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["x", "dy", "y"], kind="mergesort")
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        n = len(g)
        if not n:
            return _empty_wedges()
        new = np.empty(n, dtype=bool)
        new[:1] = True
        new[1:] = x[1:] != x[:-1]
        grp = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        local = np.arange(n) - starts[grp]
        reps = sizes[grp] - 1 - local
        total = int(reps.sum())
        if not total:
            return _empty_wedges()
        v_rows = np.repeat(np.arange(n), reps)
        cum = np.concatenate(([0], np.cumsum(reps)))
        w_rows = np.arange(total) - np.repeat(cum[:-1], reps) \
            + v_rows + 1
        return pa.table({"u": pa.array(x[v_rows]),
                         "v": pa.array(y[v_rows]),
                         "w": pa.array(y[w_rows])})

    wedges = join_ready(
        oriented.map_batches(tag, batch_format="pandas")
        .groupby("__part").map_groups(emit_wedges,
                                      batch_format="pandas"), n_part)
    # a FULLY-empty join side repartitions to one schema-less block
    # and the join finalize fails ("No match ... FieldRef") — a
    # wedge-free graph (paths, stars) must skip the join outright
    if wedges.count() == 0:
        return edge_deg.map_batches(finish, batch_format="pandas") \
            .union(rd.from_pandas(_empty_out()))
    closing = join_ready(oriented.map_batches(
        lambda df: df[["x", "y"]], batch_format="pandas"), n_part)
    tri = wedges.join(closing, join_type="inner",
                      num_partitions=n_part,
                      on=("v", "w"), right_on=("x", "y"))

    # each triangle credits its three CANONICAL edges
    def edge_credits(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "u" not in df.columns:
            return pd.DataFrame({"a": pd.Series([], dtype=node_dtype),
                                 "b": pd.Series([],
                                                dtype=node_dtype)})
        pairs = pd.concat([
            pd.DataFrame({"p": df["u"], "q": df["v"]}),
            pd.DataFrame({"p": df["u"], "q": df["w"]}),
            pd.DataFrame({"p": df["v"], "q": df["w"]})],
            ignore_index=True)
        lo = pairs["p"].where(pairs["p"] <= pairs["q"], pairs["q"])
        hi = pairs["q"].where(pairs["p"] <= pairs["q"], pairs["p"])
        return pd.DataFrame({"a": lo, "b": hi})

    def count_credits(df: pd.DataFrame) -> pd.DataFrame:
        if "a" not in df.columns:
            return pd.DataFrame({
                "a": pd.Series([], dtype=node_dtype),
                "b": pd.Series([], dtype=node_dtype),
                "cn": pd.Series([], dtype="int64")})
        if "cn" in df.columns:
            return df.groupby(["a", "b"], as_index=False) \
                .agg(cn=("cn", "sum"))
        return df.groupby(["a", "b"], as_index=False) \
            .agg(cn=("a", "size"))

    cn = join_ready(hash_aggregate(
        tri.map_batches(edge_credits, batch_format="pandas"),
        ["a", "b"], count_credits, num_partitions=n_part), n_part)
    if cn.count() == 0:              # triangle-free: same join guard
        return edge_deg.map_batches(finish, batch_format="pandas") \
            .union(rd.from_pandas(_empty_out()))

    joined = edge_deg.join(cn, join_type="left_outer",
                           num_partitions=n_part,
                           on=("a", "b"), right_on=("a", "b"))
    return joined.map_batches(finish, batch_format="pandas") \
        .union(rd.from_pandas(_empty_out()))


def edge_overlap_oracle_sql(edges_cte: str) -> str:
    """LEAST/GREATEST canonical edges, common neighbors via a double
    adjacency join, degrees, integer jaccard_ppm."""
    return f"""
        WITH raw_e AS ({edges_cte}),
        e AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, target) AS a,
                   GREATEST(src, target) AS b
            FROM raw_e WHERE src != target),
        adj AS MATERIALIZED (
            SELECT a AS n, b AS nbr FROM e
            UNION ALL SELECT b, a FROM e),
        deg AS MATERIALIZED (
            SELECT n, CAST(count(*) AS BIGINT) AS d
            FROM adj GROUP BY 1),
        cn AS MATERIALIZED (
            SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS cn
            FROM e JOIN adj n1 ON n1.n = e.a
                   JOIN adj n2 ON n2.n = e.b AND n2.nbr = n1.nbr
            GROUP BY 1, 2)
        SELECT e.a, e.b,
               CAST(COALESCE(cn.cn, 0) AS BIGINT) AS cn,
               du.d AS da, dv.d AS db,
               CAST((1000000 * COALESCE(cn.cn, 0))
                    // (du.d + dv.d - COALESCE(cn.cn, 0))
                    AS BIGINT) AS jaccard_ppm
        FROM e
        LEFT JOIN cn ON cn.a = e.a AND cn.b = e.b
        JOIN deg du ON du.n = e.a JOIN deg dv ON dv.n = e.b"""
