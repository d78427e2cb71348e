"""Distributed triangle counting (per-node) over an edge table.

The missing graph-analytics class next to the centrality operators
(`functions/pagerank.py`, `functions/hits.py`): clustering structure.
Classic degree-ordered "forward" algorithm, expressed as Ray Data
primitives:

1. canonicalize + distinct the undirected edge set (narrow rows);
2. per-node degrees via the hash-partitioned aggregate;
3. orient every edge from the LOWER-ranked endpoint to the higher,
   rank = (degree, node) — the oriented out-degree is then bounded by
   O(sqrt(m)) even at a hub node, which bounds the wedge fan-out (the
   step that is quadratic per node in the naive algorithm);
4. wedge generation: one hash exchange on the wedge center, then a
   fully VECTORIZED within-partition pair emission (numpy repeat /
   arange index arithmetic — no per-node Python loop);
5. one (v, w) hash join of wedges against the oriented edges — every
   match is exactly one triangle (the orientation makes the graph a
   DAG, so each triangle has exactly one (u→v, u→w, v→w) form);
6. per-node counts: each triangle credits its three corners; the
   usual combiner → hash-partitioned sum finishes.

Per-node counts are orientation-independent, so the DuckDB oracle can
use plain LEAST/GREATEST lexicographic orientation while this
implementation uses the degree ordering it needs at scale.

Everything that moves is a narrow (int64|string, int64|string) row;
no payload columns enter the exchanges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["triangle_counts", "triangle_counts_reference"]


def _n_partitions() -> int:
    from ..scale import scale_partitions
    return scale_partitions()


def triangle_counts(edges: rd.Dataset, *, src_col: str = "a",
                    dst_col: str = "b",
                    num_partitions: int | None = None,
                    driver_edge_limit: int = 5_000_000) -> rd.Dataset:
    """(node, n_triangles) for every node of ``edges`` that closes at
    least one triangle. Self-loops and duplicate/reverse edges are
    ignored (the graph is the distinct undirected edge set).

    Below ``driver_edge_limit`` distinct edges the count runs on the
    driver (same small-input fast path as ``pagerank`` /
    ``minhash_cluster`` — the multi-join distributed plan is pure
    fixed overhead at that size); the two paths are locked identical
    by tests. Set the limit to 0 to force the distributed path."""
    from ..stages.hashagg import hash_aggregate
    from .dedup import join_ready

    n_part = num_partitions or _n_partitions()

    # the node dtype survives empty intermediate blocks (a
    # triangle-free graph must still yield a stable (node,
    # n_triangles) schema)
    sch = edges.schema()
    t = dict(zip(sch.names, sch.types))[src_col]
    # Ray reports Arrow types for Arrow blocks and numpy/python types
    # for pandas blocks — normalize to a pandas dtype either way
    node_dtype = t.to_pandas_dtype() if hasattr(t, "to_pandas_dtype") \
        else ("object" if t is object else t)

    def _empty_counts() -> pd.DataFrame:
        return pd.DataFrame({
            "node": pd.Series([], dtype=node_dtype),
            "n_triangles": pd.Series([], dtype="int64")})

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[src_col], df[dst_col]
        lo, hi = a.where(a <= b, b), b.where(a <= b, a)
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[lo != hi].drop_duplicates()

    def dedup_edges(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["a", "b"])

    # batch-local canon+dedup first (no shuffle); the driver fast path
    # dedupes in the reference itself, so small graphs never pay the
    # hash-partition exchange (see pagerank.py's _thin)
    thin = edges.map_batches(canon, batch_format="pandas").materialize()

    if thin.count() <= driver_edge_limit:
        df = thin.to_pandas()
        counts = triangle_counts_reference(
            list(zip(df["a"], df["b"])))
        out = pd.DataFrame(
            {"node": pd.Series(list(counts.keys()), dtype=node_dtype),
             "n_triangles": pd.Series(list(counts.values()),
                                      dtype="int64")})
        return rd.from_pandas(out if len(out) else _empty_counts())

    und = hash_aggregate(thin, ["a", "b"], dedup_edges,
                         num_partitions=n_part)
    und = join_ready(und, n_part)

    # per-node degree over the distinct undirected edges
    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": pd.concat([df["a"], df["b"]],
                                            ignore_index=True)})

    def count_nodes(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("n", as_index=False).agg(d=("n", "size")) \
            if "d" not in df.columns else \
            df.groupby("n", as_index=False).agg(d=("d", "sum"))

    deg = hash_aggregate(und.map_batches(endpoints,
                                         batch_format="pandas"),
                         ["n"], count_nodes, num_partitions=n_part)
    deg = join_ready(deg, n_part)

    # attach both endpoint degrees (two narrow hash joins), orient
    e1 = und.join(deg, join_type="inner", num_partitions=n_part,
                  on=("a",), right_on=("n",))
    e1 = e1.map_batches(
        lambda df: df[["a", "b", "d"]].rename(columns={"d": "da"}),
        batch_format="pandas")
    e1 = join_ready(e1, n_part)   # chained-join hazard (CLAUDE.md)
    e2 = e1.join(deg, join_type="inner", num_partitions=n_part,
                 on=("b",), right_on=("n",))

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["a", "b", "da", "d"]].rename(columns={"d": "db"})
        fwd = (df["da"] < df["db"]) | ((df["da"] == df["db"]) &
                                       (df["a"] < df["b"]))
        out = pd.DataFrame({
            "x": df["a"].where(fwd, df["b"]),
            "y": df["b"].where(fwd, df["a"]),
            "dy": df["db"].where(fwd, df["da"]).astype("int64"),
        })
        return out

    oriented = e2.map_batches(orient, batch_format="pandas") \
        .materialize()   # consumed twice: wedge source + closing join

    # wedges: hash exchange on the center x, vectorized pair emission
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["x"], index=False)
        return df.assign(__part=(h % n_part).astype("int64")
                         .to_numpy())

    def emit_wedges(g: pd.DataFrame) -> pa.Table:
        # neighbors of each center sorted by rank (dy, y) — the pair
        # (v earlier, w later) then matches the oriented closing edge
        g = g.sort_values(["x", "dy", "y"], kind="mergesort")
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        n = len(g)
        if not n:
            # type the empty table off the input arrays — a hardcoded
            # int64 schema would conflict with string node ids when an
            # empty group hits this branch (empty-block hazard)
            return pa.table({"u": pa.array(x[:0]),
                             "v": pa.array(y[:0]),
                             "w": pa.array(y[:0])})
        new = np.empty(n, dtype=bool)
        new[:1] = True
        new[1:] = x[1:] != x[:-1]
        grp = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        local = np.arange(n) - starts[grp]
        reps = sizes[grp] - 1 - local          # partners after me
        total = int(reps.sum())
        if not total:
            return pa.table({"u": pa.array(x[:0]),
                             "v": pa.array(y[:0]),
                             "w": pa.array(y[:0])})
        v_rows = np.repeat(np.arange(n), reps)
        cum = np.concatenate(([0], np.cumsum(reps)))
        w_rows = np.arange(total) - np.repeat(cum[:-1], reps) \
            + v_rows + 1
        return pa.table({"u": pa.array(x[v_rows]),
                         "v": pa.array(y[v_rows]),
                         "w": pa.array(y[w_rows])})

    wedges = oriented.map_batches(tag, batch_format="pandas") \
        .groupby("__part").map_groups(emit_wedges,
                                      batch_format="pandas")
    wedges = join_ready(wedges, n_part)
    # a FULLY-empty join side repartitions to one schema-less block
    # and the join finalize fails ("No match ... FieldRef") — a
    # wedge-free graph (paths, stars) must skip the join outright
    if wedges.count() == 0:
        return rd.from_pandas(_empty_counts())

    closing = oriented.map_batches(
        lambda df: df[["x", "y"]], batch_format="pandas")
    closing = join_ready(closing, n_part)

    tri = wedges.join(closing, join_type="inner",
                      num_partitions=n_part,
                      on=("v", "w"), right_on=("x", "y"))

    # per-node counts: one row per triangle corner, combiner, hash sum
    def corners(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "u" not in df.columns:
            return pd.DataFrame({"node": pd.Series([],
                                                   dtype=node_dtype)})
        return pd.DataFrame({"node": pd.concat(
            [df["u"], df["v"], df["w"]], ignore_index=True)})

    def count_corners(df: pd.DataFrame) -> pd.DataFrame:
        if "node" not in df.columns:
            return _empty_counts()
        if "n_triangles" in df.columns:
            return df.groupby("node", as_index=False) \
                .agg(n_triangles=("n_triangles", "sum"))
        return df.groupby("node", as_index=False) \
            .agg(n_triangles=("node", "size"))

    out = hash_aggregate(tri.map_batches(corners,
                                         batch_format="pandas"),
                         ["node"], count_corners,
                         num_partitions=n_part)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if "node" not in df.columns:
            return _empty_counts()
        df["n_triangles"] = df["n_triangles"].astype("int64")
        return df

    # a triangle-free graph produces ZERO blocks (no groups anywhere);
    # one typed empty sentinel block keeps the output schema stable
    return out.map_batches(finish, batch_format="pandas") \
        .union(rd.from_pandas(_empty_counts()))


def triangle_counts_reference(edge_list) -> dict:
    """Single-process reference: per-node triangle counts of the
    distinct undirected edge set (for tests)."""
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict = {}
    for a, b in und:               # a < b by the canonical sort
        for c in adj[a] & adj[b]:
            if c > b:              # counts each {a<b<c} exactly once
                for n in (a, b, c):
                    counts[n] = counts.get(n, 0) + 1
    return counts
