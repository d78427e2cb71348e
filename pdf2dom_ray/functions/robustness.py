"""Targeted-attack robustness curve: giant component vs hub removal.

The Albert–Jeong–Barabási (Nature 2000) "error and attack tolerance"
experiment, the standard web-graph resilience readout: remove the
top-k highest-degree nodes (ties → lowest id) and measure how the
largest connected component collapses. Scale-free webs survive random
failure but shatter under targeted hub attack — the curve quantifies
how much of a crawl's connectivity hangs off a few hubs (CDN/portal
dependence).

Semantics: over the distinct undirected pair set (self-loops
dropped), for each k in ``ks``: drop every edge incident to the top-k
nodes ranked by (degree DESC, node ASC), then label nodes with the
same bounded ``rounds``-step synchronous hash-min as
``ccomp.cc_labels`` and report

    (k_removed, n_nodes, giant, frac_ppm = 10⁶·giant // n_nodes)

where n_nodes counts surviving (non-isolated) nodes and giant is the
largest label class. Bounded rounds keep the number a closed-form,
partition-independent quantity the unrolled SQL oracle replays.

Scale shape: one global pair-distinct exchange + one node-keyed
degree aggregate, a ≤ max(ks)-row driver top-k merge (takeOrdered
pattern), then |ks| bounded hash-min label runs over filtered edge
sets (each `ccomp.cc_labels`, which is BSP-sharded past its driver
limit) with per-partition component-size partials — the driver folds
only (label, count) partials, never node rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["robustness_curve", "robustness_oracle_sql"]


def robustness_curve(edges: rd.Dataset, *,
                     ks: tuple = (0, 1, 2, 5, 10),
                     rounds: int = 8,
                     src_col: str = "src", dst_col: str = "target",
                     num_partitions: int | None = None) -> rd.Dataset:
    from ..scale import scale_partitions
    from ..stages.hashagg import hash_aggregate
    from .ccomp import cc_labels
    from .fold import bounded_fold_tables
    from .pagerank import _distinct

    n_part = num_partitions or scale_partitions()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[src_col], df[dst_col]
        lo, hi = a.where(a <= b, b), b.where(a <= b, a)
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[(lo != hi).to_numpy()].drop_duplicates()

    und = _distinct(edges.map_batches(canon, batch_format="pandas"),
                    ["a", "b"]).materialize()
    empty = pa.table({"k_removed": pa.array([], pa.int64()),
                      "n_nodes": pa.array([], pa.int64()),
                      "giant": pa.array([], pa.int64()),
                      "frac_ppm": pa.array([], pa.int64())})
    if und.count() == 0:
        return rd.from_arrow(empty)

    # node degrees: doubled directed copies keyed by node
    def doubled(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": pd.concat([df["a"], df["b"]], ignore_index=True),
            "d": np.int64(1)})

    def sum_d(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False).agg(d=("d", "sum"))

    deg = hash_aggregate(und.map_batches(doubled,
                                         batch_format="pandas"),
                         ["node"], sum_d, num_partitions=n_part)

    # top max(ks) hubs: per-block partial + driver merge (takeOrdered)
    kmax = max(ks)
    hubs: list = []
    if kmax > 0:
        def local_topk(t: pa.Table) -> pa.Table:
            if not t.num_rows or "node" not in t.schema.names:
                return pa.table({"node": pa.array([], pa.string()),
                                 "d": pa.array([], pa.int64())})
            idx = pa.compute.sort_indices(
                t, sort_keys=[("d", "descending"),
                              ("node", "ascending")])
            return t.take(idx[:kmax])

        # partial top-k map-side so the driver only folds ≤ kmax rows
        # per block; the fold's pre-merge re-applies it past 64 blocks
        parts = bounded_fold_tables(
            deg.map_batches(local_topk, batch_format="pyarrow"),
            local_topk)
        parts = [p for p in parts if p.num_rows]
        if parts:
            merged = pa.concat_tables(
                [p.select(["node", "d"]) for p in parts]) \
                .combine_chunks()
            idx = pa.compute.sort_indices(
                merged, sort_keys=[("d", "descending"),
                                   ("node", "ascending")])
            hubs = merged.take(idx[:kmax]).column("node").to_pylist()

    out_k, out_n, out_g = [], [], []
    for k in ks:
        removed = set(hubs[:k])

        def filt(df: pd.DataFrame, removed=removed) -> pd.DataFrame:
            keep = ~(df["a"].isin(removed) | df["b"].isin(removed))
            return pd.DataFrame({"src": df["a"][keep],
                                 "target": df["b"][keep]})

        ek = und.map_batches(filt, batch_format="pandas")
        labels = cc_labels(ek, rounds=rounds)

        def sizes(t: pa.Table) -> pa.Table:
            empty_s = pa.table({"c": pa.array([], pa.string()),
                                "n": pa.array([], pa.int64())})
            if not t.num_rows:
                return empty_s
            col = "component" if "component" in t.schema.names else \
                ("c" if "c" in t.schema.names else None)
            if col is None:
                return empty_s
            if col == "c":                       # pre-merge re-combine
                df = t.to_pandas().groupby("c")["n"].sum()
            else:
                df = t.to_pandas().groupby("component").size()
            return pa.table({
                "c": pa.array([str(x) for x in df.index],
                              pa.string()),
                "n": pa.array(df.to_numpy(np.int64), pa.int64())})

        # per-block size partials map-side; the fold re-applies the
        # same combine in its pre-merge round past 64 blocks
        sized = labels.map_batches(sizes, batch_format="pyarrow")
        tabs = [t for t in bounded_fold_tables(sized, sizes)
                if t.num_rows]
        if tabs:
            g = pa.concat_tables(tabs).to_pandas() \
                .groupby("c")["n"].sum()
            n_nodes = int(g.sum())
            giant = int(g.max())
        else:
            n_nodes, giant = 0, 0
        out_k.append(k)
        out_n.append(n_nodes)
        out_g.append(giant)

    nk = np.asarray(out_k, dtype=np.int64)
    nn = np.asarray(out_n, dtype=np.int64)
    gg = np.asarray(out_g, dtype=np.int64)
    return rd.from_arrow(pa.table({
        "k_removed": pa.array(nk, pa.int64()),
        "n_nodes": pa.array(nn, pa.int64()),
        "giant": pa.array(gg, pa.int64()),
        "frac_ppm": pa.array((1_000_000 * gg)
                             // np.maximum(nn, 1), pa.int64())}))


def robustness_oracle_sql(edges_cte: str, *,
                          ks: tuple = (0, 1, 2, 5, 10),
                          rounds: int = 8) -> str:
    """Per-k unrolled hash-min (ccomp.cc_oracle_sql) over the hub-
    filtered pair set, each arm its own scoped WITH subquery."""
    from .ccomp import cc_oracle_sql
    base = f"""
        WITH p AS MATERIALIZED (
          SELECT DISTINCT LEAST(src, target) AS a,
                 GREATEST(src, target) AS b
          FROM ({edges_cte}) WHERE src <> target),
        deg AS MATERIALIZED (
          SELECT node, COUNT(*) AS d FROM (
            SELECT a AS node FROM p UNION ALL SELECT b FROM p)
          GROUP BY node),
        rk AS MATERIALIZED (
          SELECT node,
                 ROW_NUMBER() OVER (ORDER BY d DESC, node) AS r
          FROM deg)"""
    arms = []
    for k in ks:
        ek = f"""SELECT a AS src, b AS target FROM p
              WHERE a NOT IN (SELECT node FROM rk WHERE r <= {k})
                AND b NOT IN (SELECT node FROM rk WHERE r <= {k})"""
        arms.append(f"""
        SELECT CAST({k} AS BIGINT) AS k_removed,
               CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_nodes,
               CAST(COALESCE(MAX(n), 0) AS BIGINT) AS giant,
               CAST((1000000 * COALESCE(MAX(n), 0))
                    // GREATEST(COALESCE(SUM(n), 0), 1) AS BIGINT)
                   AS frac_ppm
        FROM (SELECT component, COUNT(*) AS n
              FROM ({cc_oracle_sql(ek, rounds=rounds)})
              GROUP BY component)""")
    return base + " ".join(arms[:1]) + "".join(
        " UNION ALL" + a for a in arms[1:])
