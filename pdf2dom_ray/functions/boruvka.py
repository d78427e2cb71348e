"""Borůvka maximum-weight spanning forest (bounded synchronous rounds).

The classic parallel MST/MSF algorithm (Borůvka 1926; the GraphX /
Pregel standard): each round every component selects its best
incident cross edge, the selected edges merge components, and ~log n
rounds span the graph. Used on web graphs to pick the heaviest
link backbone (host mirror trees, canonical-link forests) and in
clustering as single-linkage's distributed form.

Determinism: the edge order is the strict total key (w DESC, a ASC,
b ASC) over DISTINCT canonical pairs (duplicate pair weights
MAX-merge first), so "best edge per component" has no ties. Each
outer round runs ``label_rounds`` synchronous hash-min label
propagations over the selected-edge set to merge components —
bounded-round semantics exactly like ``ccomp.py`` (selected edges
form pseudo-forests; chains longer than ``label_rounds`` finish in
later outer rounds). The unrolled SQL oracle replays every round
verbatim (all CTEs AS MATERIALIZED, CLAUDE.md).

Scale shape: below ``driver_edge_limit`` one numpy loop over integer
codes. Beyond: per outer round, (1) labels attach to edges by two
``join_ready`` hash joins, (2) per-component best edge through the
hash-partitioned aggregate with an idempotent min-by-key combiner,
(3) ``label_rounds`` hash-min scatters over the ≤ n selected edges
(narrow); forest edges accumulate on the driver (≤ n−1 total rows —
driver-size by definition of a forest).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["boruvka_forest", "boruvka_oracle_sql"]


def _canon_weighted(edges: rd.Dataset, src_col: str, dst_col: str,
                    w_col: str) -> rd.Dataset:
    def local(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[src_col], df[dst_col]
        lo, hi = a.where(a <= b, b), b.where(a <= b, a)
        out = pd.DataFrame({"a": lo, "b": hi, "w": df[w_col]})
        out = out[lo != hi]
        return out.groupby(["a", "b"], as_index=False) \
            .agg(w=("w", "max"))
    return edges.map_batches(local, batch_format="pandas")


def _driver_boruvka(df: pd.DataFrame, rounds: int,
                    label_rounds: int) -> pa.Table:
    df = df.groupby(["a", "b"], as_index=False).agg(w=("w", "max"))
    nodes, codes = np.unique(
        np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]),
        return_inverse=True)
    n = len(nodes)
    m = len(df)
    ai, bi = codes[:m], codes[m:]
    w = df["w"].to_numpy(np.int64)
    labels = np.arange(n, dtype=np.int64)
    sel_a, sel_b, sel_w, sel_r = [], [], [], []
    chosen = np.zeros(m, dtype=bool)
    forest = np.empty(0, dtype=np.int64)   # cumulative selections
    for r in range(rounds):
        la, lb = labels[ai], labels[bi]
        cross = (la != lb) & ~chosen
        if not cross.any():
            break
        # best cross edge per component: min key (-w, a, b)
        idx = np.flatnonzero(cross)
        order = np.lexsort((bi[idx], ai[idx], -w[idx]))
        idx = idx[order]
        best: dict[int, int] = {}
        for e in idx.tolist():       # first hit per label wins
            for lab in (int(labels[ai[e]]), int(labels[bi[e]])):
                if lab not in best:
                    best[lab] = e
        sel = np.unique(np.fromiter(best.values(), dtype=np.int64))
        chosen[sel] = True
        sel_a.extend(nodes[ai[sel]].tolist())
        sel_b.extend(nodes[bi[sel]].tolist())
        sel_w.extend(w[sel].tolist())
        sel_r.extend([r] * len(sel))
        # bounded hash-min label merge over the CUMULATIVE forest —
        # this round's merges must flow through earlier rounds'
        # trees, or a partially-relabeled component re-selects an
        # internal edge next round (a cycle)
        forest = np.concatenate([forest, sel])
        for _ in range(label_rounds):
            nxt = labels.copy()
            np.minimum.at(nxt, ai[forest], labels[bi[forest]])
            np.minimum.at(nxt, bi[forest], labels[ai[forest]])
            if np.array_equal(nxt, labels):
                break
            labels = nxt
    order = np.lexsort((sel_b, sel_a))
    return pa.table({
        "a": pa.array(np.asarray(sel_a, dtype=object)[order]
                      .tolist()),
        "b": pa.array(np.asarray(sel_b, dtype=object)[order]
                      .tolist()),
        "w": pa.array(np.asarray(sel_w, dtype=np.int64)[order],
                      pa.int64()),
        "round": pa.array(np.asarray(sel_r, dtype=np.int64)[order],
                          pa.int64())})


def boruvka_forest(edges: rd.Dataset, *, rounds: int = 3,
                   label_rounds: int = 5,
                   src_col: str = "src", dst_col: str = "target",
                   w_col: str = "w",
                   driver_edge_limit: int = 5_000_000,
                   num_partitions: int | None = None) -> rd.Dataset:
    """(a, b, w, round) forest edges selected in ``rounds`` Borůvka
    rounds (max-weight; strict (w desc, a, b) total order)."""
    thin = _canon_weighted(edges, src_col, dst_col,
                           w_col).materialize()
    if thin.count() == 0:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
            "round": pa.array([], pa.int64())}))
    if thin.count() <= driver_edge_limit:
        return rd.from_arrow(_driver_boruvka(
            thin.to_pandas(), rounds, label_rounds))
    return _dataset_boruvka(thin, rounds, label_rounds,
                            num_partitions)


def boruvka_oracle_sql(edges_cte: str, *, rounds: int = 3,
                       label_rounds: int = 5) -> str:
    """Unrolled Borůvka rounds in DuckDB; every CTE AS MATERIALIZED
    (CLAUDE.md). Best edge per component via QUALIFY row_number."""
    parts = [f"""WITH raw_e AS MATERIALIZED ({edges_cte}),
        e AS MATERIALIZED (
            SELECT least(src, target) AS a,
                   greatest(src, target) AS b, MAX(w) AS w
            FROM raw_e WHERE src <> target GROUP BY 1, 2),
        l0_0 AS MATERIALIZED (
            SELECT a AS node FROM e UNION SELECT b FROM e),
        lab0 AS MATERIALIZED (
            SELECT node, node AS lab FROM l0_0),
        sel_none AS MATERIALIZED (
            SELECT a, b FROM e WHERE 1 = 0)"""]
    prev_lab = "lab0"
    prev_sel = "sel_none"
    sel_names = []
    for r in range(rounds):
        parts.append(f""",
        cross{r} AS MATERIALIZED (
            SELECT e.a, e.b, e.w, x.lab AS la, y.lab AS lb
            FROM e
            JOIN {prev_lab} x ON e.a = x.node
            JOIN {prev_lab} y ON e.b = y.node
            WHERE x.lab <> y.lab
              AND NOT EXISTS (SELECT 1 FROM {prev_sel} s
                              WHERE s.a = e.a AND s.b = e.b)),
        cand{r} AS MATERIALIZED (
            SELECT la AS comp, a, b, w FROM cross{r}
            UNION ALL SELECT lb, a, b, w FROM cross{r}),
        best{r} AS MATERIALIZED (
            SELECT comp, a, b, w FROM cand{r}
            QUALIFY row_number() OVER (PARTITION BY comp
                                       ORDER BY w DESC, a, b) = 1),
        sel{r} AS MATERIALIZED (
            SELECT DISTINCT a, b, w FROM best{r}),
        allsel{r} AS MATERIALIZED (
            SELECT a, b FROM {prev_sel}
            UNION SELECT a, b FROM sel{r})""")
        sel_names.append(f"sel{r}")
        cur = prev_lab
        for j in range(label_rounds):
            parts.append(f""",
        lm{r}_{j} AS MATERIALIZED (
            SELECT n.node, LEAST(n.lab, COALESCE(MIN(o.lab), n.lab))
                       AS lab
            FROM {cur} n
            LEFT JOIN (
                SELECT s.a AS u, l.lab
                FROM allsel{r} s JOIN {cur} l ON s.b = l.node
                UNION ALL
                SELECT s.b, l.lab
                FROM allsel{r} s JOIN {cur} l ON s.a = l.node) o
              ON o.u = n.node
            GROUP BY n.node, n.lab)""")
            cur = f"lm{r}_{j}"
        prev_lab = cur
        prev_sel = f"allsel{r}"
    union = "\n            UNION ALL ".join(
        f"SELECT a, b, w, {r} AS round FROM sel{r}"
        for r in range(rounds))
    parts.append(f"""
        SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
               CAST(w AS BIGINT) AS w, CAST(round AS BIGINT) AS round
        FROM ({union}) ORDER BY a, b""")
    return "".join(parts)


def _dataset_boruvka(thin: rd.Dataset, rounds: int,
                     label_rounds: int,
                     num_partitions: int | None) -> rd.Dataset:
    """The distributed path (exercised past ``driver_edge_limit``;
    locked against the driver path at small scale by tests): per
    outer round — two ``join_ready`` label-attach joins, a
    per-component best-edge hash aggregate (idempotent min-by the
    strict (w desc, a, b) key), a left_anti exclusion of
    already-selected forest edges — then ``label_rounds`` hash-min
    merges, each ONE (forest ⋈ labels) join per direction plus a
    narrow min aggregate. Everything stays a Dataset: forest and
    labels are O(n) and never driver-materialize; only the final
    result (a forest, ≤ n−1 rows) folds out. Cost is
    rounds·(3 + 2·label_rounds) joins — the documented price of the
    synchronous formulation; the driver path is the fast path by
    orders of magnitude below its limit."""
    from ..scale import scale_partitions
    from ..stages.hashagg import hash_aggregate
    from .dedup import join_ready

    n_part = num_partitions or scale_partitions()

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["a", "b"], as_index=False) \
            .agg(w=("w", "max"))

    edges = hash_aggregate(thin, ["a", "b"], dedup,
                           num_partitions=n_part).materialize()

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"node": pd.concat([df["a"], df["b"]],
                                              ignore_index=True)}) \
            .drop_duplicates()
        return out.assign(lab=out["node"])

    def lab_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False) \
            .agg(lab=("lab", "min"))

    labels = hash_aggregate(
        edges.map_batches(init_labels, batch_format="pandas"),
        ["node"], lab_min, num_partitions=n_part).materialize()

    forest = None          # Dataset of selected (a, b, w, round)
    for r in range(rounds):
        lab = join_ready(labels, n_part)
        e1 = join_ready(edges, n_part).join(
            lab, join_type="inner", num_partitions=n_part,
            on=("a",), right_on=("node",))
        e1 = join_ready(e1.map_batches(
            lambda df: df.rename(columns={"lab": "la"}),
            batch_format="pandas"), n_part)
        cand = e1.join(lab, join_type="inner",
                       num_partitions=n_part,
                       on=("b",), right_on=("node",))
        cand = cand.map_batches(
            lambda df: df[df["la"] != df["lab"]],
            batch_format="pandas").materialize()
        if forest is not None and cand.count():
            cand = join_ready(cand, n_part).join(
                join_ready(forest.map_batches(
                    lambda df: df[["a", "b"]],
                    batch_format="pandas"), n_part),
                join_type="left_anti", num_partitions=n_part,
                on=("a", "b"))
            cand = cand.materialize()
        if cand.count() == 0:
            break

        def fan_comp(df: pd.DataFrame) -> pd.DataFrame:
            if "comp" in df.columns:
                return best_by_comp(df)
            both = pd.concat([
                df[["a", "b", "w"]].assign(comp=df["la"]),
                df[["a", "b", "w"]].assign(comp=df["lab"])],
                ignore_index=True)
            return best_by_comp(both)

        def best_by_comp(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df
            df = df.sort_values(["w", "a", "b"],
                                ascending=[False, True, True],
                                kind="mergesort")
            return df.drop_duplicates(subset=["comp"], keep="first")

        best = hash_aggregate(cand, ["comp"], fan_comp,
                              num_partitions=n_part)

        def strip(df: pd.DataFrame, _r=r) -> pd.DataFrame:
            out = df[["a", "b", "w"]].drop_duplicates()
            return out.assign(round=np.int64(_r))

        sel = hash_aggregate(
            best.map_batches(strip, batch_format="pandas"),
            ["a", "b"],
            lambda df: df.drop_duplicates(subset=["a", "b"]),
            num_partitions=n_part).materialize()
        if sel.count() == 0:
            break
        forest = sel if forest is None else \
            forest.union(sel).materialize()

        # bounded hash-min merges over the cumulative forest
        fthin = forest.map_batches(
            lambda df: df[["a", "b"]], batch_format="pandas")
        for _ in range(label_rounds):
            lab = join_ready(labels, n_part)
            via_a = join_ready(fthin, n_part).join(
                lab, join_type="inner", num_partitions=n_part,
                on=("a",), right_on=("node",))
            via_a = via_a.map_batches(
                lambda df: pd.DataFrame(
                    {"node": df["b"], "lab": df["lab"]}),
                batch_format="pandas")
            via_b = join_ready(fthin, n_part).join(
                lab, join_type="inner", num_partitions=n_part,
                on=("b",), right_on=("node",))
            via_b = via_b.map_batches(
                lambda df: pd.DataFrame(
                    {"node": df["a"], "lab": df["lab"]}),
                batch_format="pandas")
            labels = hash_aggregate(
                labels.union(via_a).union(via_b), ["node"],
                lab_min, num_partitions=n_part).materialize()

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "w": pa.array([], pa.int64()),
                      "round": pa.array([], pa.int64())})
    if forest is None:
        return rd.from_arrow(empty)
    return forest.map_batches(
        lambda df: df.sort_values(["a", "b"]),
        batch_format="pandas").sort(["a", "b"])
