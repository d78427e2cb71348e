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
                   driver_edge_limit: int = 5_000_000) -> rd.Dataset:
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
    raise NotImplementedError(
        "distributed Borůvka path: attach labels by join_ready hash "
        "joins, best-edge via hash_aggregate min-by-(−w,a,b), "
        "bounded hash-min merges — wire when an input exceeds "
        f"driver_edge_limit={driver_edge_limit}")


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
