"""OOV-rate-vs-vocabulary-size curve (vocabulary budget sizing).

The tokenizer-budget companion to ``oov.py``'s per-document score:
for a ladder of vocabulary sizes V, what fraction of all corpus
tokens falls OUTSIDE the exact top-V vocabulary (count desc, token
asc — a total order, so every point is deterministic)? The knee of
this curve is how BPE/vocab budgets are actually chosen (the
coverage audits in the Gopher and BLOOM data papers); oov_ppm is
exact-integer per the CLAUDE.md oracle rule:

    oov_ppm(V) = 10⁶ · (total − covered_V) // total

Scale shape: per-batch token-count partials → one narrow token-keyed
hash aggregate (the oov.py combiner) → a max(V)-row takeOrdered
driver merge plus an O(partitions) total-count fold — the curve
itself is |ladder| rows and the full count table never reaches the
driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["oov_curve", "oov_curve_oracle_sql"]

DEFAULT_LADDER = (64, 256, 1024, 4096)


def oov_curve(ds: rd.Dataset, *, text_col: str = "text",
              ladder: tuple = DEFAULT_LADDER,
              num_partitions: int | None = None) -> rd.Dataset:
    """(vocab_size, n_vocab, covered, oov_ppm) per ladder point."""
    from ..stages.hashagg import hash_aggregate
    from .ann import _take_ordered
    from .fold import bounded_fold_tables
    from .oov import _flat_tokens

    def narrow(t: pa.Table) -> pa.Table:
        vals, _ = _flat_tokens(t.column(text_col))
        tok, cnt = np.unique(vals, return_counts=True)
        return pa.table({"token": pa.array(tok.tolist(), pa.string()),
                         "c": pa.array(cnt, pa.int64())})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("token", as_index=False).agg(c=("c", "sum"))

    counts = hash_aggregate(
        ds.select_columns([text_col])
          .map_batches(narrow, batch_format="pyarrow"),
        ["token"], combine, num_partitions=num_partitions) \
        .materialize()

    vmax = max(ladder)
    empty = pa.table({"token": pa.array([], pa.string()),
                      "c": pa.array([], pa.int64())})
    top_tab = pa.concat_tables(
        b for b in ray.get(
            _take_ordered(counts,
                          [("c", "descending"),
                           ("token", "ascending")],
                          vmax, empty).to_arrow_refs())
        if b.num_columns)
    # totals: per-block (n_distinct, token_sum) partials, driver fold
    def totals(t: pa.Table) -> pa.Table:
        if not t.num_rows or "c" not in t.schema.names:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        if "n" in t.schema.names:            # pre-merge re-combine
            import pyarrow.compute as pc
            return pa.table({
                "n": pa.array([pc.sum(t.column("n")).as_py() or 0],
                              pa.int64()),
                "s": pa.array([pc.sum(t.column("s")).as_py() or 0],
                              pa.int64())})
        import pyarrow.compute as pc
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "s": pa.array([pc.sum(t.column("c")).as_py() or 0],
                          pa.int64())})

    tabs = [t for t in bounded_fold_tables(
        counts.map_batches(totals, batch_format="pyarrow"), totals)
        if t.num_rows]
    empty_out = pa.table({
        "vocab_size": pa.array([], pa.int64()),
        "n_vocab": pa.array([], pa.int64()),
        "covered": pa.array([], pa.int64()),
        "oov_ppm": pa.array([], pa.int64())})
    if not tabs:
        return rd.from_arrow(empty_out)
    merged = pa.concat_tables(tabs)
    n_distinct = int(pa.compute.sum(merged.column("n")).as_py() or 0)
    total = int(pa.compute.sum(merged.column("s")).as_py() or 0)
    if total == 0:
        return rd.from_arrow(empty_out)

    # the top-vmax table, globally ordered; cumulative coverage
    idx = pa.compute.sort_indices(
        top_tab, sort_keys=[("c", "descending"),
                            ("token", "ascending")])
    cs = np.cumsum(np.asarray(top_tab.take(idx).column("c"),
                              dtype=np.int64))
    out_v, out_n, out_cov = [], [], []
    for v in ladder:
        k = min(v, len(cs))
        cov = int(cs[k - 1]) if k else 0
        out_v.append(v)
        out_n.append(min(v, n_distinct))
        out_cov.append(cov)
    vv = np.asarray(out_v, dtype=np.int64)
    cov = np.asarray(out_cov, dtype=np.int64)
    return rd.from_arrow(pa.table({
        "vocab_size": pa.array(vv, pa.int64()),
        "n_vocab": pa.array(np.asarray(out_n, np.int64), pa.int64()),
        "covered": pa.array(cov, pa.int64()),
        "oov_ppm": pa.array((1_000_000 * (total - cov)) // total,
                            pa.int64())}))


def oov_curve_oracle_sql(docs_cte: str, *, text_col: str = "text",
                         ladder: tuple = DEFAULT_LADDER) -> str:
    vals = ", ".join(f"({v})" for v in ladder)
    return f"""
        WITH toks AS MATERIALIZED (
          SELECT list_filter(string_split({text_col}, ' '),
                             x -> x <> '') AS ts
          FROM ({docs_cte})),
        flat AS MATERIALIZED (
          SELECT ts[i] AS token
          FROM toks, LATERAL unnest(generate_series(
                 1, greatest(len(ts), 0))) t(i)),
        counts AS MATERIALIZED (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS c
          FROM flat GROUP BY token),
        ranked AS MATERIALIZED (
          SELECT c, ROW_NUMBER() OVER
                 (ORDER BY c DESC, token) AS r
          FROM counts),
        tot AS MATERIALIZED (
          SELECT CAST(SUM(c) AS BIGINT) AS t,
                 CAST(COUNT(*) AS BIGINT) AS nd
          FROM counts)
        SELECT CAST(v.vocab_size AS BIGINT) AS vocab_size,
               CAST(LEAST(v.vocab_size, tot.nd) AS BIGINT) AS n_vocab,
               CAST(COALESCE((SELECT SUM(c) FROM ranked
                              WHERE r <= v.vocab_size), 0) AS BIGINT)
                   AS covered,
               CAST((1000000 * (tot.t
                     - COALESCE((SELECT SUM(c) FROM ranked
                                 WHERE r <= v.vocab_size), 0)))
                    // tot.t AS BIGINT) AS oov_ppm
        FROM (VALUES {vals}) v(vocab_size) CROSS JOIN tot
        WHERE tot.t > 0"""
