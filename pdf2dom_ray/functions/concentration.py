"""Per-slice categorical concentration (exact-integer HHI).

"Is this source really one thing?" — a web source whose documents
scatter across many languages (or hosts, or templates) is usually a
scraper artifact; one dominated by a single category is coherent.
The Herfindahl–Hirschman index over the category shares,

    HHI = Σ_c (n_c / N)²     ∈ (0, 1],  1 = single category

is the concentration number competition economists and corpus
curators both use — and unlike entropy it is RATIONAL: over the
common denominator N² it is one floor division,

    hhi_ppm = (1e6 · Σ_c n_c²) // N²

pure int64 end to end (the CLAUDE.md invariant; entropy's logs would
flake the value hash). Σn_c² ≤ N² needs N ≲ 3e9 rows per slice for
the 1e6 product; quantize (count in thousands) past that.

Distributed shape: per-batch (key, category) count combiners → ONE
narrow (key, category) groupby → per-batch per-key partial
(Σc², N, n_cats) rows → one tiny key groupby → ppm attach. Nothing
wider than the distinct (key, category) universe ever moves."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["categorical_concentration", "concentration_oracle_sql"]


def categorical_concentration(ds: rd.Dataset, *,
                              key_col: str = "source",
                              cat_col: str = "lang") -> rd.Dataset:
    """(key, n_cats, n_rows, hhi_ppm) per ``key_col`` slice: the HHI
    concentration of its ``cat_col`` distribution."""
    from .dedup import _to_arrow_blocks

    def partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "key": np.asarray(t.column(key_col).to_pandas(),
                              dtype=object),
            "cat": np.asarray(t.column(cat_col).to_pandas(),
                              dtype=object)}) \
            .groupby(["key", "cat"], as_index=False).size()
        return pa.table({
            "key": pa.array(g["key"].tolist(), pa.string()),
            "cat": pa.array(g["cat"].tolist(), pa.string()),
            "c": pa.array(g["size"].to_numpy(np.int64), pa.int64())})

    counts = _to_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["key", "cat"])
          .aggregate(Sum("c", alias_name="c")))

    def per_key(t: pa.Table) -> pa.Table:
        if not t.num_columns or not t.num_rows:
            return pa.table({"key": pa.array([], pa.string()),
                             "sq": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "n_cats": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "key": np.asarray(t.column("key").to_pandas(),
                              dtype=object),
            "c": t.column("c").to_numpy()})
        df["sq"] = df["c"] * df["c"]
        g = df.groupby("key", as_index=False).agg(
            sq=("sq", "sum"), n=("c", "sum"), n_cats=("c", "size"))
        return pa.table({
            "key": pa.array(g["key"].tolist(), pa.string()),
            "sq": pa.array(g["sq"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "n_cats": pa.array(g["n_cats"].to_numpy(np.int64),
                               pa.int64())})

    agg = _to_arrow_blocks(
        counts.map_batches(per_key, batch_format="pyarrow")
              .groupby("key")
              .aggregate(Sum("sq", alias_name="sq"),
                         Sum("n", alias_name="n"),
                         Sum("n_cats", alias_name="n_cats")))

    def finish(t: pa.Table) -> pa.Table:
        if not t.num_columns:
            return pa.table({
                "key": pa.array([], pa.string()),
                "n_cats": pa.array([], pa.int64()),
                "n_rows": pa.array([], pa.int64()),
                "hhi_ppm": pa.array([], pa.int64())})
        sq = t.column("sq").to_numpy()
        n = t.column("n").to_numpy()
        return pa.table({
            "key": t.column("key"),
            "n_cats": pa.array(t.column("n_cats").to_numpy(),
                               pa.int64()),
            "n_rows": pa.array(n, pa.int64()),
            "hhi_ppm": pa.array(1_000_000 * sq // (n * n),
                                pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def concentration_oracle_sql(rows_cte: str, *,
                             key_col: str = "source",
                             cat_col: str = "lang") -> str:
    """The same integer HHI in DuckDB."""
    return f"""
        WITH rows_in AS MATERIALIZED ({rows_cte}),
        cnt AS MATERIALIZED (
            SELECT {key_col} AS key, {cat_col} AS cat,
                   CAST(count(*) AS BIGINT) AS c
            FROM rows_in GROUP BY 1, 2)
        SELECT key, CAST(count(*) AS BIGINT) AS n_cats,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST((1000000 * SUM(c * c)) // (SUM(c) * SUM(c))
                    AS BIGINT) AS hhi_ppm
        FROM cnt GROUP BY key"""
