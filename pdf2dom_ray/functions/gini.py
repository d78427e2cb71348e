"""Per-group Gini coefficient (exact integer rank-sum form).

The inequality screen for corpus composition: a high length-Gini in
a source means a few giant documents carry most of its mass (crawl
dumps with concatenated boilerplate), a low one means uniform
shards. Computed exactly from the grouped VALUE HISTOGRAM via the
rank-sum identity G = Σᵢ(2i−n−1)·x₍ᵢ₎ / (n·Σx): a value v with
count m occupying ranks (t, t+m] contributes v·m·(2t+m−n), so the
whole statistic folds from (group, value, count) rows — no sort of
raw rows, ties exact by construction. Output gini_ppm =
10⁶·num // (n·Σx) (numerator ≥ 0 — floor == truncation, CLAUDE.md).

Scale shape: per-batch (group, value, count) partials → one narrow
histogram groupby → per-group driver fold over distinct values
(O(groups·distinct) rows), the robust.py shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["group_gini", "gini_oracle_sql"]


def group_gini(ds: rd.Dataset, *, key_col: str = "source",
               value_col: str = "n_chars") -> rd.Dataset:
    """(key, n_rows, total, gini_ppm) per group, sorted by key."""
    from .dedup import _to_arrow_blocks

    def partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "key": np.asarray(t.column(key_col).to_pandas(),
                              dtype=object),
            "v": t.column(value_col).to_numpy()}) \
            .groupby(["key", "v"], as_index=False).size()
        return pa.table({
            "key": pa.array(g["key"].tolist(), pa.string()),
            "v": pa.array(g["v"].to_numpy(np.int64), pa.int64()),
            "c": pa.array(g["size"].to_numpy(np.int64), pa.int64())})

    hist = _to_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["key", "v"])
          .aggregate(Sum("c", alias_name="c"))).to_pandas()
    out = {"key": [], "n_rows": [], "total": [], "gini_ppm": []}
    if len(hist):
        hist = hist.sort_values(["key", "v"])
        for key, g in hist.groupby("key", sort=True):
            v = g["v"].to_numpy(np.int64)
            c = g["c"].to_numpy(np.int64)
            n = int(c.sum())
            tot = int((v * c).sum())
            t = np.concatenate([[0], np.cumsum(c)[:-1]])
            num = int((v * c * (2 * t + c - n)).sum())
            out["key"].append(key)
            out["n_rows"].append(n)
            out["total"].append(tot)
            out["gini_ppm"].append(
                (1_000_000 * num) // (n * tot) if tot else 0)
    return rd.from_arrow(pa.table({
        "key": pa.array(out["key"], pa.string()),
        "n_rows": pa.array(out["n_rows"], pa.int64()),
        "total": pa.array(out["total"], pa.int64()),
        "gini_ppm": pa.array(out["gini_ppm"], pa.int64())}))


def gini_oracle_sql(rows_cte: str, *, key_col: str = "source",
                    value_col: str = "n_chars") -> str:
    return f"""
        WITH m AS MATERIALIZED (
            SELECT {key_col} AS key, CAST({value_col} AS BIGINT) AS v
            FROM ({rows_cte})),
        h AS MATERIALIZED (
            SELECT key, v, CAST(count(*) AS BIGINT) AS c
            FROM m GROUP BY 1, 2),
        w AS MATERIALIZED (
            SELECT key, v, c,
                   CAST(COALESCE(SUM(c) OVER (
                       PARTITION BY key ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS t,
                   CAST(SUM(c) OVER (PARTITION BY key) AS BIGINT)
                       AS n
            FROM h),
        agg AS (
            SELECT key, MAX(n) AS n_rows,
                   CAST(SUM(v * c) AS BIGINT) AS total,
                   CAST(SUM(v * c * (2 * t + c - n)) AS BIGINT)
                       AS num
            FROM w GROUP BY 1)
        SELECT key, n_rows, total,
               CAST(CASE WHEN total = 0 THEN 0
                    ELSE (1000000 * num) // (n_rows * total) END
                    AS BIGINT) AS gini_ppm
        FROM agg ORDER BY 1
    """
