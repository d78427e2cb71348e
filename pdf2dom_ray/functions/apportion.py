"""Crawl-budget apportionment (Hamilton largest-remainder method).

Every polite crawler and every training-mix builder eventually asks:
"split an integer budget of B fetches/documents across K slices
proportionally to their sizes" — and naive floor(B·n_i/N) leaves
units on the table while rounding breaks Σ = B. Hamilton's method
(the largest-remainder apportionment used for legislature seats) is
the standard exact answer:

    base_i = (B · n_i) // N
    rem_i  = (B · n_i) mod N
    the Σbase_i .. B−1 leftover units go to the largest rem_i
    (ties by key ascending — deterministic)

All pure int64 (the CLAUDE.md invariant), Σ quota = B exactly, and
each quota differs from the real proportion by < 1 (the quota rule).
B·n_i < 2^63 bounds apply (B ≤ 1e9 at 1e9-row slices; split the
budget hierarchically past that — apportion to shards, then within).

Distributed shape: one narrow (key, count) groupby with batch
combiners reduces the corpus to K rows; the apportionment itself is
O(K log K) driver arithmetic — K is the number of allocation TARGETS
(hosts, sources), small by definition. Nothing else moves."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["apportion_budget", "apportion_weighted",
           "apportion_oracle_sql", "apportion_weighted_oracle_sql"]


def apportion_budget(ds: rd.Dataset, *, budget: int,
                     key_col: str = "source") -> rd.Dataset:
    """(key, n_rows, quota) with Σ quota = ``budget`` exactly,
    proportional to per-key row counts under Hamilton rounding."""
    from .dedup import _to_arrow_blocks

    def partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "key": np.asarray(t.column(key_col).to_pandas(),
                              dtype=object)}) \
            .groupby("key", as_index=False).size()
        return pa.table({
            "key": pa.array(g["key"].tolist(), pa.string()),
            "c": pa.array(g["size"].to_numpy(np.int64), pa.int64())})

    counts = _to_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby("key").aggregate(Sum("c", alias_name="c"))) \
        .to_pandas()
    if not len(counts):
        return rd.from_arrow(pa.table({
            "key": pa.array([], pa.string()),
            "n_rows": pa.array([], pa.int64()),
            "quota": pa.array([], pa.int64())}))
    counts = counts.sort_values("key").reset_index(drop=True)
    n = counts["c"].to_numpy(np.int64)
    total = int(n.sum())
    base = budget * n // total
    rem = budget * n % total
    leftover = budget - int(base.sum())
    # largest remainders win the leftover units; ties by key asc
    order = np.lexsort((np.arange(len(n)), -rem))
    quota = base.copy()
    quota[order[:leftover]] += 1
    return rd.from_arrow(pa.table({
        "key": pa.array(counts["key"].tolist(), pa.string()),
        "n_rows": pa.array(n, pa.int64()),
        "quota": pa.array(quota, pa.int64())}))


def apportion_oracle_sql(rows_cte: str, *, budget: int,
                         key_col: str = "source") -> str:
    """The same Hamilton arithmetic in DuckDB: floor quotas + a
    window rank over (remainder DESC, key ASC) hands out the
    leftover units."""
    return f"""
        WITH rows_in AS MATERIALIZED ({rows_cte}),
        cnt AS MATERIALIZED (
            SELECT {key_col} AS key, CAST(count(*) AS BIGINT) AS c
            FROM rows_in GROUP BY 1),
        tot AS MATERIALIZED (SELECT CAST(SUM(c) AS BIGINT) AS n
                             FROM cnt),
        base AS MATERIALIZED (
            SELECT key, c,
                   ({budget} * c) // tot.n AS base,
                   ({budget} * c) % tot.n AS rem
            FROM cnt CROSS JOIN tot),
        lo AS MATERIALIZED (
            SELECT CAST({budget} - SUM(base) AS BIGINT) AS k
            FROM base)
        SELECT key, c AS n_rows,
               CAST(base + CASE WHEN
                    row_number() OVER (ORDER BY rem DESC, key) <= lo.k
                    THEN 1 ELSE 0 END AS BIGINT) AS quota
        FROM base CROSS JOIN lo"""


def apportion_weighted(weights: rd.Dataset, *, budget: int,
                       key_col: str = "key",
                       weight_col: str = "w") -> rd.Dataset:
    """(key, w, quota) with Σ quota = ``budget``, proportional to the
    given int64 weights under the same Hamilton rounding — the
    building block for Neyman-style allocations where the weight is
    N_h·spread_h rather than a plain count. All-zero weights
    degenerate to a UNIFORM split (Σ quota = budget must hold)."""
    from .dedup import _to_arrow_blocks

    w = _to_arrow_blocks(weights).to_pandas()
    if not len(w):
        return rd.from_arrow(pa.table({
            "key": pa.array([], pa.string()),
            "w": pa.array([], pa.int64()),
            "quota": pa.array([], pa.int64())}))
    w = w.sort_values(key_col).reset_index(drop=True)
    n = w[weight_col].to_numpy(np.int64)
    w_out = n.copy()
    total = int(n.sum())
    if total == 0:                  # degenerate → uniform split
        n = np.ones(len(n), dtype=np.int64)
        total = len(n)
    base = budget * n // total
    rem = budget * n % total
    leftover = budget - int(base.sum())
    order = np.lexsort((np.arange(len(n)), -rem))
    quota = base.copy()
    quota[order[:leftover]] += 1
    return rd.from_arrow(pa.table({
        "key": pa.array(w[key_col].tolist(), pa.string()),
        "w": pa.array(w_out, pa.int64()),
        "quota": pa.array(quota, pa.int64())}))


def apportion_weighted_oracle_sql(weights_cte: str, *,
                                  budget: int) -> str:
    """Hamilton over a (key, w) weight relation (non-degenerate
    Σw > 0 — the SQL twin of the common case; the uniform fallback is
    pytest-locked on the Ray side)."""
    return f"""
        WITH w AS MATERIALIZED ({weights_cte}),
        tot AS MATERIALIZED (SELECT CAST(SUM(w) AS BIGINT) AS n
                             FROM w),
        base AS MATERIALIZED (
            SELECT key, w,
                   ({budget} * w) // tot.n AS base,
                   ({budget} * w) % tot.n AS rem
            FROM w CROSS JOIN tot),
        lo AS MATERIALIZED (
            SELECT CAST({budget} - SUM(base) AS BIGINT) AS k
            FROM base)
        SELECT key, CAST(w AS BIGINT) AS w,
               CAST(base + CASE WHEN
                    row_number() OVER (ORDER BY rem DESC, key) <= lo.k
                    THEN 1 ELSE 0 END AS BIGINT) AS quota
        FROM base CROSS JOIN lo"""
