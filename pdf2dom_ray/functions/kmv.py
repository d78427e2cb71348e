"""Bottom-k (KMV) sampled quantiles — the mergeable quantile sketch.

The quantile member of the repo's mergeable-sketch family (HLL
distinct, CMS counts, Bloom membership, FD covariance): keep the k
rows with the SMALLEST md5 of their id — a bottom-k / K-Minimum-
Values sketch (Bar-Yossef et al. 2002; Cohen & Kaplan 2007). The
bottom-k set is a uniform sample WITHOUT the order-dependence that
makes GK/KLL/t-digest partition-sensitive: min-k is a pure set
function of the input, so per-batch partials min-merge to the SAME
set under any partitioning, and the sketch's quantile selections
hash-match a DuckDB ``ORDER BY md5 LIMIT k`` twin exactly. (The
trade: fixed-k accuracy is ~1/√k, the classic sketches' ε-space is
better — the repo keeps EXACT distributed percentiles for when the
full pass is affordable; this is the one-pass mergeable path.)

Scale shape: per-batch bottom-k partial (vectorized md5 over the id
column, argpartition), driver fold of O(k·blocks) rows re-taking the
global bottom-k, then lower-index selections on the ≤k-row sample.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["kmv_quantiles", "kmv_oracle_sql",
           "grouped_kmv_quantiles", "grouped_kmv_oracle_sql"]

_PCTS = (25, 50, 75, 90)


def _md5_hex(ids: np.ndarray) -> np.ndarray:
    return np.array([hashlib.md5(str(i).encode()).hexdigest()
                     for i in ids.tolist()], dtype=object)


def kmv_quantiles(sf_dir: str, *, k: int = 256,
                  pcts=_PCTS) -> rd.Dataset:
    """(pct, value_cents) quantiles of events.value over the
    bottom-k md5(event_id) sample; selection index ⌈p·n/100⌉ (1-based
    lower selection) on the sorted sample."""
    if k <= 0:
        raise ValueError("k must be positive")
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("event_id"), dtype=np.int64)
        cents = np.floor(np.asarray(t.column("value"),
                                    dtype=np.float64) * 100.0) \
            .astype(np.int64)
        h = _md5_hex(ids)
        if len(h) > k:
            keep = np.argsort(h, kind="stable")[:k]
            h, cents = h[keep], cents[keep]
        return pa.table({"h": pa.array(h.tolist(), pa.string()),
                         "cents": pa.array(cents, pa.int64())})

    def fold_block(t: pa.Table) -> pa.Table:
        h = np.asarray(t.column("h"), dtype=object)
        cents = t.column("cents").to_numpy()
        if len(h) > k:
            keep = np.argsort(h, kind="stable")[:k]
            h, cents = h[keep], cents[keep]
        return pa.table({"h": pa.array(h.tolist(), pa.string()),
                         "cents": pa.array(cents, pa.int64())})

    from .fold import bounded_fold_tables
    tables = bounded_fold_tables(
        ds.map_batches(partial, batch_format="pyarrow"), fold_block)
    if not tables:
        return rd.from_arrow(pa.table({
            "pct": pa.array([], pa.int64()),
            "value_cents": pa.array([], pa.int64())}))
    merged = pa.concat_tables(tables)
    h = np.asarray(merged.column("h"), dtype=object)
    cents = merged.column("cents").to_numpy()
    keep = np.argsort(h, kind="stable")[:k]
    sample = np.sort(cents[keep])
    n = len(sample)
    rows_p, rows_v = [], []
    for p in pcts:
        idx = max((p * n + 99) // 100, 1)    # ceil, 1-based
        rows_p.append(int(p))
        rows_v.append(int(sample[idx - 1]))
    return rd.from_arrow(pa.table({
        "pct": pa.array(rows_p, pa.int64()),
        "value_cents": pa.array(rows_v, pa.int64())}))


def kmv_oracle_sql(k: int = 256, pcts=_PCTS) -> str:
    legs = " UNION ALL ".join(f"SELECT {p} AS pct" for p in pcts)
    return f"""
        WITH sample AS (
          SELECT CAST(floor(value * 100) AS BIGINT) AS cents
          FROM events
          ORDER BY md5(CAST(event_id AS VARCHAR)) LIMIT {k}),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sample),
        ranked AS (
          SELECT cents, row_number() OVER (ORDER BY cents) AS r
          FROM sample),
        ps AS ({legs})
        SELECT CAST(ps.pct AS BIGINT) AS pct,
               CAST(ranked.cents AS BIGINT) AS value_cents
        FROM ps, n
        JOIN ranked
          ON ranked.r = GREATEST((ps.pct * n.n + 99) // 100, 1)
        ORDER BY 1
    """


def grouped_kmv_quantiles(sf_dir: str, *, k: int = 128,
                          group_col: str = "event_type",
                          pcts=_PCTS) -> rd.Dataset:
    """(group, pct, value_cents): the bottom-k sketch kept PER GROUP
    — one narrow (group, hash, cents) exchange-free fold; per-batch
    partials keep each group's local bottom-k so the driver fold is
    ≤ groups·k·blocks rows and the final per-group min-k set is the
    same pure set function as the global sketch."""
    if k <= 0:
        raise ValueError("k must be positive")
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", group_col, "value"])

    def bottom_k(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("h", kind="mergesort") \
            .groupby("grp", sort=False).head(k)

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("event_id"), dtype=np.int64)
        cents = np.floor(np.asarray(t.column("value"),
                                    dtype=np.float64) * 100.0) \
            .astype(np.int64)
        df = pd.DataFrame({
            "grp": np.asarray(t.column(group_col), dtype=object),
            "h": _md5_hex(ids), "cents": cents})
        return pa.Table.from_pandas(bottom_k(df),
                                    preserve_index=False)

    def fold_block(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(bottom_k(t.to_pandas()),
                                    preserve_index=False)

    from .fold import bounded_fold_tables
    tables = bounded_fold_tables(
        ds.map_batches(partial, batch_format="pyarrow"), fold_block)
    if not tables:
        return rd.from_arrow(pa.table({
            "event_type": pa.array([], pa.string()),
            "pct": pa.array([], pa.int64()),
            "value_cents": pa.array([], pa.int64())}))
    schema = pa.schema([("grp", pa.string()), ("h", pa.string()),
                        ("cents", pa.int64())])
    merged = bottom_k(pa.concat_tables(
        [t.cast(schema) for t in tables]).to_pandas())
    rows_g, rows_p, rows_v = [], [], []
    for grp, sub in merged.groupby("grp", sort=True):
        sample = np.sort(sub["cents"].to_numpy(np.int64))
        n = len(sample)
        for p in pcts:
            idx = max((p * n + 99) // 100, 1)
            rows_g.append(grp)
            rows_p.append(int(p))
            rows_v.append(int(sample[idx - 1]))
    return rd.from_arrow(pa.table({
        "event_type": pa.array(rows_g, pa.string()),
        "pct": pa.array(rows_p, pa.int64()),
        "value_cents": pa.array(rows_v, pa.int64())}))


def grouped_kmv_oracle_sql(k: int = 128,
                           group_col: str = "event_type",
                           pcts=_PCTS) -> str:
    legs = " UNION ALL ".join(f"SELECT {p} AS pct" for p in pcts)
    return f"""
        WITH sample AS (
          SELECT {group_col} AS grp,
                 CAST(floor(value * 100) AS BIGINT) AS cents
          FROM events
          QUALIFY row_number() OVER (
              PARTITION BY {group_col}
              ORDER BY md5(CAST(event_id AS VARCHAR))) <= {k}),
        n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n
              FROM sample GROUP BY 1),
        ranked AS (
          SELECT grp, cents,
                 row_number() OVER (PARTITION BY grp
                                    ORDER BY cents) AS r
          FROM sample),
        ps AS ({legs})
        SELECT ranked.grp AS event_type,
               CAST(ps.pct AS BIGINT) AS pct,
               CAST(ranked.cents AS BIGINT) AS value_cents
        FROM ps
        JOIN n ON TRUE
        JOIN ranked
          ON ranked.grp = n.grp
         AND ranked.r = GREATEST((ps.pct * n.n + 99) // 100, 1)
        ORDER BY 1, 2
    """
