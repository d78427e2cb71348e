"""Exponential time-decayed value scoring (feature-store staple).

Per-user decayed spend: each purchase contributes
``cents >> (age_days // half_life_days)`` — a power-of-two
exponential decay with integer half-life steps, the classic
recency-weighted LTV / engagement feature, kept EXACT (right-shift =
floor division by 2^k, bit-identical in numpy and SQL) instead of
the float ``exp(-λ·age)`` that would be order-dependent under
distributed summation (CLAUDE.md invariant). The shift clamps at 62
(past that a single int64 cent count is zero anyway).

Scale shape: one cheap anchor pass (MAX ts — a column-pruned scan),
then ONE scan folding per-batch (user, decayed_cents, n) int64
partials through the hash-partitioned aggregate; output is
user-cardinality bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["decayed_user_value", "decayed_value_oracle_sql"]

_US_PER_DAY = 86_400_000_000


def decayed_user_value(sf_dir: str, *,
                       event_type: str = "purchase",
                       half_life_days: int = 180,
                       num_partitions: int | None = None
                       ) -> rd.Dataset:
    """(user_id, decayed_cents, raw_cents, n_purchases) per user,
    sorted by user_id; anchor = the max ``event_type`` timestamp."""
    if half_life_days <= 0:
        raise ValueError("half_life_days must be positive")
    if num_partitions is None:
        from ..scale import scale_partitions
        num_partitions = scale_partitions()

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type",
                                  "value"])

    def ts_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == event_type]
        if not len(df):
            return pd.DataFrame({"m": pd.Series([], dtype="int64")})
        us = df["ts"].astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame({"m": [int(us.max())]})

    mx = ev.map_batches(ts_partial,
                        batch_format="pandas").materialize()
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "decayed_cents": pa.array([], pa.int64()),
                      "raw_cents": pa.array([], pa.int64()),
                      "n_purchases": pa.array([], pa.int64())})
    anchor = mx.max("m")
    if anchor is None:
        return rd.from_arrow(empty)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if "decayed_cents" in df.columns:        # merge partials
            return df.groupby("user_id", as_index=False).sum()
        df = df[df["event_type"] == event_type]
        us = df["ts"].astype("datetime64[us]").astype(np.int64) \
            .to_numpy()
        cents = np.floor(df["value"].to_numpy() * 100.0) \
            .astype(np.int64)
        k = np.minimum((anchor - us) // _US_PER_DAY
                       // half_life_days, 62)
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "decayed_cents": cents >> k,
            "raw_cents": cents,
            "n_purchases": np.ones(len(df), np.int64)})
        return out.groupby("user_id", as_index=False).sum()

    from ..stages.hashagg import hash_aggregate
    per_user = hash_aggregate(ev, ["user_id"], partial,
                              num_partitions=num_partitions)

    from .fold import bounded_fold_tables
    tables = bounded_fold_tables(per_user)
    if not tables:
        return rd.from_arrow(empty)
    schema = pa.schema([("user_id", pa.int64()),
                        ("decayed_cents", pa.int64()),
                        ("raw_cents", pa.int64()),
                        ("n_purchases", pa.int64())])
    merged = pa.concat_tables([t.cast(schema) for t in tables]) \
        .to_pandas().groupby("user_id", as_index=False).sum() \
        .sort_values("user_id")
    return rd.from_arrow(pa.Table.from_pandas(merged,
                                              preserve_index=False))


def decayed_value_oracle_sql(event_type: str = "purchase",
                             half_life_days: int = 180) -> str:
    """DuckDB twin: 2^k is exactly representable in a double for
    k ≤ 62, so CAST(power(2, k) AS BIGINT) is exact; all ``//``
    numerators are non-negative (floor == truncation, CLAUDE.md)."""
    return f"""
        WITH p AS (
          SELECT user_id, epoch_us(ts) AS us,
                 CAST(floor(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = '{event_type}'),
        an AS (SELECT MAX(us) AS a FROM p),
        d AS (
          SELECT user_id, cents,
                 LEAST((a - us) // 86400000000
                       // {half_life_days}, 62) AS k
          FROM p, an)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(SUM(cents // CAST(power(2, k) AS BIGINT))
                    AS BIGINT) AS decayed_cents,
               CAST(SUM(cents) AS BIGINT) AS raw_cents,
               CAST(COUNT(*) AS BIGINT) AS n_purchases
        FROM d GROUP BY 1 ORDER BY 1
    """
