"""Signup→purchase conversion-delay histogram.

The activation-latency readout growth teams pull weekly: for each
user, time from FIRST ``from_type`` event to the first ``to_type``
event at-or-after it, bucketed in whole days; users who never
convert land in the ``delay_days = −1`` bucket (the funnel's
drop-off mass — reporting it beside the delays keeps the histogram a
partition of the signup cohort).

Scale shape: ONE user-hash exchange (the sessionize/funnel shape);
each partition computes per-user first-event times with two
vectorized groupby-mins and folds to ≤ distinct-delay rows; driver
fold sums O(buckets·partitions) int64 rows. Day arithmetic is
integer microseconds // 86400e6 — bit-exact (CLAUDE.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["conversion_delay_histogram", "conversion_delay_sql"]

_US_PER_DAY = 86_400_000_000


def conversion_delay_histogram(sf_dir: str, *,
                               from_type: str = "signup",
                               to_type: str = "purchase",
                               num_partitions: int | None = None
                               ) -> rd.Dataset:
    """(delay_days, n_users), delay −1 = signed up, never converted
    at-or-after the first signup; sorted by delay_days."""
    if num_partitions is None:
        from ..scale import scale_partitions
        num_partitions = scale_partitions()

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin([from_type, to_type])]
        h = pd.util.hash_pandas_object(df["user_id"], index=False)
        return df.assign(__part=(h % num_partitions)
                         .astype("int64"))

    def per_partition(g: pd.DataFrame) -> pa.Table:
        us = g["ts"].astype("datetime64[us]").astype(np.int64)
        g = pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                          "us": us,
                          "et": g["event_type"].to_numpy()})
        s = g[g["et"] == from_type].groupby("user_id")["us"].min()
        if not len(s):
            return pa.table({"delay_days": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64())})
        p = g[g["et"] == to_type]
        p = p.merge(s.rename("s_us").reset_index(), on="user_id",
                    how="inner")
        p = p[p["us"] >= p["s_us"]]
        first_p = p.groupby("user_id")["us"].min()
        delay = ((first_p - s.loc[first_p.index]) // _US_PER_DAY) \
            .astype(np.int64)
        n_nc = int(len(s) - len(first_p))
        df = pd.DataFrame({"delay_days": delay.to_numpy(),
                           "n_users": np.ones(len(delay),
                                              np.int64)})
        if n_nc:
            df = pd.concat([df, pd.DataFrame(
                {"delay_days": [-1], "n_users": [n_nc]})],
                ignore_index=True)
        return pa.Table.from_pandas(
            df.groupby("delay_days", as_index=False).sum(),
            preserve_index=False)

    parts = (ev.map_batches(tag, batch_format="pandas")
               .groupby("__part")
               .map_groups(per_partition, batch_format="pandas"))

    from .fold import bounded_fold_tables
    tables = bounded_fold_tables(parts)
    if not tables:
        return rd.from_arrow(pa.table({
            "delay_days": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64())}))
    schema = pa.schema([("delay_days", pa.int64()),
                        ("n_users", pa.int64())])
    merged = pa.concat_tables([t.cast(schema) for t in tables]) \
        .to_pandas().groupby("delay_days", as_index=False).sum() \
        .sort_values("delay_days")
    return rd.from_arrow(pa.Table.from_pandas(merged,
                                              preserve_index=False))


def conversion_delay_sql(from_type: str = "signup",
                         to_type: str = "purchase") -> str:
    return f"""
        WITH s AS (
          SELECT user_id, MIN(epoch_us(ts)) AS s_us
          FROM events WHERE event_type = '{from_type}'
          GROUP BY 1),
        p AS (
          SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = '{to_type}'
            AND epoch_us(e.ts) >= s.s_us
          GROUP BY 1),
        d AS (
          SELECT s.user_id,
                 CASE WHEN p.p_us IS NULL THEN -1
                      -- p_us >= s_us: // truncation == floor
                      ELSE (p.p_us - s.s_us) // 86400000000
                 END AS delay_days
          FROM s LEFT JOIN p ON s.user_id = p.user_id)
        SELECT CAST(delay_days AS BIGINT) AS delay_days,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM d GROUP BY 1 ORDER BY 1
    """
