"""Last-touch marketing attribution over the events stream.

The classic attribution query (the "conversion path" family every
analytics warehouse runs): each ``conversion_type`` event's value is
credited to the same user's most recent STRICTLY-PRIOR
``touch_type`` event — here rolled up by the touch's hour-of-day,
answering "which click hours drive purchase revenue".

Scale shape (the repo's one-shuffle as-of pattern,
``functions/temporal.py``): both sides derive from one column-pruned
events scan, tag ``part = hash(user) % P``, ONE
``groupby(part).map_groups`` exchange, then a vectorized
``pd.merge_asof`` per partition — one Python call per partition,
never per user. The hour rollup is ≤24 rows: per-partition integer
partials + a driver fold. Value is int64 cents
(``floor(value·100)``) so the result is bit-exact under any
partitioning (CLAUDE.md invariant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["last_touch_attribution", "last_touch_oracle_sql"]


def last_touch_attribution(sf_dir: str, *,
                           conversion_type: str = "purchase",
                           touch_type: str = "click",
                           num_partitions: int | None = None
                           ) -> rd.Dataset:
    """(click_hour, attributed_cents, n_purchases) — conversions with
    no prior touch are dropped (inner as-of), sorted by hour."""
    from .temporal import _part_of
    if num_partitions is None:
        from ..scale import scale_partitions
        num_partitions = scale_partitions()

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "user_id", "ts",
                                      "event_type", "value"])

    # one uniform Arrow schema for the union (CLAUDE.md groupby rule):
    # key | t | cents (conversions; -1 on touches) | touch_id | part
    def tag(df: pd.DataFrame) -> pa.Table:
        conv = df[df["event_type"] == conversion_type]
        touch = df[df["event_type"] == touch_type]
        cents = np.floor(conv["value"].to_numpy() * 100.0) \
            .astype(np.int64)
        return pa.table({
            "key": pa.array(np.concatenate(
                [conv["user_id"].to_numpy(np.int64),
                 touch["user_id"].to_numpy(np.int64)])),
            "t": pa.array(pd.concat([conv["ts"], touch["ts"]])
                          .astype("datetime64[us]")),
            "cents": pa.array(np.concatenate(
                [cents, np.full(len(touch), -1, np.int64)])),
            "touch_id": pa.array(np.concatenate(
                [np.full(len(conv), -1, np.int64),
                 touch["event_id"].to_numpy(np.int64)])),
            "__part": pa.array(np.concatenate(
                [_part_of(conv["user_id"], num_partitions),
                 _part_of(touch["user_id"], num_partitions)])),
        })

    both = events.map_batches(tag, batch_format="pandas")

    def per_partition(g: pd.DataFrame) -> pa.Table:
        conv = g[g["cents"] >= 0]
        touch = g[g["cents"] < 0]
        empty = pa.table({
            "click_hour": pa.array([], pa.int64()),
            "attributed_cents": pa.array([], pa.int64()),
            "n_purchases": pa.array([], pa.int64())})
        if not len(conv) or not len(touch):
            return empty
        conv = conv.sort_values("t", kind="mergesort")
        touch = touch.sort_values(["t", "touch_id"],
                                  kind="mergesort")
        m = pd.merge_asof(
            conv[["key", "t", "cents"]],
            touch[["key", "t"]].rename(columns={"t": "touch_ts"}),
            left_on="t", right_on="touch_ts", by="key",
            direction="backward", allow_exact_matches=False)
        m = m.dropna(subset=["touch_ts"])
        if not len(m):
            return empty
        hour = m["touch_ts"].dt.hour.to_numpy(np.int64)
        df = pd.DataFrame({
            "click_hour": hour,
            "attributed_cents": m["cents"].to_numpy(np.int64),
            "n_purchases": np.ones(len(m), np.int64)})
        agg = df.groupby("click_hour", as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = both.groupby("__part").map_groups(per_partition,
                                              batch_format="pandas")

    from .fold import bounded_fold_tables
    tables = bounded_fold_tables(parts)
    if not tables:
        return rd.from_arrow(pa.table({
            "click_hour": pa.array([], pa.int64()),
            "attributed_cents": pa.array([], pa.int64()),
            "n_purchases": pa.array([], pa.int64())}))
    schema = pa.schema([("click_hour", pa.int64()),
                        ("attributed_cents", pa.int64()),
                        ("n_purchases", pa.int64())])
    merged = pa.concat_tables([t.cast(schema) for t in tables]) \
        .to_pandas().groupby("click_hour", as_index=False).sum() \
        .sort_values("click_hour")
    return rd.from_arrow(pa.Table.from_pandas(merged,
                                              preserve_index=False))


def last_touch_oracle_sql(conversion_type: str = "purchase",
                          touch_type: str = "click") -> str:
    """DuckDB twin: per-conversion MAX prior touch ts via a
    correlated aggregate (quadratic per user — oracle-scale only)."""
    return f"""
        WITH conv AS (
          SELECT event_id, user_id, ts,
                 CAST(floor(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = '{conversion_type}'),
        touch AS (
          SELECT user_id, ts AS tts FROM events
          WHERE event_type = '{touch_type}'),
        j AS (
          SELECT conv.event_id, conv.cents,
                 MAX(touch.tts) AS touch_ts
          FROM conv JOIN touch
            ON conv.user_id = touch.user_id
           AND touch.tts < conv.ts
          GROUP BY 1, 2)
        SELECT CAST(hour(touch_ts) AS BIGINT) AS click_hour,
               CAST(SUM(cents) AS BIGINT) AS attributed_cents,
               CAST(COUNT(*) AS BIGINT) AS n_purchases
        FROM j GROUP BY 1 ORDER BY 1
    """
