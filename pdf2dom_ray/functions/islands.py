"""Gaps-and-islands: maximal consecutive-activity runs per key.

The classic SQL interview problem is a real crawl/engagement
primitive: "how many unbroken streaks of hourly activity does this
user/host have, and how long is the longest?" drives churn scoring
and crawl-freshness SLAs alike. Islands over the DISTINCT active
hours of a key:

    island boundary  ⇔  hour − prev_hour > 1
    (user, n_active_hours, n_islands, longest_island)   all int64.

The SQL twin is the canonical hour − DENSE_RANK() grouping-constant
trick; the Ray side never sorts globally — one hash exchange on the
key co-locates each key's narrow (key, hour) rows and a single
vectorized pandas pass per partition (sort inside the partition,
boundary flags via diff, run lengths via cumsum segmentation) does
every key at once, the sessionize.py shape."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["activity_islands", "islands_oracle_sql"]

_HOUR_US = 3_600_000_000


def activity_islands(ds: rd.Dataset, *, key_col: str = "user_id",
                     ts_col: str = "ts",
                     num_partitions: int | None = None
                     ) -> rd.Dataset:
    """(key, n_active_hours, n_islands, longest_island) per key over
    the distinct epoch-hours of its events."""
    if num_partitions is None:
        from ..scale import scale_partitions
        num_partitions = scale_partitions()
    sch = ds.schema()
    kt = dict(zip(sch.names, sch.types))[key_col]
    key_t = kt if isinstance(kt, pa.DataType) else pa.string()

    def partial(t: pa.Table) -> pa.Table:
        hour = t.column(ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy() // _HOUR_US
        df = pd.DataFrame({
            "key": np.asarray(t.column(key_col).to_pandas(),
                              dtype=object),
            "hour": hour}).drop_duplicates()
        h = pd.util.hash_pandas_object(df["key"], index=False)
        return pa.table({
            "key": pa.array(df["key"].tolist(), key_t),
            "hour": pa.array(df["hour"].to_numpy(np.int64),
                             pa.int64()),
            "__part": pa.array((h % num_partitions).to_numpy()
                               .astype(np.int64), pa.int64())})

    def islands(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({
            "key": pa.array([], key_t),
            "n_active_hours": pa.array([], pa.int64()),
            "n_islands": pa.array([], pa.int64()),
            "longest_island": pa.array([], pa.int64())})
        if not len(g):
            return empty
        g = g.drop_duplicates(["key", "hour"]) \
            .sort_values(["key", "hour"], kind="mergesort")
        k = np.asarray(g["key"], dtype=object)
        h = g["hour"].to_numpy(np.int64)
        n = len(g)
        new_key = np.empty(n, dtype=bool)
        new_key[:1] = True
        new_key[1:] = k[1:] != k[:-1]
        boundary = new_key.copy()
        boundary[1:] |= (h[1:] - h[:-1]) > 1
        isl = np.cumsum(boundary) - 1          # island index
        isl_len = np.bincount(isl)             # length per island
        key_of_isl = k[boundary]
        out = pd.DataFrame({
            "key": key_of_isl,
            "len": isl_len}).groupby("key", as_index=False).agg(
            n_active_hours=("len", "sum"),
            n_islands=("len", "size"),
            longest_island=("len", "max"))
        return pa.table({
            "key": pa.array(out["key"].tolist(), key_t),
            "n_active_hours": pa.array(
                out["n_active_hours"].to_numpy(np.int64),
                pa.int64()),
            "n_islands": pa.array(
                out["n_islands"].to_numpy(np.int64), pa.int64()),
            "longest_island": pa.array(
                out["longest_island"].to_numpy(np.int64),
                pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__part").map_groups(islands, batch_format="pandas")


def islands_oracle_sql(rows_cte: str, *, key_col: str = "user_id",
                       ts_col: str = "ts") -> str:
    """The canonical hour − DENSE_RANK() islands grouping."""
    return f"""
        WITH h AS MATERIALIZED (
            SELECT DISTINCT {key_col} AS key,
                   CAST(epoch_us({ts_col}) // 3600000000 AS BIGINT)
                       AS hour
            FROM ({rows_cte})),
        grp AS MATERIALIZED (
            SELECT key, hour,
                   hour - DENSE_RANK() OVER (PARTITION BY key
                                             ORDER BY hour) AS isl
            FROM h),
        isl AS MATERIALIZED (
            SELECT key, isl, CAST(count(*) AS BIGINT) AS len
            FROM grp GROUP BY key, isl)
        SELECT key, CAST(SUM(len) AS BIGINT) AS n_active_hours,
               CAST(count(*) AS BIGINT) AS n_islands,
               CAST(MAX(len) AS BIGINT) AS longest_island
        FROM isl GROUP BY key"""
