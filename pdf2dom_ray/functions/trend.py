"""Grouped OLS trend moments (exact-integer per-key regression
components).

"Is this event type / host / source trending up?" is the monitoring
question behind crawl-health dashboards and data-mix drift alerts.
The OLS slope over a key's (hour, count) series,

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

is a ratio of INTEGER moments when x is the epoch-hour index and y an
event count — so the operator emits the five exact moments
(n, sx, sy, sxy, sxx) per key and leaves the one division post-hoc
(the CLAUDE.md integer rule; a distributed float slope would flake
the hash). Hours are REBASED per key (x ← hour − min hour of the key)
to keep Σx² small — both sides of the oracle apply the identical
rebase, and the slope is translation-invariant anyway. Hours with
zero events are absent from the series (documented; the SQL twin
shares the convention). Σx² ≤ n·span²: a decade-long hourly series is
n ≈ 9e4, span² ≈ 8e9 — far inside int64.

Distributed shape: per-batch (key, hour) count combiners → ONE
narrow groupby finishes the hourly series → per-batch per-key moment
partials (needs the per-key min hour: a second tiny groupby,
broadcast as sorted arrays) → one tiny key groupby sums the moments.
Nothing wider than the distinct (key, hour) universe ever moves."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum

__all__ = ["grouped_trend", "trend_oracle_sql"]

_HOUR_US = 3_600_000_000


def grouped_trend(ds: rd.Dataset, *, key_col: str = "event_type",
                  ts_col: str = "ts") -> rd.Dataset:
    """(key, n, sx, sy, sxy, sxx) per key over its (rebased hour,
    count) series — slope = (n·sxy − sx·sy)/(n·sxx − sx²) post-hoc."""
    from .dedup import _to_arrow_blocks

    def partial(t: pa.Table) -> pa.Table:
        # normalize the unit first: parquet carries timestamp[us],
        # from_items timestamp[s] — a bare int64 cast would be
        # unit-dependent
        hour = t.column(ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy() // _HOUR_US
        g = pd.DataFrame({
            "key": np.asarray(t.column(key_col).to_pandas(),
                              dtype=object),
            "hour": hour}).groupby(["key", "hour"],
                                   as_index=False).size()
        return pa.table({
            "key": pa.array(g["key"].tolist(), pa.string()),
            "hour": pa.array(g["hour"].to_numpy(np.int64),
                             pa.int64()),
            "c": pa.array(g["size"].to_numpy(np.int64), pa.int64())})

    series = _to_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["key", "hour"])
          .aggregate(Sum("c", alias_name="c"))).materialize()
    if series.count() == 0:
        return rd.from_arrow(pa.table({
            "key": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "sx": pa.array([], pa.int64()),
            "sy": pa.array([], pa.int64()),
            "sxy": pa.array([], pa.int64()),
            "sxx": pa.array([], pa.int64())}))

    mins = _to_arrow_blocks(
        series.groupby("key").aggregate(Min("hour",
                                            alias_name="h0"))) \
        .to_pandas().sort_values("key")
    keys_ref = ray.put(np.asarray(mins["key"], dtype=object))
    h0_ref = ray.put(mins["h0"].to_numpy(np.int64))

    def moments(t: pa.Table) -> pa.Table:
        if not t.num_columns or not t.num_rows:
            return pa.table({
                "key": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sx": pa.array([], pa.int64()),
                "sy": pa.array([], pa.int64()),
                "sxy": pa.array([], pa.int64()),
                "sxx": pa.array([], pa.int64())})
        keys = ray.get(keys_ref)
        h0 = ray.get(h0_ref)
        k = np.asarray(t.column("key").to_pandas(), dtype=object)
        x = t.column("hour").to_numpy() \
            - h0[np.searchsorted(keys, k)]
        y = t.column("c").to_numpy()
        g = pd.DataFrame({"key": k, "n": 1, "sx": x, "sy": y,
                          "sxy": x * y, "sxx": x * x}) \
            .groupby("key", as_index=False).sum()
        return pa.table({
            "key": pa.array(g["key"].tolist(), pa.string()),
            **{c: pa.array(g[c].to_numpy(np.int64), pa.int64())
               for c in ("n", "sx", "sy", "sxy", "sxx")}})

    return _to_arrow_blocks(
        series.map_batches(moments, batch_format="pyarrow")
              .groupby("key")
              .aggregate(*[Sum(c, alias_name=c)
                           for c in ("n", "sx", "sy", "sxy",
                                     "sxx")]))


def trend_oracle_sql(rows_cte: str, *, key_col: str = "event_type",
                     ts_col: str = "ts") -> str:
    """The same rebased integer moments in DuckDB (epoch-hour via
    epoch_us // 3.6e9, per-key MIN rebase)."""
    return f"""
        WITH rows_in AS MATERIALIZED ({rows_cte}),
        series AS MATERIALIZED (
            SELECT {key_col} AS key,
                   CAST(epoch_us({ts_col}) // 3600000000 AS BIGINT)
                       AS hour,
                   CAST(count(*) AS BIGINT) AS c
            FROM rows_in GROUP BY 1, 2),
        reb AS MATERIALIZED (
            SELECT key,
                   hour - MIN(hour) OVER (PARTITION BY key) AS x,
                   c AS y
            FROM series)
        SELECT key, CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM reb GROUP BY key"""
