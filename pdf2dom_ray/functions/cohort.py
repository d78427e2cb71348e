"""Cohort retention over an event stream.

The product-analytics staple: bucket users by first-seen day (their
cohort), then count how many of each cohort are active N days later.
Data-engine-wise it is the one aggregate family whose *dimension is
derived from the fact table itself* — the cohort assignment must be
computed (per-user min ts) before the main aggregate can run, which
forces either a self-join or a broadcast of the derived dimension.

Scale shape, in order:

1. events reduce to per-batch (user, min_ts) partials → one narrow
   ``groupby(user).min`` builds the first-seen table (rows = users).
2. events independently reduce to per-batch distinct (user, day)
   partials → global distinct via a second narrow groupby. Payload
   columns never shuffle; both exchanges move O(users × active-days)
   int rows.
3. the first-seen table joins back: broadcast probe (``ray.put`` the
   sorted user→cohort arrays, applied map-side) under
   ``broadcast_limit``, else a hash join — users are the one side
   that can outgrow a worker heap at crawl scale.
4. a final tiny groupby (cohort_day, day_offset) counts users.

All outputs are timestamps/int64, so the DuckDB oracle value-hash is
exact (day arithmetic is integer).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

__all__ = ["cohort_retention"]

_DAY_US = 86_400_000_000


def _day_floor_us(ts_us: np.ndarray) -> np.ndarray:
    return (ts_us // _DAY_US) * _DAY_US


def cohort_retention(ds: rd.Dataset, *, user_col: str = "user_id",
                     ts_col: str = "ts",
                     broadcast_limit: int = 5_000_000) -> rd.Dataset:
    """(cohort_day, day_offset, n_users): users active ``day_offset``
    days after their first-seen day, grouped by cohort day."""

    def first_partial(t: pa.Table) -> pa.Table:
        df = t.select([user_col, ts_col]).to_pandas()
        g = df.groupby(user_col, as_index=False)[ts_col].min()
        return pa.Table.from_pandas(g, preserve_index=False)

    def day_partial(t: pa.Table) -> pa.Table:
        df = t.select([user_col, ts_col]).to_pandas()
        us = df[ts_col].astype("datetime64[us]").astype("int64")
        df = pd.DataFrame({user_col: df[user_col],
                           "day_us": _day_floor_us(us.to_numpy())})
        df = df.drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    narrow = ds.select_columns([user_col, ts_col]).materialize()

    first = narrow.map_batches(first_partial, batch_format="pyarrow") \
        .groupby(user_col).aggregate(Min(ts_col, alias_name="first_ts"))
    first = first.materialize()   # consumed by count + collection/join

    active = narrow.map_batches(day_partial, batch_format="pyarrow") \
        .groupby([user_col, "day_us"]).aggregate(Count(alias_name="_n"))

    if first.count() <= broadcast_limit:
        fdf = first.to_pandas()
        users = fdf[user_col].to_numpy(np.int64)
        order = np.argsort(users)
        users = users[order]
        cohort_us = _day_floor_us(
            fdf["first_ts"].astype("datetime64[us]")
            .astype("int64").to_numpy()[order])
        ref = ray.put((users, cohort_us))

        class Attach:
            def __init__(self) -> None:
                self._users, self._cohort = ray.get(ref)

            def __call__(self, t) -> pa.Table:
                t = t if isinstance(t, pa.Table) else \
                    pa.Table.from_pandas(t, preserve_index=False)
                if not t.num_rows or user_col not in t.schema.names:
                    return pa.table({
                        "cohort_us": pa.array([], pa.int64()),
                        "day_us": pa.array([], pa.int64())})
                u = t.column(user_col).to_numpy(zero_copy_only=False)
                idx = np.searchsorted(self._users, u)
                co = self._cohort[idx]   # every active user has a cohort
                return pa.table({
                    "cohort_us": pa.array(co, pa.int64()),
                    "day_us": t.column("day_us").cast(pa.int64())})

        attached = active.map_batches(Attach(),
                                      batch_format="pyarrow")
    else:
        from .dedup import _to_arrow_blocks

        def cohortize(t) -> pa.Table:
            t = t if isinstance(t, pa.Table) else \
                pa.Table.from_pandas(t, preserve_index=False)
            if not t.num_rows or "first_ts" not in t.schema.names:
                return pa.table({
                    user_col: pa.array([], pa.int64()),
                    "cohort_us": pa.array([], pa.int64())})
            us = t.column("first_ts").cast(pa.timestamp("us")) \
                .cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({
                user_col: t.column(user_col).cast(pa.int64()),
                "cohort_us": pa.array(_day_floor_us(us), pa.int64())})

        from ..scale import scale_partitions
        n_part = scale_partitions()
        # repartition BOTH sides: Ray's hash join rejects 0-row input
        # blocks (see CLAUDE.md) and groupby outputs carry them; an
        # even repartition merges empties away (both sides are narrow)
        fmap = first.map_batches(cohortize, batch_format="pyarrow") \
            .repartition(min(n_part, max(1, first.count())))
        act = _to_arrow_blocks(active).materialize()
        act = act.repartition(min(n_part, max(1, act.count())))
        attached = act.join(
            fmap, join_type="inner", num_partitions=n_part,
            on=(user_col,)) \
            .select_columns(["cohort_us", "day_us"])

    agg = attached.groupby(["cohort_us", "day_us"]) \
        .aggregate(Count(alias_name="n_users"))

    def finish(t) -> pa.Table:
        t = t if isinstance(t, pa.Table) else \
            pa.Table.from_pandas(t, preserve_index=False)
        if not t.num_columns:
            return pa.table({
                "cohort_day": pa.array([], pa.timestamp("us")),
                "day_offset": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64())})
        co = t.column("cohort_us").to_numpy(zero_copy_only=False)
        day = t.column("day_us").to_numpy(zero_copy_only=False)
        return pa.table({
            "cohort_day": pa.array(co.astype("datetime64[us]")),
            "day_offset": pa.array((day - co) // _DAY_US, pa.int64()),
            "n_users": t.column("n_users").cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")
