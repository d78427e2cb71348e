"""Ordered funnel analysis over the event stream.

"How many users did view → click → purchase, in that order?" — the
classic product-analytics funnel. A user completes step k iff they
have a step-k event STRICTLY after the timestamp at which they
completed step k-1 (earliest-completion semantics: each step binds to
its user's earliest qualifying event, which maximizes downstream
completion and is the standard funnel definition).

Distributed shape: the funnel needs each user's full (filtered)
history in one place → prune to the step event types at the scan,
ONE hash exchange on user_id, then a vectorized per-partition chain
of ``groupby(user).min`` passes — one per step, no per-user Python
loop. Per-step partial counts then sum in a tiny global pass.
Integer outputs → bit-exact against the SQL chain-of-CTEs oracle.

Strict ``ts > prev_ts`` comparison means same-timestamp step events
do NOT satisfy the next step — the same rule the oracle applies, so
ties can't flake the driver's value-hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["funnel_counts"]


def _part_of(s: pd.Series, num_partitions: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(s, index=False)
    return (h % num_partitions).astype("int64").to_numpy()


def funnel_counts(events: rd.Dataset, steps: tuple[str, ...], *,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  num_partitions: int | None = None) -> rd.Dataset:
    """(step, step_name, n_users): users completing each funnel prefix.

    ``events`` needs (user_col, ts_col, type_col); other columns are
    dropped before the exchange (narrow rows only).
    """
    from ..scale import scale_partitions
    num_partitions = num_partitions or scale_partitions()
    if not steps:
        raise ValueError("funnel needs at least one step")
    step_list = list(steps)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[type_col].isin(step_list)]
        df = df[[user_col, ts_col, type_col]]
        return df.assign(__part=_part_of(df[user_col], num_partitions))

    def per_partition(g: pd.DataFrame) -> pa.Table:
        # chain of groupby-min passes: prev[user] = completion ts of
        # the previous step; step k counts users with a step-k event
        # strictly after prev[user]
        counts = np.zeros(len(step_list), dtype=np.int64)
        prev: pd.Series | None = None
        for k, step in enumerate(step_list):
            sub = g[g[type_col] == step]
            if prev is not None:
                p = sub[user_col].map(prev)
                sub = sub[p.notna() & (sub[ts_col] > p)]
            cur = sub.groupby(user_col)[ts_col].min()
            counts[k] = len(cur)
            if not len(cur):
                break
            prev = cur
        return pa.table({
            "step": pa.array(np.arange(1, len(step_list) + 1), pa.int64()),
            "step_name": pa.array(step_list, pa.string()),
            "n_users": pa.array(counts, pa.int64()),
        })

    parts = (events.select_columns([user_col, ts_col, type_col])
             .map_batches(tag, batch_format="pandas")
             .groupby("__part")
             .map_groups(per_partition, batch_format="pandas"))

    # identity rows: every step appears with n_users ≥ 0 even when no
    # partition emits it (empty input / nobody reaches the funnel)
    zeros = rd.from_arrow(pa.table({
        "step": pa.array(np.arange(1, len(step_list) + 1), pa.int64()),
        "step_name": pa.array(step_list, pa.string()),
        "n_users": pa.array(np.zeros(len(step_list), np.int64),
                            pa.int64())}))
    parts = parts.map_batches(lambda t: t, batch_format="pyarrow") \
        .union(zeros)

    from ray.data.aggregate import Sum

    from .dedup import _to_arrow_blocks

    def finish(t) -> pa.Table:
        t = t if isinstance(t, pa.Table) else \
            pa.Table.from_pandas(t, preserve_index=False)
        if not t.num_columns:
            return pa.table({"step": pa.array([], pa.int64()),
                             "step_name": pa.array([], pa.string()),
                             "n_users": pa.array([], pa.int64())})
        return pa.table({
            "step": t.column("step").cast(pa.int64()),
            "step_name": t.column("step_name"),
            "n_users": t.column("n_users").cast(pa.int64())})

    agg = _to_arrow_blocks(
        parts.groupby(["step", "step_name"])
        .aggregate(Sum("n_users", alias_name="n_users")))
    return agg.map_batches(finish, batch_format="pyarrow")
