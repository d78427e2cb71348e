"""RFM (recency / frequency / monetary) customer segmentation.

The standard CRM scoring: per user with ≥1 ``purchase`` event,
R = whole days since their last purchase (anchored at the corpus'
max purchase timestamp), F = purchase count, M = total purchase
cents; each metric is scored into ``k`` exact NTILE buckets over the
total (value, user_id) order, and the result is the segment census
(r_score, f_score, m_score, n_users) — ≤ k³ rows.

Scale shape: one purchases scan folds to per-user int64 moments via
the combiner → hash-aggregate chain; each metric then reuses the
repo's exact distributed NTILE (``functions/ntile.py`` — histogram
prefix ranks + value-hash partitions, no global sort); the three
score tables re-join on the user hash (``join_ready``-guarded) and
the census is a tiny driver fold. All integers end-to-end — the
census is bit-exact under any partitioning (CLAUDE.md invariant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["rfm_segments", "rfm_oracle_sql"]

_US_PER_DAY = 86_400_000_000


def rfm_segments(sf_dir: str, *, k: int = 5,
                 event_type: str = "purchase",
                 num_partitions: int | None = None,
                 driver_limit: int = 2_000_000) -> rd.Dataset:
    """(r_score, f_score, m_score, n_users) census, sorted.

    Under ``driver_limit`` users the three NTILE scores compute on
    the driver (the per-user table is already the narrow aggregate —
    three argsorts over it beat three distributed NTILE passes by
    their fixed costs; same explicit-limit fast-path convention as
    pagerank/triangles). Past the limit the fully distributed
    NTILE + join path below runs.
    """
    from ..scale import scale_partitions
    num_partitions = num_partitions or scale_partitions()

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type",
                                  "value"])

    def purchase_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == event_type]
        us = df["ts"].astype("datetime64[us]").astype(np.int64)
        cents = np.floor(df["value"].to_numpy() * 100.0) \
            .astype(np.int64)
        out = pd.DataFrame({"user_id": df["user_id"]
                            .to_numpy(np.int64),
                            "last_us": us, "freq": 1, "cents": cents})
        return out.groupby("user_id", as_index=False) \
            .agg(last_us=("last_us", "max"), freq=("freq", "sum"),
                 cents=("cents", "sum"))

    def by_user(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False) \
            .agg(last_us=("last_us", "max"), freq=("freq", "sum"),
                 cents=("cents", "sum"))

    empty = pa.table({"r_score": pa.array([], pa.int64()),
                      "f_score": pa.array([], pa.int64()),
                      "m_score": pa.array([], pa.int64()),
                      "n_users": pa.array([], pa.int64())})
    partials = ev.map_batches(purchase_partial,
                              batch_format="pandas")

    if driver_limit > 0:
        # fast path: per-batch partials fold straight to the driver
        # (ONE Dataset consumption, no exchange) — the per-user table
        # is bounded by the user universe, which driver_limit caps;
        # the >limit distributed NTILE path is below
        def fold_block(t: pa.Table) -> pa.Table:
            return pa.Table.from_pandas(by_user(t.to_pandas()),
                                        preserve_index=False)

        from .fold import bounded_fold_tables
        tables = bounded_fold_tables(partials, fold_block)
        if not tables:
            return rd.from_arrow(empty)
        schema = pa.schema([("user_id", pa.int64()),
                            ("last_us", pa.int64()),
                            ("freq", pa.int64()),
                            ("cents", pa.int64())])
        df = by_user(pa.concat_tables(
            [t.cast(schema) for t in tables]).to_pandas())
        if len(df) > driver_limit:
            raise ValueError(
                f"{len(df)} users exceed driver_limit="
                f"{driver_limit}; use driver_limit=0 for the "
                "distributed path")
        anchor = int(df["last_us"].max())
        df = df.assign(recency_days=(
            anchor - df["last_us"].to_numpy(np.int64))
            // _US_PER_DAY)

        def ntile_driver(vals: np.ndarray, ids: np.ndarray
                         ) -> np.ndarray:
            order = np.lexsort((ids, vals))
            rank0 = np.empty(len(vals), np.int64)
            rank0[order] = np.arange(len(vals))
            q, r = divmod(len(vals), k)
            if q == 0:
                return rank0 + 1
            big = r * (q + 1)
            return np.where(rank0 < big, rank0 // (q + 1) + 1,
                            r + (rank0 - big) // q + 1)

        ids = df["user_id"].to_numpy(np.int64)
        census = pd.DataFrame({
            "r_score": ntile_driver(
                df["recency_days"].to_numpy(np.int64), ids),
            "f_score": ntile_driver(
                df["freq"].to_numpy(np.int64), ids),
            "m_score": ntile_driver(
                df["cents"].to_numpy(np.int64), ids),
            "n_users": np.ones(len(df), np.int64)})             .groupby(["r_score", "f_score", "m_score"],
                     as_index=False).sum()             .sort_values(["r_score", "f_score", "m_score"])
        return rd.from_arrow(pa.Table.from_pandas(
            census, preserve_index=False))

    from ..stages.hashagg import hash_aggregate
    per_user = hash_aggregate(partials, ["user_id"], by_user,
                              num_partitions=num_partitions) \
        .materialize()
    if per_user.count() == 0:
        return rd.from_arrow(empty)
    anchor = per_user.max("last_us")

    def add_recency(t: pa.Table) -> pa.Table:
        rec = (anchor - t.column("last_us").to_numpy()) // _US_PER_DAY
        return t.append_column(
            "recency_days", pa.array(rec.astype(np.int64)))

    per_user = per_user.map_batches(
        add_recency, batch_format="pyarrow").materialize()

    from .dedup import join_ready
    from .ntile import ntile_buckets
    n_users = per_user.count()
    n_part = min(num_partitions, max(1, n_users))

    def score(col: str, out: str) -> rd.Dataset:
        s = ntile_buckets(per_user, value_col=col, id_col="user_id",
                          k=k, num_partitions=num_partitions)

        def narrow(t: pa.Table) -> pa.Table:
            return pa.table({
                "user_id" if out == "r_score" else f"uid_{out}":
                    t.column("user_id").cast(pa.int64()),
                out: t.column("bucket").cast(pa.int64())})

        return s.map_batches(narrow, batch_format="pyarrow")

    r = score("recency_days", "r_score")
    f = score("freq", "f_score")
    m = score("cents", "m_score")
    joined = join_ready(r, n_part).join(
        join_ready(f, n_part), join_type="inner",
        num_partitions=n_part,
        on=("user_id",), right_on=("uid_f_score",))
    joined = join_ready(joined, n_part).join(
        join_ready(m, n_part), join_type="inner",
        num_partitions=n_part,
        on=("user_id",), right_on=("uid_m_score",))

    def census_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"r_score": df["r_score"],
                            "f_score": df["f_score"],
                            "m_score": df["m_score"],
                            "n_users": np.ones(len(df), np.int64)})
        return out.groupby(["r_score", "f_score", "m_score"],
                           as_index=False).sum()

    from .fold import bounded_fold_tables
    parts = joined.map_batches(census_partial, batch_format="pandas")
    tables = bounded_fold_tables(parts)
    if not tables:
        return rd.from_arrow(empty)
    schema = pa.schema([("r_score", pa.int64()),
                        ("f_score", pa.int64()),
                        ("m_score", pa.int64()),
                        ("n_users", pa.int64())])
    merged = pa.concat_tables([t.cast(schema) for t in tables]) \
        .to_pandas() \
        .groupby(["r_score", "f_score", "m_score"],
                 as_index=False).sum() \
        .sort_values(["r_score", "f_score", "m_score"])
    return rd.from_arrow(pa.Table.from_pandas(merged,
                                              preserve_index=False))


def rfm_oracle_sql(k: int = 5,
                   event_type: str = "purchase") -> str:
    return f"""
        WITH pu AS (
          SELECT user_id,
                 MAX(epoch_us(ts)) AS last_us,
                 CAST(COUNT(*) AS BIGINT) AS freq,
                 CAST(SUM(CAST(floor(value * 100) AS BIGINT))
                      AS BIGINT) AS cents
          FROM events WHERE event_type = '{event_type}'
          GROUP BY 1),
        an AS (SELECT MAX(last_us) AS a FROM pu),
        met AS (
          SELECT user_id,
                 -- anchor - last_us >= 0: // truncation == floor
                 (a - last_us) // 86400000000 AS recency_days,
                 freq, cents
          FROM pu, an),
        sc AS (
          SELECT user_id,
                 NTILE({k}) OVER (ORDER BY recency_days, user_id)
                     AS r_score,
                 NTILE({k}) OVER (ORDER BY freq, user_id) AS f_score,
                 NTILE({k}) OVER (ORDER BY cents, user_id) AS m_score
          FROM met)
        SELECT CAST(r_score AS BIGINT) AS r_score,
               CAST(f_score AS BIGINT) AS f_score,
               CAST(m_score AS BIGINT) AS m_score,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """
