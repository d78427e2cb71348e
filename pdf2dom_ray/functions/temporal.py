"""Temporal joins Ray Data lacks as built-ins: as-of join, banded
range join, per-key rolling (cumulative) windows.

All three follow the repo's one-shuffle hash-partition shape
(SURVEY.md §2.9, same machinery as ``pipelines/metrics.py::sessionize``):
tag every row with ``part = hash(key) % P``, one
``groupby(part).map_groups`` exchange, then a fully VECTORIZED pandas
pass per partition (``merge_asof`` / interval merge / ``cumsum``) —
one Python call per partition, never per key. The partitioning
assumption is key-hash co-location; hot keys are bounded by their own
row counts, never by partition peers.

Determinism rules (CLAUDE.md): every oracle-checked value column is
integer (cents via ``floor(value*100)``) and every ordering has a
total tie-break (event_id / o_orderkey), so the driver's value-hash is
partitioning-independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["asof_join_last_purchase", "range_join_event_window",
           "rolling_user_totals", "event_transitions",
           "inter_event_gaps", "interval_coverage",
           "interval_coverage_sql", "peak_concurrency",
           "peak_concurrency_sql", "stream_disorder",
           "stream_disorder_sql"]

_US_PER_DAY = 86_400_000_000


def _part_of(s: pd.Series, num_partitions: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(s, index=False)
    return (h % num_partitions).astype("int64").to_numpy()


def asof_join_last_purchase(sf_dir: str, anchor_type: str = "purchase",
                            num_partitions: int | None = None) -> rd.Dataset:
    """For every event, the same user's most recent STRICTLY-PRIOR
    ``anchor_type`` event (classic backward as-of join — "attribute
    each event to the last purchase"; ties on ts break to the highest
    anchor event_id). Events with no prior anchor are dropped (inner
    as-of).

    Scale shape: both sides are hash-partitioned on the join key into
    the SAME partition space and exchanged once; each partition runs
    one ``pd.merge_asof`` (vectorized binary-search merge) over its
    co-located slice. No broadcast, no N×M expansion, no global sort —
    the per-partition sort is local and bounded by the partition's own
    rows. The right side is derived from the same scan via a batch
    filter, so the events table is read once per side of the union
    (two column-pruned scans total — at crawl scale the anchor side
    would be a pre-materialized narrow table).
    """
    from ..scale import scale_partitions
    num_partitions = num_partitions or scale_partitions()
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "user_id", "ts",
                                      "event_type"])

    # Both sides mapped to ONE common Arrow schema so the union has a
    # uniform block type (CLAUDE.md groupby gotcha):
    #   key i64 | t ts[us] | event_id i64 | anchor_id i64 | __part i64
    # with -1 sentinels marking the absent side's id column.
    def tag_left(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "key": pa.array(df["user_id"].to_numpy(), pa.int64()),
            "t": pa.array(df["ts"].astype("datetime64[us]")),
            "event_id": pa.array(df["event_id"].to_numpy(), pa.int64()),
            "anchor_id": pa.array(np.full(len(df), -1, dtype=np.int64)),
            "__part": pa.array(_part_of(df["user_id"], num_partitions)),
        })

    def tag_right(df: pd.DataFrame) -> pa.Table:
        df = df[df["event_type"] == anchor_type]
        return pa.table({
            "key": pa.array(df["user_id"].to_numpy(), pa.int64()),
            "t": pa.array(df["ts"].astype("datetime64[us]")),
            "event_id": pa.array(np.full(len(df), -1, dtype=np.int64)),
            "anchor_id": pa.array(df["event_id"].to_numpy(), pa.int64()),
            "__part": pa.array(_part_of(df["user_id"], num_partitions)),
        })

    both = events.map_batches(tag_left, batch_format="pandas").union(
        events.map_batches(tag_right, batch_format="pandas"))

    def per_partition(g: pd.DataFrame) -> pa.Table:
        left = g[g["event_id"] >= 0]
        right = g[g["event_id"] < 0]
        # merge_asof takes the LAST right row before each left t — the
        # mergesort by (t, anchor_id) makes that the max anchor_id
        # among equal-ts anchors; allow_exact_matches=False makes the
        # match strictly prior (an anchor never matches itself).
        left = left.sort_values("t", kind="mergesort")
        right = right.sort_values(["t", "anchor_id"], kind="mergesort")
        m = pd.merge_asof(
            left[["key", "t", "event_id"]],
            right[["key", "t", "anchor_id"]].rename(
                columns={"t": "anchor_ts"}),
            left_on="t", right_on="anchor_ts", by="key",
            direction="backward", allow_exact_matches=False)
        m = m.dropna(subset=["anchor_id"])
        return pa.table({
            "event_id": pa.array(m["event_id"].to_numpy(), pa.int64()),
            "user_id": pa.array(m["key"].to_numpy(), pa.int64()),
            "ts": pa.array(m["t"].astype("datetime64[us]")),
            "anchor_id": pa.array(
                m["anchor_id"].to_numpy().astype(np.int64)),
            "anchor_ts": pa.array(
                m["anchor_ts"].astype("datetime64[us]")),
        })

    return both.groupby("__part").map_groups(per_partition,
                                             batch_format="pandas")


def range_join_event_window(sf_dir: str, anchor_type: str = "signup",
                            window_days: int = 7,
                            num_partitions: int | None = None) -> rd.Dataset:
    """Banded range join: per ``anchor_type`` event, how many OTHER
    events of the same user fall in ``[ts, ts + window_days)``
    ("activity in the week after signup"). Anchors with zero in-window
    events are dropped (inner).

    Scale shape: time is bucketed at the window width, so an anchor's
    window spans at most TWO buckets — the anchor side is replicated
    ×2 into ``(key, bucket)`` space (bounded fan-out, never N×M), the
    probe side lands in its own bucket, and one hash exchange
    co-locates candidates. Each partition does an equi-merge on
    ``(key, bucket)`` plus a vectorized range filter; per-anchor
    counts then collapse through the usual combiner → small-groupby
    chain (an anchor's two buckets may land in different partitions).
    """
    from ..scale import scale_partitions
    num_partitions = num_partitions or scale_partitions()
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "user_id", "ts",
                                      "event_type"])
    width = np.int64(window_days) * _US_PER_DAY

    def tag_probe(df: pd.DataFrame) -> pa.Table:
        t = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        key = df["user_id"].to_numpy().astype(np.int64)
        eid = df["event_id"].to_numpy().astype(np.int64)
        bucket = t // width
        part = pd.util.hash_pandas_object(
            pd.DataFrame({"k": key, "b": bucket}), index=False)
        return pa.table({
            "key": pa.array(key), "bucket": pa.array(bucket),
            "t": pa.array(t), "probe_id": pa.array(eid),
            "anchor_id": pa.array(np.full(len(df), -1, np.int64)),
            "__part": pa.array((part % num_partitions)
                               .astype("int64").to_numpy()),
        })

    def tag_anchor(df: pd.DataFrame) -> pa.Table:
        df = df[df["event_type"] == anchor_type]
        t0 = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        key = df["user_id"].to_numpy().astype(np.int64)
        aid = df["event_id"].to_numpy().astype(np.int64)
        b0 = t0 // width
        # replicate each anchor into the two buckets its window touches
        key2 = np.concatenate([key, key])
        aid2 = np.concatenate([aid, aid])
        t2 = np.concatenate([t0, t0])
        b2 = np.concatenate([b0, b0 + 1])
        part = pd.util.hash_pandas_object(
            pd.DataFrame({"k": key2, "b": b2}), index=False)
        return pa.table({
            "key": pa.array(key2), "bucket": pa.array(b2),
            "t": pa.array(t2),
            "probe_id": pa.array(np.full(len(key2), -1, np.int64)),
            "anchor_id": pa.array(aid2),
            "__part": pa.array((part % num_partitions)
                               .astype("int64").to_numpy()),
        })

    both = events.map_batches(tag_probe, batch_format="pandas").union(
        events.map_batches(tag_anchor, batch_format="pandas"))

    def per_partition(g: pd.DataFrame) -> pa.Table:
        ev = g[g["anchor_id"] < 0]
        an = g[g["anchor_id"] >= 0]
        if not len(ev) or not len(an):
            return pa.table({"anchor_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        m = an.merge(ev[["key", "bucket", "t", "probe_id"]],
                     on=["key", "bucket"], suffixes=("", "_e"))
        hit = (m["t_e"] >= m["t"]) & (m["t_e"] < m["t"] + width) & \
              (m["probe_id_e"] != m["anchor_id"])
        n = (m[hit].groupby("anchor_id", sort=False).size())
        return pa.table({
            "anchor_id": pa.array(n.index.to_numpy(), pa.int64()),
            "n_events": pa.array(n.to_numpy(), pa.int64()),
        })

    partials = both.groupby("__part").map_groups(per_partition,
                                                 batch_format="pandas")

    from ..stages.hashagg import hash_aggregate

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("anchor_id", as_index=False) \
                 .agg(n_events=("n_events", "sum"))

    out = hash_aggregate(partials, ["anchor_id"], combine,
                         num_partitions=num_partitions)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_events"] = df["n_events"].astype("int64")
        return df
    return out.map_batches(finish, batch_format="pandas")


def rolling_user_totals(sf_dir: str,
                        num_partitions: int | None = None) -> rd.Dataset:
    """Per-event running totals per user: cumulative event count and
    cumulative integer cents of ``value``, ordered by (ts, event_id).

    The unbounded-preceding window needs every key's full history in
    one place → one hash exchange on user_id, then a vectorized sort +
    ``groupby(...).cumsum()`` per partition.
    """
    from ..scale import scale_partitions
    num_partitions = num_partitions or scale_partitions()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(__part=_part_of(df["user_id"], num_partitions))

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        cents = np.floor(g["value"].to_numpy() * 100.0).astype(np.int64)
        g = g.assign(__cents=cents)
        grp = g.groupby("user_id", sort=False)
        return pa.table({
            "event_id": pa.array(g["event_id"].to_numpy(), pa.int64()),
            "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
            "ts": pa.array(g["ts"].astype("datetime64[us]")),
            "cum_n": pa.array(grp.cumcount().to_numpy() + 1, pa.int64()),
            "cum_cents": pa.array(grp["__cents"].cumsum().to_numpy(),
                                  pa.int64()),
        })

    return (ds.map_batches(tag, batch_format="pandas")
              .groupby("__part")
              .map_groups(per_partition, batch_format="pandas"))


def event_transitions(events: rd.Dataset, *, user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      id_col: str = "event_id",
                      num_partitions: int | None = None) -> rd.Dataset:
    """(from_type, to_type, n): the first-order Markov transition
    counts of each user's event sequence (the LEAD window shape —
    "what do users do right after X?").

    Same one-shuffle plan as the other window operators: narrow
    columns only, hash exchange on user, per-partition mergesort +
    ``groupby(user).shift(-1)`` (vectorized lead), pair-count partial
    per partition, tiny global sum. Ordering has the (ts, id) total
    tie-break, so the pairing — and therefore the integer counts —
    is partitioning-independent.
    """
    from ..scale import scale_partitions
    num_partitions = num_partitions or scale_partitions()
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[user_col, ts_col, type_col, id_col]]
        return df.assign(__part=_part_of(df[user_col], num_partitions))

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([user_col, ts_col, id_col], kind="mergesort")
        nxt = g.groupby(user_col, sort=False)[type_col].shift(-1)
        mask = nxt.notna()
        pairs = pd.DataFrame({"from_type": g[type_col][mask],
                              "to_type": nxt[mask]})
        c = pairs.groupby(["from_type", "to_type"], sort=False,
                          as_index=False).size().rename(columns={"size": "n"})
        return pa.table({
            "from_type": pa.array(c["from_type"], pa.string()),
            "to_type": pa.array(c["to_type"], pa.string()),
            "n": pa.array(c["n"].to_numpy(np.int64), pa.int64())})

    parts = (events.select_columns([user_col, ts_col, type_col, id_col])
             .map_batches(tag, batch_format="pandas")
             .groupby("__part")
             .map_groups(per_partition, batch_format="pandas"))

    from ray.data.aggregate import Sum

    from .dedup import _to_arrow_blocks

    def finish(t) -> pa.Table:
        t = t if isinstance(t, pa.Table) else \
            pa.Table.from_pandas(t, preserve_index=False)
        if not t.num_columns:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"from_type": t.column("from_type"),
                         "to_type": t.column("to_type"),
                         "n": t.column("n").cast(pa.int64())})

    agg = _to_arrow_blocks(parts.groupby(["from_type", "to_type"])
                           .aggregate(Sum("n", alias_name="n")))
    return agg.map_batches(finish, batch_format="pyarrow")


def inter_event_gaps(sf_dir: str,
                     num_partitions: int | None = None) -> rd.Dataset:
    """Per-user inter-arrival statistics: the LAG window shape.

    For each user, the gaps (microseconds) between consecutive events
    in (ts, event_id) order → one summary row per user: gap count,
    total/max/min gap. Integer microseconds keep the driver's
    value-hash exact (no float means/ratios).

    Scale shape: narrow columns only, ONE hash exchange on user_id,
    then a vectorized per-partition pass (mergesort + groupby.shift
    diff + one pandas agg). A user's full history is co-located by the
    hash, so the per-partition summary is FINAL — no second shuffle.
    """
    from ..scale import scale_partitions
    num_partitions = num_partitions or scale_partitions()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(__part=_part_of(df["user_id"], num_partitions))

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = g["user_id"].to_numpy(np.int64)
        gap = np.diff(t, prepend=t[:1])
        # first row of each user has no predecessor → drop its gap
        first = np.empty(len(uid), dtype=bool)
        first[:1] = True
        first[1:] = uid[1:] != uid[:-1]
        d = pd.DataFrame({"user_id": uid[~first], "gap": gap[~first]})
        if not len(d):
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_gaps": pa.array([], pa.int64()),
                "total_gap_us": pa.array([], pa.int64()),
                "max_gap_us": pa.array([], pa.int64()),
                "min_gap_us": pa.array([], pa.int64())})
        s = d.groupby("user_id", sort=False).agg(
            n_gaps=("gap", "size"), total_gap_us=("gap", "sum"),
            max_gap_us=("gap", "max"), min_gap_us=("gap", "min"))
        return pa.table({
            "user_id": pa.array(s.index.to_numpy(np.int64)),
            "n_gaps": pa.array(s["n_gaps"].to_numpy(np.int64)),
            "total_gap_us": pa.array(
                s["total_gap_us"].to_numpy(np.int64)),
            "max_gap_us": pa.array(s["max_gap_us"].to_numpy(np.int64)),
            "min_gap_us": pa.array(s["min_gap_us"].to_numpy(np.int64)),
        })

    return (ds.map_batches(tag, batch_format="pandas")
              .groupby("__part")
              .map_groups(per_partition, batch_format="pandas"))


def interval_coverage(sf_dir: str, *, window_s: int = 300,
                      num_partitions: int | None = None
                      ) -> rd.Dataset:
    """Per-user activity coverage: each event opens a
    ``[ts, ts + window_s)`` presence interval; overlapping intervals
    UNION (the classic interval-merge sweep), and the row reports
    the user's total covered microseconds and merged-interval count
    — the "time actually active" metric raw event counts overstate.

    Scale shape: one user-hash exchange, per-partition vectorized
    sweep (sort by (user, ts); an interval STARTS where the gap to
    the previous event exceeds the window — the union length is then
    Σ(min(gap, window))) — one Python call per partition, integers
    end-to-end (CLAUDE.md).
    """
    from ..scale import scale_partitions
    num_partitions = num_partitions or scale_partitions()
    w_us = np.int64(window_s) * 1_000_000

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["user_id"], index=False)
        return df.assign(__part=(h % num_partitions)
                         .astype("int64"))

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        us = g["ts"].astype("datetime64[us]").astype(np.int64) \
            .to_numpy()
        new_user = np.empty(len(g), dtype=bool)
        new_user[:1] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.empty(len(g), dtype=np.int64)
        gap[:1] = w_us
        gap[1:] = us[1:] - us[:-1]
        # each event contributes min(gap-to-next-event-in-same-
        # interval view, window); equivalently each event i>start
        # adds min(gap, w); interval starts add w
        contrib = np.where(new_user, w_us, np.minimum(gap, w_us))
        starts = new_user | (gap > w_us)
        df = pd.DataFrame({"user_id": uid,
                           "covered_us": contrib,
                           "n_intervals": starts.astype(np.int64)})
        return pa.Table.from_pandas(
            df.groupby("user_id", as_index=False).sum(),
            preserve_index=False)

    out = (ds.map_batches(tag, batch_format="pandas")
             .groupby("__part")
             .map_groups(per_partition, batch_format="pandas"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id").cast(pa.int64()),
            "covered_us": t.column("covered_us").cast(pa.int64()),
            "n_intervals": t.column("n_intervals").cast(pa.int64())})

    return out.map_batches(finish,
                           batch_format="pyarrow").sort("user_id")


def interval_coverage_sql(window_s: int = 300) -> str:
    w = window_s * 1_000_000
    return f"""
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS us FROM events),
        g AS (
          SELECT user_id, us,
                 us - lag(us) OVER (PARTITION BY user_id
                                    ORDER BY us) AS gap
          FROM e)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(SUM(CASE WHEN gap IS NULL THEN {w}
                        ELSE LEAST(gap, {w}) END) AS BIGINT)
                   AS covered_us,
               CAST(SUM(CASE WHEN gap IS NULL OR gap > {w}
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_intervals
        FROM g GROUP BY 1 ORDER BY 1
    """


def peak_concurrency(sf_dir: str, *, window_s: int = 300,
                     bucket_s: int = 3600) -> rd.Dataset:
    """Global peak concurrency of the 5-minute presence windows —
    "how many users were active AT ONCE at the worst moment" (the
    capacity-planning number): every event opens [ts, ts+window),
    and the answer is the max of the running +1/−1 boundary sum,
    with closings applied before openings at equal instants
    (half-open intervals; sort key (t, delta)).

    Scale shape — PARALLEL PREFIX-MAX: boundaries bucket by
    ``bucket_s``; each bucket folds independently to THREE integers
    (total delta Σd, max in-bucket prefix M, earliest argmax t*);
    the driver combines buckets in time order with the classic
    carry+max merge (associative — the exchange is one narrow
    groupby, O(buckets) driver rows; no global sort of raw
    boundaries anywhere).
    """
    w_us = np.int64(window_s) * 1_000_000
    b_us = np.int64(bucket_s) * 1_000_000

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts_all = np.concatenate([us, us + w_us])
        delta = np.concatenate([
            np.ones(len(us), np.int64),
            np.full(len(us), -1, np.int64)])
        df = pd.DataFrame({"bucket": ts_all // b_us, "t": ts_all,
                           "d": delta})
        # raw boundary rows per bucket — the groupby merges them;
        # in-bucket prefix needs ALL of a bucket's rows co-located
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "d"], kind="mergesort")
        run = g["d"].cumsum().to_numpy()
        m = int(run.max())
        at = int(g["t"].to_numpy()[int(np.argmax(run))])
        return pd.DataFrame({"bucket": [int(g["bucket"].iloc[0])],
                             "total": [int(g["d"].sum())],
                             "max_prefix": [m], "at_us": [at]})

    # one bucket-keyed exchange, one vectorized sweep per bucket
    tagged = ds.map_batches(partial, batch_format="pyarrow")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        from ..scale import scale_partitions
        P = scale_partitions()
        h = pd.util.hash_pandas_object(df["bucket"], index=False)
        return df.assign(__part=(h % P).astype("int64"))

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.drop(columns="__part")
        out = g.groupby("bucket", group_keys=False, sort=False) \
            .apply(per_bucket)
        return pa.Table.from_pandas(out.reset_index(drop=True),
                                    preserve_index=False)

    parts = tagged.map_batches(tag, batch_format="pandas") \
        .groupby("__part") \
        .map_groups(per_partition, batch_format="pandas")

    from .fold import bounded_fold_tables
    tables = bounded_fold_tables(parts)
    if not tables:
        return rd.from_arrow(pa.table({
            "peak": pa.array([], pa.int64()),
            "at": pa.array([], pa.timestamp("us"))}))
    schema = pa.schema([("bucket", pa.int64()), ("total", pa.int64()),
                        ("max_prefix", pa.int64()),
                        ("at_us", pa.int64())])
    b = pa.concat_tables([t.cast(schema) for t in tables]) \
        .to_pandas().sort_values("bucket")
    carry = 0
    peak = -1 << 62
    at = 0
    for _, r in b.iterrows():
        cand = carry + int(r.max_prefix)
        if cand > peak:            # strictly greater ⇒ earliest at
            peak, at = cand, int(r.at_us)
        carry += int(r.total)
    return rd.from_arrow(pa.table({
        "peak": pa.array([peak], pa.int64()),
        "at": pa.array([at], pa.timestamp("us"))}))


def peak_concurrency_sql(window_s: int = 300) -> str:
    w = window_s * 1_000_000
    return f"""
        WITH b AS (
          SELECT epoch_us(ts) AS t, 1 AS d FROM events
          UNION ALL
          SELECT epoch_us(ts) + {w}, -1 FROM events),
        r AS (
          SELECT t, SUM(d) OVER (ORDER BY t, d
                                 ROWS UNBOUNDED PRECEDING) AS run
          FROM b),
        mx AS (SELECT MAX(run) AS peak FROM r)
        SELECT CAST(mx.peak AS BIGINT) AS peak,
               make_timestamp(MIN(r.t)) AS at
        FROM r, mx WHERE r.run = mx.peak
        GROUP BY mx.peak
    """


def stream_disorder(sf_dir: str, *, bucket: int = 4096
                    ) -> rd.Dataset:
    """Out-of-order arrival audit of the event stream: treating
    ``event_id`` as arrival order, an event is LATE when its ts is
    behind the running max ts of everything that arrived before it;
    reports (n_events, n_late, max_skew_us) — the numbers that size
    a streaming pipeline's watermark delay and late-data buffer.

    Scale shape — the second parallel-prefix operator
    (``peak_concurrency``'s sibling, max instead of sum): arrival
    order buckets by ``event_id // bucket``; each bucket folds to
    (its max ts, its internal late count, its internal max skew,
    its min-exclusive prefix maxes...) — concretely (bucket, max_ts,
    n_late_internal, max_skew_internal, first-part data) where the
    driver merge replays late counts against the carry (running max
    of earlier buckets) using each bucket's SORTED (ts) summary...
    kept simple: each bucket also reports its events' (min over
    arrival of ts) boundary effects via two integer arrays folded to
    scalars — late-vs-carry = events with ts < carry, computable
    from the bucket's ts HISTOGRAM — so per bucket we keep
    (max_ts, n_internal_late, max_internal_skew, sorted ts digest as
    value/count rows). For the event tables here the digest is the
    bucket's distinct ts values (≤ bucket rows) — the exchange is
    O(n) narrow int64 rows, never a global sort of the raw stream.
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("event_id"), dtype=np.int64)
        us = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.argsort(ids, kind="mergesort")
        ids, us = ids[order], us[order]
        b = ids // bucket
        return pa.Table.from_pandas(
            pd.DataFrame({"bucket": b, "event_id": ids, "us": us}),
            preserve_index=False)

    def per_partition(g: pd.DataFrame) -> pa.Table:
        out = []
        for bk, sub in g.drop(columns="__part").groupby("bucket",
                                                        sort=True):
            sub = sub.sort_values("event_id", kind="mergesort")
            us = sub["us"].to_numpy(np.int64)
            run = np.maximum.accumulate(us)
            prev = np.concatenate(([np.int64(-1 << 62)], run[:-1]))
            late = us < prev
            skew = int((prev - us)[late].max()) if late.any() else 0
            # RECORD events only (new running maxima): internally
            # non-late, so the carry replay counts each event at
            # most once (a both-ways-late event is already in the
            # internal count). Bucket min (kind 4) feeds the carry
            # skew term, which ranges over ALL bucket events.
            rec = us >= prev
            vals, cnts = np.unique(us[rec], return_counts=True)
            out.append(pd.DataFrame({
                "bucket": bk, "kind": 0, "v": vals,
                "c": cnts.astype(np.int64)}))
            out.append(pd.DataFrame({
                "bucket": [bk] * 5, "kind": [1, 2, 3, 4, 5],
                "v": [int(us.max()), int(late.sum()), skew,
                      int(us.min()), int(len(us))],
                "c": [1, 1, 1, 1, 1]}))
        if not out:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        return pa.Table.from_pandas(pd.concat(out,
                                              ignore_index=True),
                                    preserve_index=False)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        from ..scale import scale_partitions
        P = scale_partitions()
        h = pd.util.hash_pandas_object(df["bucket"], index=False)
        return df.assign(__part=(h % P).astype("int64"))

    parts = (ds.map_batches(partial, batch_format="pyarrow")
               .map_batches(tag, batch_format="pandas")
               .groupby("__part")
               .map_groups(per_partition, batch_format="pandas"))

    from .fold import bounded_fold_tables
    tables = bounded_fold_tables(parts)
    empty = pa.table({"n_events": pa.array([0], pa.int64()),
                      "n_late": pa.array([0], pa.int64()),
                      "max_skew_us": pa.array([0], pa.int64())})
    if not tables:
        return rd.from_arrow(empty)
    df = pa.concat_tables(
        [t.cast(pa.schema([("bucket", pa.int64()),
                           ("kind", pa.int64()),
                           ("v", pa.int64()),
                           ("c", pa.int64())])) for t in tables]) \
        .to_pandas()
    n_events = int(df.loc[df["kind"] == 5, "v"].sum())
    n_late = int(df.loc[df["kind"] == 2, "v"].sum())
    max_skew = int(df.loc[df["kind"] == 3, "v"].max()) \
        if (df["kind"] == 3).any() else 0
    carry = -1 << 62
    for bk in sorted(df["bucket"].unique().tolist()):
        sub = df[df["bucket"] == bk]
        hist = sub[sub["kind"] == 0]     # record events only
        v = hist["v"].to_numpy(np.int64)
        c = hist["c"].to_numpy(np.int64)
        lt = v < carry
        n_late += int(c[lt].sum())
        bmin = int(sub.loc[sub["kind"] == 4, "v"].iloc[0])
        if bmin < carry:                 # carry skew over ALL events
            max_skew = max(max_skew, carry - bmin)
        bmax = int(sub.loc[sub["kind"] == 1, "v"].iloc[0])
        carry = max(carry, bmax)
    return rd.from_arrow(pa.table({
        "n_events": pa.array([n_events], pa.int64()),
        "n_late": pa.array([n_late], pa.int64()),
        "max_skew_us": pa.array([max_skew], pa.int64())}))


def stream_disorder_sql() -> str:
    return """
        WITH r AS (
          SELECT epoch_us(ts) AS us,
                 MAX(epoch_us(ts)) OVER (ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING) AS prevmax
          FROM events)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN us < prevmax THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_late,
               CAST(COALESCE(MAX(CASE WHEN us < prevmax
                                 THEN prevmax - us END), 0)
                    AS BIGINT) AS max_skew_us
        FROM r
    """
