"""Corpus-level aggregations: metrics, windowed event aggregation,
broadcast joins.

These are the A3 operators from SURVEY.md §2.5 — required by the north
rule, absent in the single-document reference. Every aggregation uses
the combiner pattern: vectorized per-batch partial aggregation inside
``map_batches``, then a small global ``groupby`` over the partials, so
the shuffle moves (keys × batches) rows, never the raw table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["corpus_metrics", "events_hourly", "orders_by_segment",
           "purchases_hourly_pushdown", "events_rollup"]


def corpus_metrics(parsed: rd.Dataset) -> pd.DataFrame:
    """Whole-corpus extraction metrics from the parser output table."""
    def partial(t: pa.Table) -> pa.Table:
        err = pc.is_valid(t.column("error"))
        return pa.table({
            "g": pa.array([0], pa.int32()),
            "docs": pa.array([t.num_rows], pa.int64()),
            "errors": pa.array([pc.sum(pc.cast(err, pa.int64())).as_py() or 0],
                               pa.int64()),
            "pages": pa.array([pc.sum(t.column("num_pages")).as_py() or 0],
                              pa.int64()),
            "spans": pa.array([pc.sum(t.column("n_spans")).as_py() or 0],
                              pa.int64()),
            "bytes": pa.array([pc.sum(t.column("payload_bytes")).as_py() or 0],
                              pa.int64()),
            "parse_ms": pa.array(
                [pc.sum(pc.cast(t.column("parse_ms"), pa.float64())).as_py() or 0.0],
                pa.float64()),
        })
    out = (parsed.map_batches(partial, batch_format="pyarrow")
                 .groupby("g")
                 .aggregate(Sum("docs", alias_name="docs"),
                            Sum("errors", alias_name="errors"),
                            Sum("pages", alias_name="pages"),
                            Sum("spans", alias_name="spans"),
                            Sum("bytes", alias_name="bytes"),
                            Sum("parse_ms", alias_name="parse_ms"))
                 .to_pandas())
    return out.drop(columns=["g"])


def events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling-window aggregate: (user_id, hour) → count + sum(value).

    Partial per-batch pandas groupby, then global groupby over partials.
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    from ..stages.hashagg import hash_aggregate

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if "hour" not in df.columns:
            df = df.assign(hour=df["ts"].dt.floor("h"))
            return (df.groupby(["user_id", "hour"], as_index=False)
                      .agg(n=("value", "size"), sum_value=("value", "sum")))
        return (df.groupby(["user_id", "hour"], as_index=False)
                  .agg(n=("n", "sum"), sum_value=("sum_value", "sum")))

    agg = hash_aggregate(ds, ["user_id", "hour"], combine)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n"] = df["n"].astype("int64")
        df["sum_value"] = df["sum_value"].round(6)
        df["hour"] = df["hour"].astype("datetime64[us]")
        return df
    return agg.map_batches(finish, batch_format="pandas")


def sessionize(sf_dir: str, gap_minutes: int = 30,
               num_partitions: int | None = None) -> rd.Dataset:
    """Session windows per user: a new session starts when the gap to
    the previous event exceeds ``gap_minutes``.

    Scale shape: ONE hash-partition shuffle on user_id, then a fully
    VECTORIZED per-partition pass (sort by (user, ts) + groupby
    transforms) — the per-group-Python-call cost of
    ``groupby(user).map_groups`` would be one call per user (10⁸ at
    crawl scale); here it is one call per partition. The partitioning
    assumption (SURVEY.md §2.9) is user_id-hash co-location; skewed hot
    users are bounded by their own event counts, never by partition
    peers."""
    from ..scale import scale_partitions
    num_partitions = num_partitions or scale_partitions()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    gap = pd.Timedelta(minutes=gap_minutes)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["user_id"], index=False)
        return df.assign(__part=(h % num_partitions).astype("int64"))

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        boundary = (g["user_id"] != g["user_id"].shift(1)) | \
                   (g["ts"].diff() > gap)
        agg = g.assign(__new=boundary.astype("int64")) \
            .groupby("user_id", sort=False) \
            .agg(n_events=("ts", "size"), n_sessions=("__new", "sum"))
        return pa.table({
            "user_id": pa.array(agg.index.to_numpy()),
            "n_events": pa.array(agg["n_events"].to_numpy(), pa.int64()),
            "n_sessions": pa.array(agg["n_sessions"].to_numpy(), pa.int64()),
        })

    return (ds.map_batches(tag, batch_format="pandas")
              .groupby("__part")
              .map_groups(per_partition, batch_format="pandas"))


def session_paths(sf_dir: str, gap_minutes: int = 30,
                  k: int = 20, num_partitions: int | None = None) -> rd.Dataset:
    """(path, n_sessions): the top-``k`` most common session
    event-type sequences ("user journeys") — session-level SEQUENCE
    aggregation on top of the sessionize windowing.

    Scale shape: same ONE user-hash exchange as ``sessionize``; the
    per-partition pass is vectorized through session-id assignment
    (mergesort + boundary cumsum), with one ``str.join`` per session
    for path assembly (inherent to string building). Per-partition
    (path, n) partials then collapse through the hash-partitioned
    aggregate, and the k-row result comes from per-batch top-k
    partials + a driver merge — no Sort operator, no payload rows in
    any exchange."""
    from ..scale import scale_partitions
    num_partitions = num_partitions or scale_partitions()
    import numpy as np

    import ray

    gap = np.int64(gap_minutes) * 60_000_000

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["user_id"], index=False)
        return df.assign(__part=(h % num_partitions).astype("int64")
                         .to_numpy())

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        t = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        n = len(g)
        newsess = np.empty(n, dtype=bool)
        newsess[:1] = True
        newsess[1:] = (uid[1:] != uid[:-1]) |                       ((t[1:] - t[:-1]) > gap)
        sid = np.cumsum(newsess)
        paths = pd.Series(g["event_type"].to_numpy())             .groupby(sid).agg(">".join)
        c = paths.value_counts()
        return pa.table({
            "path": pa.array(c.index.to_numpy(object), pa.string()),
            "n_sessions": pa.array(c.to_numpy(np.int64), pa.int64())})

    partials = (ds.map_batches(tag, batch_format="pandas")
                  .groupby("__part")
                  .map_groups(per_partition, batch_format="pandas"))

    from ..stages.hashagg import hash_aggregate

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("path", as_index=False)                  .agg(n_sessions=("n_sessions", "sum"))

    counts = hash_aggregate(partials, ["path"], combine,
                            num_partitions=num_partitions)

    def topk_partial(df: pd.DataFrame) -> pa.Table:
        if "path" not in df.columns:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_sessions": pa.array([], pa.int64())})
        df = df.sort_values(["n_sessions", "path"],
                            ascending=[False, True],
                            kind="mergesort").head(k)
        return pa.table({
            "path": pa.array(df["path"].to_numpy(object), pa.string()),
            "n_sessions": pa.array(
                df["n_sessions"].to_numpy(np.int64), pa.int64())})

    parts = counts.map_batches(topk_partial, batch_format="pandas")

    def topk_arrow(t: pa.Table) -> pa.Table:
        return topk_partial(t.to_pandas())

    from ..functions.fold import bounded_fold_tables
    tabs = bounded_fold_tables(parts, topk_arrow)
    if not tabs:
        return rd.from_arrow(pa.table({
            "path": pa.array([], pa.string()),
            "n_sessions": pa.array([], pa.int64())}))
    merged = pa.concat_tables(tabs).combine_chunks()
    idx = pa.compute.sort_indices(
        merged, sort_keys=[("n_sessions", "descending"),
                           ("path", "ascending")])
    return rd.from_arrow(merged.take(idx[:k]))


def orders_by_segment(sf_dir: str) -> rd.Dataset:
    """Broadcast join: orders ⋈ customer on custkey → per-segment totals.

    The small side (customer) is ``ray.put`` once and looked up inside
    each batch — no shuffle join. The global groupby runs over ≤
    |segments| × batches partial rows.
    """
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    # broadcast SORTED numpy key + segment-code arrays (zero-copy
    # ray.get per batch; a dict would re-deserialize every batch) and
    # probe with searchsorted; segment strings travel as a tiny list
    ckeys = cust.column("c_custkey").to_numpy().astype(np.int64)
    codes, seg_names = pd.factorize(
        cust.column("c_mktsegment").to_pandas())
    order = np.argsort(ckeys, kind="stable")
    keys_ref = ray.put(ckeys[order])
    codes_ref = ray.put(codes[order].astype(np.int32))
    seg_names = list(seg_names)

    def join_agg(df: pd.DataFrame) -> pd.DataFrame:
        # plain task fn: ray.get of the numpy broadcasts is a
        # shared-memory read — no actor-pool spin-up
        keys = ray.get(keys_ref)
        codes = ray.get(codes_ref)
        ck = df["o_custkey"].to_numpy().astype(np.int64, copy=False)
        pos = np.searchsorted(keys, ck)
        pos[pos == len(keys)] = 0
        hit = keys[pos] == ck
        seg = pd.Categorical.from_codes(
            np.where(hit, codes[pos], -1), categories=seg_names)
        return (df.assign(c_mktsegment=seg.astype(object))
                  .groupby("c_mktsegment", as_index=False)
                  .agg(n_orders=("o_orderkey", "size"),
                       total=("o_totalprice", "sum")))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    partials = orders.map_batches(join_agg, batch_format="pandas")
    agg = (partials.groupby("c_mktsegment")
                   .aggregate(Sum("n_orders", alias_name="n_orders"),
                              Sum("total", alias_name="total")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_orders"] = df["n_orders"].astype("int64")
        df["total"] = df["total"].round(2)
        return df
    return agg.map_batches(finish, batch_format="pandas")


def purchases_hourly_pushdown(sf_dir: str) -> rd.Dataset:
    """(hour, n, value_cents): hourly purchase volume with the filter
    PUSHED INTO THE SCAN — ``read_parquet(filter=...)`` hands the
    predicate to the Arrow dataset reader, so non-matching row groups
    are pruned at storage and non-purchase rows never enter the object
    store (prune-at-the-read, the complement of the column pruning
    every other query already does). Integer cents keep the oracle
    sum exact."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"],
        filter=((pads.field("event_type") == "purchase")
                & (pads.field("value") >= 100.0)))

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (us // 3_600_000_000) * 3_600_000_000
        cents = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        df = pd.DataFrame({"hour_us": hour, "n": 1, "cents": cents})
        g = df.groupby("hour_us", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("hour_us").aggregate(Sum("n", alias_name="n"),
                                      Sum("cents",
                                          alias_name="value_cents"))

    def finish(t) -> pa.Table:
        t = t if isinstance(t, pa.Table) else \
            pa.Table.from_pandas(t, preserve_index=False)
        if not t.num_columns:
            return pa.table({"hour": pa.array([], pa.timestamp("us")),
                             "n": pa.array([], pa.int64()),
                             "value_cents": pa.array([], pa.int64())})
        hour = t.column("hour_us").to_numpy(zero_copy_only=False)
        return pa.table({
            "hour": pa.array(hour.astype("datetime64[us]")),
            "n": t.column("n").cast(pa.int64()),
            "value_cents": t.column("value_cents").cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def events_rollup(sf_dir: str, *, num_partitions: int | None = None) -> rd.Dataset:
    """ROLLUP / GROUPING SETS in one scan: event counts and integer
    cents at three levels — (event_type, hour), (event_type, ALL),
    (ALL, ALL) — with 'ALL' / -1 sentinels marking rolled-up axes.

    Scale shape: the ROLLUP is derived FROM the finest-level aggregate,
    not from the raw rows — the input collapses through the usual
    combiner → hash-partition merge at (event_type, hour) granularity
    (bounded: types × hours rows), and the coarser levels are a
    map-side re-aggregation of that small table. Additive measures
    (count, int-cents sum) make the two-step rollup exact.
    """
    from ..scale import scale_partitions
    num_partitions = num_partitions or scale_partitions()
    from ..stages.hashagg import hash_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if "hour_us" not in df.columns:
            import numpy as np
            hour_us = (df["ts"].astype("datetime64[us]").astype("int64")
                       // 3_600_000_000) * 3_600_000_000
            cents = np.floor(df["value"].to_numpy() * 100.0) \
                .astype("int64")
            df = pd.DataFrame({"event_type": df["event_type"],
                               "hour_us": hour_us,
                               "n": 1, "cents": cents})
        return (df.groupby(["event_type", "hour_us"], as_index=False)
                  .agg(n=("n", "sum"), cents=("cents", "sum")))

    fine = hash_aggregate(ds, ["event_type", "hour_us"], combine,
                          num_partitions=num_partitions).materialize()
    # materialized: the small finest-level table feeds the rollup scan
    # AND appears in the result — one execution

    def to_rows(df: pd.DataFrame) -> pa.Table:
        import numpy as np
        hour = df["hour_us"].to_numpy(np.int64)
        return pa.table({
            "event_type": pa.array(df["event_type"], pa.string()),
            "hour": pa.array(hour, pa.int64()),
            "n": pa.array(df["n"].to_numpy(np.int64), pa.int64()),
            "cents": pa.array(df["cents"].to_numpy(np.int64), pa.int64())})

    finest = fine.map_batches(to_rows, batch_format="pandas")

    def coarse(df: pd.DataFrame) -> pa.Table:
        import numpy as np
        by_type = (df.groupby("event_type", as_index=False)
                     .agg(n=("n", "sum"), cents=("cents", "sum")))
        by_type["hour"] = np.int64(-1)
        total = pd.DataFrame({"event_type": ["ALL"],
                              "hour": np.array([-1], np.int64),
                              "n": [df["n"].sum()],
                              "cents": [df["cents"].sum()]})
        out = pd.concat([by_type[["event_type", "hour", "n", "cents"]],
                         total], ignore_index=True)
        return pa.table({
            "event_type": pa.array(out["event_type"], pa.string()),
            "hour": pa.array(out["hour"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(out["n"].to_numpy(np.int64), pa.int64()),
            "cents": pa.array(out["cents"].to_numpy(np.int64),
                              pa.int64())})

    # the finest table is small (types × hours): one repartition(1)
    # pass derives the rolled-up levels exactly
    rolled = (fine.map_batches(to_rows, batch_format="pandas")
              .repartition(1)
              .map_batches(coarse, batch_format="pandas"))
    return finest.union(rolled)


def bounce_rate(sf_dir: str, gap_minutes: int = 30,
                num_partitions: int | None = None) -> rd.Dataset:
    """Per entry-event-type bounce rate: sessions (the ``sessionize``
    gap rule) grouped by their FIRST event's type; a bounce is a
    single-event session. (entry_type, n_sessions, n_bounces,
    bounce_ppm), sorted — the landing-page quality readout.

    Scale shape: the sessionize exchange (ONE user-hash shuffle, one
    vectorized pass per partition — session ids are a cumsum of gap
    boundaries, entry = first row of each (user, session) run since
    the sort is (user, ts, event_id)); per-partition partials are
    ≤ |event types| rows, folded on the driver. Integer ppm.
    """
    from ..scale import scale_partitions
    num_partitions = num_partitions or scale_partitions()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["user_id"], index=False)
        return df.assign(__part=(h % num_partitions).astype("int64"))

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        boundary = (g["user_id"] != g["user_id"].shift(1)) | \
                   (g["ts"].diff() > gap)
        sid = boundary.cumsum()
        per = g.assign(__sid=sid).groupby("__sid", sort=False) \
            .agg(entry_type=("event_type", "first"),
                 n=("event_type", "size"))
        out = pd.DataFrame({
            "entry_type": per["entry_type"],
            "n_sessions": np.ones(len(per), np.int64),
            "n_bounces": (per["n"] == 1).astype(np.int64)}) \
            .groupby("entry_type", as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = (ds.map_batches(tag, batch_format="pandas")
               .groupby("__part")
               .map_groups(per_partition, batch_format="pandas"))

    from ..functions.fold import bounded_fold_tables
    tables = bounded_fold_tables(parts)
    if not tables:
        return rd.from_arrow(pa.table({
            "entry_type": pa.array([], pa.string()),
            "n_sessions": pa.array([], pa.int64()),
            "n_bounces": pa.array([], pa.int64()),
            "bounce_ppm": pa.array([], pa.int64())}))
    schema = pa.schema([("entry_type", pa.string()),
                        ("n_sessions", pa.int64()),
                        ("n_bounces", pa.int64())])
    merged = pa.concat_tables([t.cast(schema) for t in tables]) \
        .to_pandas().groupby("entry_type", as_index=False).sum() \
        .sort_values("entry_type")
    ns = merged["n_sessions"].to_numpy(np.int64)
    nb = merged["n_bounces"].to_numpy(np.int64)
    return rd.from_arrow(pa.table({
        "entry_type": pa.array(merged["entry_type"], pa.string()),
        "n_sessions": pa.array(ns, pa.int64()),
        "n_bounces": pa.array(nb, pa.int64()),
        "bounce_ppm": pa.array((1_000_000 * nb)
                               // np.maximum(ns, 1), pa.int64())}))
