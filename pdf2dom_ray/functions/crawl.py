"""Crawl-snapshot operators: latest-capture-wins dedup.

Real crawl corpora contain many captures of the same URL across
snapshots; training pipelines keep the newest (the CDX-dedup /
"latest wins" rule). Semantics: for each ``key`` keep exactly the row
with the maximum ``ts`` (ties broken by a caller-named tiebreak column
so the result is deterministic), plus a capture count.

Scale shape: one payload shuffle is unavoidable (the newest capture
of a URL can live in any shard), but a per-batch combiner first drops
every non-newest capture *within* each batch — in real layouts
captures of a URL cluster inside a crawl's files, so most duplicate
payloads die before the exchange. The shuffle then moves surviving
candidates only, and a per-group argmax finishes. n_captures is
summed across partials, so it counts all captures, not survivors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["latest_capture", "stale_urls", "snapshot_diff"]


def latest_capture(ds: rd.Dataset, *, key: str = "url",
                   ts: str = "warc_ts",
                   tiebreak: str | None = None) -> rd.Dataset:
    """Keep the newest capture per key; adds ``n_captures``.

    Output schema = input schema + ``n_captures`` (int64).
    """
    sort_cols = [key, ts] + ([tiebreak] if tiebreak else [])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if "n_captures" in df.columns:      # re-combining partial rows
            counts = df.groupby(key, sort=False)["n_captures"].sum()
            df = df.drop(columns=["n_captures"])
        else:
            counts = df.groupby(key, sort=False).size()
        df = df.sort_values(sort_cols).drop_duplicates(key, keep="last")
        return df.assign(n_captures=df[key].map(counts).astype("int64"))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        total = int(g["n_captures"].sum())
        g = g.sort_values(sort_cols)
        out = g.tail(1).copy()
        out["n_captures"] = total
        return out

    parts = ds.map_batches(partial, batch_format="pandas")
    out = parts.groupby(key).map_groups(final, batch_format="pandas")
    return out.map_batches(lambda t: t, batch_format="pyarrow")


def stale_urls(ds: rd.Dataset, *, key: str = "url",
               ts: str = "warc_ts", version_col: str = "version",
               latest: int = 1,
               broadcast_limit: int = 2_000_000) -> rd.Dataset:
    """(url, last_ts): URLs captured in older snapshots but absent
    from the latest one — the recrawl-scheduler's work list.

    Scale shape: both sides reduce to narrow per-batch distinct
    partials first (old side keeps the max old-capture ts per key, the
    latest side just distinct keys). When the latest snapshot's key
    set fits ``broadcast_limit`` it is shipped ONCE via ``ray.put``
    and absence is a per-batch set probe applied BEFORE the old side's
    groupby — the anti-join exchange disappears and the groupby
    shrinks to the truly-stale keys. Beyond the limit, ONE
    hash-partitioned ``left_anti`` join decides absence — the
    set-difference the Dataset API has natively; no payload ever
    enters either exchange.
    """
    import pyarrow as pa_
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    from .dedup import _to_arrow_blocks

    def old_partial(t: pa_.Table) -> pa_.Table:
        t = t.filter(pc.less(t.column(version_col), latest))
        df = t.select([key, ts]).to_pandas()
        g = df.groupby(key, as_index=False)[ts].max()
        return pa_.Table.from_pandas(g, preserve_index=False)

    def new_partial(t: pa_.Table) -> pa_.Table:
        t = t.filter(pc.equal(t.column(version_col), latest))
        col = t.column(key)
        if isinstance(col, pa_.ChunkedArray):
            col = col.combine_chunks()
        return pa_.table({"latest_key": pc.unique(col)})

    narrow = ds.select_columns([key, ts, version_col]).materialize()
    sch = narrow.schema()
    ts_type = sch.types[sch.names.index(ts)]
    key_type = sch.types[sch.names.index(key)]

    def fix_empty(t: pa_.Table) -> pa_.Table:
        # empty groupby outputs can be schema-less (CLAUDE.md Arrow
        # gaps) and a schema-less block poisons the join's hash
        # partitioning — give empties the real schema
        if not t.num_columns:
            return pa_.table({key: pa_.array([], key_type),
                              "last_ts": pa_.array([], ts_type)})
        return t

    new = narrow.map_batches(new_partial,
                             batch_format="pyarrow").materialize()

    def finish(t: pa_.Table) -> pa_.Table:
        if not t.num_columns:
            return pa_.table({key: pa_.array([], key_type),
                              "last_ts": pa_.array([], ts_type)})
        return t.select([key, "last_ts"])

    # Ray's hash join rejects 0-row right-side blocks ("no match for
    # key field"): even-repartition the narrow key set so every block
    # is non-empty, and short-circuit an empty latest snapshot (the
    # anti-join would keep everything anyway)
    n_new = new.count()

    if 0 < n_new <= broadcast_limit:
        import ray as ray_
        latest_keys = frozenset(
            new.to_pandas()["latest_key"].to_numpy(dtype=object))
        keys_ref = ray_.put(latest_keys)

        def drop_latest(t: pa_.Table) -> pa_.Table:
            if not t.num_rows:
                return t
            ks = ray_.get(keys_ref)
            col = t.column(key).to_numpy(zero_copy_only=False)
            mask = np.fromiter((k not in ks for k in col),
                               dtype=bool, count=len(col))
            return t.filter(pa_.array(mask))

        stale = _to_arrow_blocks(
            narrow.map_batches(old_partial, batch_format="pyarrow")
            .map_batches(drop_latest, batch_format="pyarrow")
            .groupby(key).aggregate(Max(ts, alias_name="last_ts"))) \
            .map_batches(fix_empty, batch_format="pyarrow")
        return stale.map_batches(finish, batch_format="pyarrow")

    old = _to_arrow_blocks(
        narrow.map_batches(old_partial, batch_format="pyarrow")
        .groupby(key).aggregate(Max(ts, alias_name="last_ts"))) \
        .map_batches(fix_empty, batch_format="pyarrow")
    if n_new == 0:
        return old.map_batches(finish, batch_format="pyarrow")
    from ..scale import scale_partitions
    n_part = scale_partitions()
    new = new.repartition(min(n_part, n_new))
    from .dedup import join_ready
    old = join_ready(old, n_part)     # left side too: groupby output
    out = old.join(new, join_type="left_anti",
                   num_partitions=n_part,
                   on=(key,), right_on=("latest_key",))
    return out.map_batches(finish, batch_format="pyarrow")


def snapshot_diff(old: rd.Dataset, new: rd.Dataset, *, key: str = "url",
                  fp: str = "fp") -> rd.Dataset:
    """(key, status): classify every URL across two crawl snapshots —
    ``added`` (new only), ``removed`` (old only), ``changed`` (both,
    different content fingerprint), ``same`` — the incremental-crawl
    delta a recrawl scheduler and a training-data refresher consume.

    Scale shape: both snapshots reduce map-side to ONE narrow
    (key, fp) row per key (payloads hash to fingerprints before any
    exchange), then a single hash-partitioned ``full_outer`` join —
    the only join type that can see all three presence classes at
    once — and a vectorized per-row classifier. Assumes one capture
    per key per snapshot (run ``latest_capture`` first otherwise).
    """
    import numpy as np
    import ray

    from ..scale import scale_partitions
    n_part = scale_partitions()

    def narrow(ds: rd.Dataset, fp_out: str) -> rd.Dataset:
        return ds.map_batches(
            lambda t: pa.table({key: t.column(key),
                                fp_out: t.column(fp).cast(pa.string())}),
            batch_format="pyarrow").materialize()

    o = narrow(old, "old_fp")
    n = narrow(new, "new_fp")
    n_old, n_new = o.count(), n.count()

    def classify(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        names = t.schema.names
        k_old = t.column(key) if key in names else \
            pa.nulls(t.num_rows, pa.string())
        k_new = t.column(f"{key}_1") if f"{key}_1" in names else \
            pa.nulls(t.num_rows, pa.string())
        ofp = t.column("old_fp") if "old_fp" in names else \
            pa.nulls(t.num_rows, pa.string())
        nfp = t.column("new_fp") if "new_fp" in names else \
            pa.nulls(t.num_rows, pa.string())
        url = pc.coalesce(k_old, k_new)
        o_null = pc.is_null(ofp).to_numpy(zero_copy_only=False)
        n_null = pc.is_null(nfp).to_numpy(zero_copy_only=False)
        eq = pc.equal(ofp, nfp).to_numpy(zero_copy_only=False)
        eq = np.where(o_null | n_null, False, eq)
        status = np.where(o_null, "added",
                          np.where(n_null, "removed",
                                   np.where(eq, "same", "changed")))
        return pa.table({key: url.cast(pa.string()),
                         "status": pa.array(status, pa.string())})

    if n_old == 0 and n_new == 0:
        return rd.from_arrow(pa.table({key: pa.array([], pa.string()),
                                       "status": pa.array([], pa.string())}))
    if n_old == 0:
        return n.map_batches(
            lambda t: pa.table({key: t.column(key),
                                "status": pa.array(["added"] * t.num_rows,
                                                   pa.string())}),
            batch_format="pyarrow")
    if n_new == 0:
        return o.map_batches(
            lambda t: pa.table({key: t.column(key),
                                "status": pa.array(["removed"] * t.num_rows,
                                                   pa.string())}),
            batch_format="pyarrow")

    # hash join rejects 0-row blocks on either side — even-repartition
    o = o.repartition(min(n_part, n_old))
    n = n.repartition(min(n_part, n_new))
    joined = o.join(n, join_type="full_outer", num_partitions=n_part,
                    on=(key,), right_on=(key,))
    return joined.map_batches(classify, batch_format="pyarrow")
