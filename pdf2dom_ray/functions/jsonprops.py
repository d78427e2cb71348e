"""Semi-structured property-column extraction (JSON metadata stats).

Web-scale event/crawl tables carry a free-form JSON properties
column (here ``events.props``); the everyday operator is "extract a
typed field and aggregate it" without a per-row json.loads. The
extraction is a VECTORIZED Arrow regex capture
(``pc.extract_regex`` — one C pass per batch, no Python loop), which
for flat numeric fields is exactly what a tuned engine does before
reaching for a full JSON parser; rows where the field is absent or
non-numeric fall out as NULL → dropped, mirroring SQL
``json_extract`` semantics for the histogram.

Scale shape: per-batch (value-bucket, count, sum) partials →
per-block fold → driver fold over O(buckets·blocks) rows; all int64.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["json_field_agg", "props_field_histogram",
           "props_field_histogram_sql"]


def props_field_histogram(sf_dir: str, *, field: str = "k",
                          bucket_width: int = 10) -> rd.Dataset:
    """(bucket_lo, n_events, sum_value) histogram of the integer
    JSON field ``props.$field`` over events, bucketed by
    ``bucket_width`` (bucket_lo = floor(v/width)·width)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["props"])
    pat = '"' + field + '"\\s*:\\s*(?P<v>-?[0-9]+)'

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        m = pc.extract_regex(col, pat)
        v = pc.struct_field(m, "v")
        valid = pc.is_valid(v)
        vals = pd.to_numeric(
            pd.Series(v.filter(valid).to_pylist())).to_numpy(
            np.int64) if valid.true_count else \
            np.empty(0, np.int64)
        lo = np.floor_divide(vals, bucket_width) * bucket_width
        df = pd.DataFrame({"bucket_lo": lo,
                           "n_events": np.ones(len(lo), np.int64),
                           "sum_value": vals})
        g = df.groupby("bucket_lo", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold_block(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            t.to_pandas().groupby("bucket_lo", as_index=False).sum(),
            preserve_index=False)

    from .fold import bounded_fold_tables
    parts = ds.map_batches(partial, batch_format="pyarrow")
    tables = bounded_fold_tables(parts, fold_block)
    if not tables:
        return rd.from_arrow(pa.table({
            "bucket_lo": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "sum_value": pa.array([], pa.int64())}))
    schema = pa.schema([("bucket_lo", pa.int64()),
                        ("n_events", pa.int64()),
                        ("sum_value", pa.int64())])
    merged = pa.concat_tables([t.cast(schema) for t in tables]) \
        .to_pandas().groupby("bucket_lo", as_index=False).sum() \
        .sort_values("bucket_lo")
    return rd.from_arrow(pa.Table.from_pandas(merged,
                                              preserve_index=False))


def props_field_histogram_sql(field: str = "k",
                              bucket_width: int = 10) -> str:
    """DuckDB twin via json_extract. Negative values route through
    CASE so the integer division floors like numpy (CLAUDE.md:
    DuckDB // truncates toward zero on negative numerators)."""
    return f"""
        WITH v AS (
          SELECT CAST(json_extract(props, '$.{field}') AS BIGINT)
                     AS val
          FROM events
          WHERE json_extract(props, '$.{field}') IS NOT NULL),
        b AS (
          SELECT CASE WHEN val >= 0
                      THEN (val // {bucket_width}) * {bucket_width}
                      ELSE -((-val + {bucket_width} - 1)
                             // {bucket_width}) * {bucket_width}
                 END AS bucket_lo,
                 val
          FROM v)
        SELECT CAST(bucket_lo AS BIGINT) AS bucket_lo,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(val) AS BIGINT) AS sum_value
        FROM b GROUP BY 1 ORDER BY 1
    """


def json_field_agg(ds: rd.Dataset, *, props_col: str = "props",
                   group_col: str = "event_type",
                   field: str = "k") -> rd.Dataset:
    """Per-group count + int64 sum of a JSON field.

    Rows with missing/unparseable props or a non-int field count
    toward ``n_events`` but contribute 0 to ``sum_k`` (and are
    tallied in ``n_bad``)."""

    def partial(t: pa.Table) -> pa.Table:
        groups = t.column(group_col).to_pylist()
        props = t.column(props_col).to_pylist()
        acc: dict[str, list[int]] = {}
        for g, p in zip(groups, props):
            row = acc.setdefault(g, [0, 0, 0])
            row[0] += 1
            try:
                v = json.loads(p)[field]
                if isinstance(v, bool) or not isinstance(v, int):
                    raise TypeError
                row[1] += v
            except (TypeError, ValueError, KeyError):
                row[2] += 1
        ks = sorted(acc)
        return pa.table({
            group_col: pa.array(ks, pa.string()),
            "n_events": pa.array([acc[k][0] for k in ks], pa.int64()),
            "sum_k": pa.array([acc[k][1] for k in ks], pa.int64()),
            "n_bad": pa.array([acc[k][2] for k in ks], pa.int64()),
        })

    parts = ds.select_columns([group_col, props_col]).map_batches(
        partial, batch_format="pyarrow")
    agg = parts.groupby(group_col).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_k", alias_name="sum_k"),
        Sum("n_bad", alias_name="n_bad"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            group_col: t.column(group_col),
            "n_events": t.column("n_events").cast(pa.int64()),
            "sum_k": t.column("sum_k").cast(pa.int64()),
            "n_bad": t.column("n_bad").cast(pa.int64()),
        })
    return agg.map_batches(finish, batch_format="pyarrow")
