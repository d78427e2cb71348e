"""Distributed column profiler (the data-quality "describe" pass).

A corpus ingest job profiles every table before training: row/null
counts and min/max per column catch schema drift, truncated loads,
and unit bugs before they poison a run. One scan, combiner pattern:
each batch collapses to ONE narrow row per column, the global
groupby merges ≤ columns × batches rows (Min/Max/Sum are associative
and null-skipping, so the merge is partitioning-invariant).

Numeric and temporal columns profile into ``min_num``/``max_num``
(timestamps as epoch-µs doubles — exact below 2⁵³); string columns
into lexicographic ``min_str``/``max_str``. The unused pair stays
NULL, keeping one uniform output schema for every column type.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["table_profile"]

_OUT = pa.schema([("column", pa.string()), ("n", pa.int64()),
                  ("n_nulls", pa.int64()), ("min_num", pa.float64()),
                  ("max_num", pa.float64()), ("min_str", pa.string()),
                  ("max_str", pa.string())])


def _empty() -> pa.Table:
    return pa.table({f.name: pa.array([], f.type) for f in _OUT})


def table_profile(ds: rd.Dataset, columns: list[str] | None = None
                  ) -> rd.Dataset:
    """(column, n, n_nulls, min_num, max_num, min_str, max_str)."""

    def partial(t: pa.Table) -> pa.Table:
        names, ns, nulls = [], [], []
        min_n, max_n, min_s, max_s = [], [], [], []
        cols = columns or t.schema.names
        for name in cols:
            col = t.column(name)
            names.append(name)
            ns.append(len(col))
            nulls.append(col.null_count)
            valid = col.drop_null()
            typ = col.type
            if pa.types.is_timestamp(typ):
                valid = valid.cast(pa.int64())
                typ = pa.int64()
            if (pa.types.is_integer(typ) or pa.types.is_floating(typ)) \
                    and len(valid):
                mm = pc.min_max(valid)
                min_n.append(float(mm["min"].as_py()))
                max_n.append(float(mm["max"].as_py()))
                min_s.append(None)
                max_s.append(None)
            elif pa.types.is_string(typ) and len(valid):
                mm = pc.min_max(valid)
                min_n.append(None)
                max_n.append(None)
                min_s.append(mm["min"].as_py())
                max_s.append(mm["max"].as_py())
            else:
                min_n.append(None)
                max_n.append(None)
                min_s.append(None)
                max_s.append(None)
        return pa.table({
            "column": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "n_nulls": pa.array(nulls, pa.int64()),
            "min_num": pa.array(min_n, pa.float64()),
            "max_num": pa.array(max_n, pa.float64()),
            "min_str": pa.array(min_s, pa.string()),
            "max_str": pa.array(max_s, pa.string()),
        })

    from ray.data.aggregate import Max, Min, Sum

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby("column").aggregate(
        Sum("n", alias_name="n"),
        Sum("n_nulls", alias_name="n_nulls"),
        Min("min_num", alias_name="min_num"),
        Max("max_num", alias_name="max_num"),
        Min("min_str", alias_name="min_str"),
        Max("max_str", alias_name="max_str"))

    def finish(t) -> pa.Table:
        t = t if isinstance(t, pa.Table) else \
            pa.Table.from_pandas(t, preserve_index=False)
        if not t.num_columns:
            return _empty()
        arrays = []
        for f in _OUT:
            col = t.column(f.name) if f.name in t.schema.names else \
                pa.nulls(t.num_rows, f.type)
            arrays.append(col.cast(f.type))
        return pa.Table.from_arrays(arrays, schema=_OUT)

    return agg.map_batches(finish, batch_format="pyarrow")
