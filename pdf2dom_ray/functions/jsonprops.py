"""Semi-structured (JSON) property extraction + aggregation.

Event streams carry a free-form JSON properties column; the standard
pipeline primitive is "extract typed fields, then aggregate" without
ever materializing the parsed objects. Shape: per-batch parse +
partial aggregate (narrow (group, n, sum) rows), one small groupby —
the JSON strings never shuffle.

Parsing is ``json.loads`` per row inside the batch (a narrow column;
real engines vectorize this with simdjson — the Ray-side structure is
identical either way). Extracted numerics are aggregated as int64 so
the distributed sum is order-independent and the DuckDB
``json_extract`` oracle matches exactly.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["json_field_agg"]


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
