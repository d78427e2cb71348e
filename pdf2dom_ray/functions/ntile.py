"""Distributed NTILE: exact global rank buckets WITHOUT a global sort.

``NTILE(k) OVER (ORDER BY value, id)`` assigns every row its bucket in
the global order — the shape behind length-bucketed training batches,
decile feature binning, and quota tiers. A naive implementation is an
all-to-all sort plus a zip-with-index; this one decomposes the global
rank exactly:

    rank(row) = (# rows with smaller value)        [base]
              + (# equal-value rows with smaller id)  [offset]

1. **base**: per-batch ``value_counts`` partials → one narrow groupby
   → a driver-side cumulative walk over the (value, count) histogram
   (same bounded-cardinality contract as ``percentiles.py``: driver
   state is O(distinct values), never O(rows)) → broadcast dict.
2. **offset**: ONE hash exchange on ``value`` co-locates ties; a
   per-partition mergesort + ``groupby(value).cumcount()`` is fully
   vectorized. Hot values are bounded by their own tie counts.
3. bucket = the exact SQL NTILE split (first ``n % k`` buckets get
   ``n // k + 1`` rows) applied to the 0-based rank — bit-identical
   to the window-function oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["ntile_buckets"]


def ntile_buckets(ds: rd.Dataset, *, value_col: str, id_col: str,
                  k: int = 10, num_partitions: int | None = None) -> rd.Dataset:
    """(id, value, bucket): exact NTILE(k) over (value, id) order."""
    from ..scale import scale_partitions
    num_partitions = num_partitions or scale_partitions()
    narrow = ds.select_columns([id_col, value_col]).materialize()
    # materialized: the histogram pass and the rank pass both consume
    # it — without this the upstream scan executes twice

    def hist_partial(t: pa.Table) -> pa.Table:
        vc = t.column(value_col).value_counts()
        return pa.table({"v": vc.field("values").cast(pa.int64()),
                         "c": vc.field("counts").cast(pa.int64())})

    hist = (narrow.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("c", alias_name="c"))
            .to_pandas().sort_values("v"))
    counts = hist["c"].to_numpy(np.int64)
    values = hist["v"].to_numpy(np.int64)
    base = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n = int(counts.sum())
    base_ref = ray.put(dict(zip(values.tolist(), base.tolist())))

    q, r = divmod(n, k)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[value_col], index=False)
        return df.assign(__part=(h % num_partitions).astype("int64"))

    def per_partition(g: pd.DataFrame) -> pa.Table:
        base_map = ray.get(base_ref)
        g = g.sort_values([value_col, id_col], kind="mergesort")
        offset = g.groupby(value_col, sort=False).cumcount() \
            .to_numpy(np.int64)
        vals = g[value_col].to_numpy(np.int64)
        rank0 = np.array([base_map[v] for v in vals.tolist()],
                         dtype=np.int64) + offset
        if q == 0:
            bucket = rank0 + 1
        else:
            big = r * (q + 1)
            bucket = np.where(rank0 < big, rank0 // (q + 1) + 1,
                              r + (rank0 - big) // max(q, 1) + 1)
        return pa.table({
            id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
            value_col: pa.array(vals, pa.int64()),
            "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
        })

    return (narrow.map_batches(tag, batch_format="pandas")
            .groupby("__part")
            .map_groups(per_partition, batch_format="pandas"))
