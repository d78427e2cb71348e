"""Hash-partitioned aggregation for high-cardinality keys.

Ray Data's built-in ``groupby().aggregate()`` sort-shuffles on the raw
key tuple; with ~10^5+ nearly-unique composite keys the sort-based
aggregate becomes pathologically slow (measured: 500 CPU-seconds for
95k (user, hour) rows). This helper implements the classic
hash-shuffle aggregate with cheap primitives:

1. vectorized per-batch pandas combiner (caller-provided),
2. a small int partition column ``hash(key) % P`` (vectorized
   ``pd.util.hash_pandas_object`` over the key columns),
3. ``groupby(part).map_groups`` — sorting P distinct small ints is
   near-free — with a pandas merge per partition.

The partition count bounds per-task memory (keys/P per task) and is
the knob for scale; skewed key distributions are immune because the
partition key is a hash.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

__all__ = ["hash_aggregate"]


def hash_aggregate(ds: rd.Dataset, keys: list[str],
                   combine: "callable[[pd.DataFrame], pd.DataFrame]",
                   num_partitions: int | None = None) -> rd.Dataset:
    """``combine`` must be a per-frame pandas groupby-reduce that is
    idempotent under re-application (sum-of-sums etc.). It is applied
    once per input batch (combiner) and once per hash partition
    (merge). ``num_partitions`` defaults to the cluster-derived value
    (``scale.scale_partitions``)."""
    if num_partitions is None:
        from ..scale import scale_partitions
        num_partitions = scale_partitions()

    def local(df: pd.DataFrame) -> pd.DataFrame:
        out = combine(df)
        h = pd.util.hash_pandas_object(out[keys], index=False)
        out["__part"] = (h % num_partitions).astype("int64").to_numpy()
        return out

    partials = ds.map_batches(local, batch_format="pandas")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return combine(group.drop(columns="__part"))

    return partials.groupby("__part").map_groups(merge,
                                                 batch_format="pandas")
