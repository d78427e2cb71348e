"""Grouped top-k: the best k rows per group (corpus curation's "keep
the k best documents per language/domain" selector).

Combiner shape: each input batch is cut to its own per-group top-k
first (a batch can contribute at most k rows per group it contains),
so the exchange moves ≤ k × groups-per-batch narrow rows, never the
raw table; the final per-group cut + rank runs inside one
``groupby(key).map_groups`` over those bounded partials. Top-k is
idempotent under union (top-k of a union of per-batch top-ks equals
the global top-k), which is what makes the partial cut safe.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["grouped_topk"]


def grouped_topk(ds: rd.Dataset, group_key: str, sort_cols: list[str],
                 ascending: list[bool], k: int) -> rd.Dataset:
    """Top ``k`` rows per ``group_key`` ordered by ``sort_cols``; the
    output carries an int64 ``rank`` column (1-based within group).
    ``sort_cols`` must totally order rows within a group (include a
    unique tie-break column) or the rank is not deterministic."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(sort_cols, ascending=ascending,
                               kind="mergesort")
                  .groupby(group_key, sort=False).head(k))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=ascending,
                          kind="mergesort").head(k)
        return g.assign(rank=pd.RangeIndex(1, len(g) + 1))

    def to_arrow(df: pd.DataFrame) -> pa.Table:
        df["rank"] = df["rank"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pandas")
              .groupby(group_key)
              .map_groups(final, batch_format="pandas")
              .map_batches(to_arrow, batch_format="pandas"))
