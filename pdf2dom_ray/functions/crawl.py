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

import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["latest_capture"]


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
