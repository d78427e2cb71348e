"""Sitemap ↔ crawl-frontier reconciliation (per-host gap census).

The crawl-ops number every large crawl tracks: of each host's URL
universe, how much is in BOTH the sitemap and the crawl, how much is
sitemap-only (discovered, not yet fetched — frontier work) and how
much is crawl-only (fetched but unlisted — stale sitemaps / orphan
pages). Exact integer counts.

Scale shape: ONE (host, url) hash exchange merges the two presence
flags (sitemap side and crawl side each pre-reduced map-side), then
one narrow host-keyed aggregate sums the five counters — URL strings
shuffle once, payloads never.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["sitemap_gap"]


def sitemap_gap(sitemap_rows: rd.Dataset,
                crawl_rows: rd.Dataset, *,
                num_partitions: int | None = None) -> rd.Dataset:
    """(host, n_sitemap, n_crawled, n_both, n_sitemap_only,
    n_crawl_only) — inputs both carry (host, url) columns."""
    from ..scale import scale_partitions
    from ..stages.hashagg import hash_aggregate
    from .dedup import _to_arrow_blocks

    n_part = num_partitions or scale_partitions()

    def flag(which: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["host", "url"]].drop_duplicates().copy()
            out["in_sm"] = np.int64(1 if which == "sm" else 0)
            out["in_cr"] = np.int64(1 if which == "cr" else 0)
            return out
        return fn

    u = _to_arrow_blocks(
        sitemap_rows.map_batches(flag("sm"), batch_format="pandas")) \
        .union(_to_arrow_blocks(
            crawl_rows.map_batches(flag("cr"),
                                   batch_format="pandas")))

    def merge_flags(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["host", "url"], as_index=False).agg(
            in_sm=("in_sm", "max"), in_cr=("in_cr", "max"))

    per_url = hash_aggregate(u, ["host", "url"], merge_flags,
                             num_partitions=n_part)

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        if "n_sitemap" in df.columns:        # re-combine partials
            return df.groupby("host", as_index=False).sum(
                numeric_only=True)
        sm = df["in_sm"].to_numpy(np.int64)
        cr = df["in_cr"].to_numpy(np.int64)
        out = pd.DataFrame({
            "host": df["host"],
            "n_sitemap": sm, "n_crawled": cr,
            "n_both": sm & cr,
            "n_sitemap_only": sm & (1 - cr),
            "n_crawl_only": cr & (1 - sm)})
        return out.groupby("host", as_index=False).sum(
            numeric_only=True)

    out = hash_aggregate(per_url, ["host"], count_partial,
                         num_partitions=n_part)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["n_sitemap", "n_crawled", "n_both",
                "n_sitemap_only", "n_crawl_only"]
        if "host" not in df.columns:
            return pd.DataFrame(
                {"host": pd.Series([], dtype=object),
                 **{c: pd.Series([], dtype="int64") for c in cols}})
        for c in cols:
            df[c] = df[c].astype("int64")
        return df[["host"] + cols]

    return out.map_batches(finish, batch_format="pandas")
