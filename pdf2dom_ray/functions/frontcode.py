"""Per-host URL front-coding estimate (index storage planning).

URL dictionaries dominate a web index's metadata, and every
production term/URL dictionary front-codes them: store each sorted
key as (lcp with predecessor, suffix). Before building shards, the
planner wants the per-host compression estimate

    raw_bytes        = Σ len(url)
    frontcoded_bytes = Σ (len(url) − lcp(url, prev sorted url))

— pure integers from one in-group pass, and the ratio it implies
decides dictionary block sizes. Hosts whose URLs barely share
prefixes (random-token spam domains) also stand out immediately:
a LOW compression ratio on a large host is a template-free URL space,
the crawler-trap/spam smell url_templates hunts structurally.

Distributed shape: one hash exchange on host (the natural index
shard key — groups are per-host URL sets; the repo's standard skew
note: a pathological giant host would be range-split by URL prefix,
which front-coding is compatible with by construction), then a fully
VECTORIZED in-group pass: the sorted URLs become a fixed-width byte
matrix and every consecutive-pair lcp is one cumprod-of-equality row
sum — no per-pair Python loop. ASCII-safe byte semantics (URLs are
%-encoded ASCII by construction here; the SQL twin compares
substrings, identical for ASCII)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["host_frontcoding", "frontcoding_oracle_sql"]


def _lcp_sum(urls: np.ndarray) -> int:
    """Σ lcp(url_i, url_{i−1}) over the SORTED unique array."""
    if len(urls) < 2:
        return 0
    m = np.frombuffer(
        np.array(urls, dtype=bytes).astype("S").tobytes(),
        dtype=np.uint8).reshape(len(urls), -1)
    eq = (m[1:] == m[:-1]) & (m[1:] != 0)
    return int(np.cumprod(eq, axis=1).sum())


def host_frontcoding(urls: rd.Dataset, *, url_col: str = "url"
                     ) -> rd.Dataset:
    """(host, n_urls, raw_bytes, frontcoded_bytes) per host over the
    DISTINCT url set (duplicates are dictionary no-ops)."""
    from .modularity import _hosts

    def tag(t: pa.Table) -> pa.Table:
        u = np.asarray(t.column(url_col).to_pandas(), dtype=object)
        u = np.unique(u)
        return pa.table({
            "host": pa.array(_hosts(u).tolist(), pa.string()),
            "url": pa.array(u.tolist(), pa.string())})

    def per_host(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return pa.table({
                "host": pa.array([], pa.string()),
                "n_urls": pa.array([], pa.int64()),
                "raw_bytes": pa.array([], pa.int64()),
                "frontcoded_bytes": pa.array([], pa.int64())})
        out = []
        for host, grp in g.groupby("host", sort=False):
            u = np.unique(np.asarray(grp["url"], dtype=object))
            raw = int(sum(len(x) for x in u))
            fc = raw - _lcp_sum(u)
            out.append((host, len(u), raw, fc))
        return pa.table({
            "host": pa.array([o[0] for o in out], pa.string()),
            "n_urls": pa.array([o[1] for o in out], pa.int64()),
            "raw_bytes": pa.array([o[2] for o in out], pa.int64()),
            "frontcoded_bytes": pa.array([o[3] for o in out],
                                         pa.int64())})

    return urls.map_batches(tag, batch_format="pyarrow") \
        .groupby("host").map_groups(per_host, batch_format="pandas")


def frontcoding_oracle_sql(urls_cte: str, *,
                           url_col: str = "url") -> str:
    """LAG over sorted urls per host; lcp via the max prefix-k whose
    substrings agree (prefix equality is monotone in k; the series is
    capped at 512 because DuckDB's generate_series cannot take a
    lateral column bound — urls beyond 512 shared-prefix chars would
    under-count, far past any real URL)."""
    return f"""
        WITH u AS MATERIALIZED (
            SELECT DISTINCT {url_col} AS url
            FROM ({urls_cte})),
        h AS MATERIALIZED (
            SELECT regexp_extract(url, '://([^/]+)', 1) AS host, url
            FROM u),
        lagged AS MATERIALIZED (
            SELECT host, url,
                   lag(url) OVER (PARTITION BY host ORDER BY url)
                       AS prev
            FROM h),
        lcps AS MATERIALIZED (
            SELECT host, url,
                   CASE WHEN prev IS NULL THEN 0 ELSE
                   COALESCE((SELECT MAX(k)
                        FROM generate_series(1, 512) AS t(k)
                        WHERE k <= least(len(url), len(prev))
                          AND substr(url, 1, k) = substr(prev, 1, k)),
                        0) END AS lcp
            FROM lagged)
        SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
               CAST(SUM(len(url)) AS BIGINT) AS raw_bytes,
               CAST(SUM(len(url) - lcp) AS BIGINT)
                   AS frontcoded_bytes
        FROM lcps GROUP BY host"""
