"""SCD2 capture history: validity intervals over crawl snapshots.

The warehouse-side "slowly changing dimension type 2" merge, applied
to the web-archive shape: every (url, capture) becomes a row with
``valid_from`` = its capture time and ``valid_to`` = the NEXT capture
of the same url (NULL on the latest ⇒ ``is_current``). This is the
layout an incremental crawl store queries for "what did this page
look like at time T" (CDX temporal lookup) and the complement of
``crawl_latest`` (which keeps only the newest capture).

Scale shape: one narrow projection (url, warc_ts, version — the html
payload never enters the exchange) and ONE hash shuffle on url via
``groupby(url).map_groups``; per-group work is a tiny sort + shift
(captures per url are a handful even on real archives, and skew is
bounded by recrawl policy, not content). The driver holds nothing.

Determinism: intervals are closed-form per url; timestamps stay
microsecond integers end-to-end, so the DuckDB LEAD() twin is
bit-exact (pandas shift ↔ SQL LEAD over the same (ts, version)
order; ties cannot occur — capture times are distinct per url by
construction).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

__all__ = ["capture_history"]


def capture_history(snaps: rd.Dataset, *, key: str = "url",
                    ts: str = "warc_ts",
                    version_col: str = "version") -> rd.Dataset:
    """(url, version, valid_from, valid_to, is_current) — SCD2
    intervals per url from its capture sequence."""
    def intervals(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts, version_col]).reset_index(drop=True)
        nxt = g[ts].shift(-1)
        return pd.DataFrame({
            key: g[key],
            version_col: g[version_col],
            "valid_from": g[ts],
            "valid_to": nxt,
            "is_current": nxt.isna(),
        })

    return snaps.select_columns([key, ts, version_col]) \
        .groupby(key).map_groups(intervals, batch_format="pandas")
