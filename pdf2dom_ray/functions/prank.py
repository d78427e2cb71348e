"""Per-slice percentile-rank calibration (sort-free, exact integer).

Quality/score columns from different sources are not comparable —
"0.8 from source A" may be mediocre while "0.6 from source B" is its
best decile. The standard fix before cross-source thresholding or
mixing is QUANTILE NORMALIZATION: replace each row's score with its
within-slice percentile rank. SQL's PERCENT_RANK() is (rank−1)/(n−1)
— a float; the integer twin used here is

    pr_ppm = (1e6 · (rank − 1)) // (n − 1)        (0 when n = 1)

with competition rank (= SQL RANK()), so both engines agree bit-for-
bit (CLAUDE.md invariant).

Sort-free distributed shape (the rankcorr.py identity, keyed):
rank(v) = 1 + |{value < v}| within the slice is a pure function of
the per-(key, value) HISTOGRAM — one narrow groupby, a driver
prefix-sum per key, and a segmented broadcast (concatenated sorted
value arrays + per-key offsets probed by two searchsorteds). One
map_batches pass attaches pr_ppm to every row — the row table itself
never shuffles. O(Σ per-key distinct values) driver/broadcast state;
quantize the metric first at 1e12-row scale (same prescription as
rankcorr.py / kstest.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["percentile_rank", "percentile_rank_oracle_sql"]


def percentile_rank(ds: rd.Dataset, *, key_col: str = "source",
                    value_col: str = "n_chars",
                    id_col: str = "doc_id") -> rd.Dataset:
    """(id, key, value, pr_ppm) per input row: the row's within-key
    percentile rank of ``value_col`` in exact ppm."""
    from .dedup import _to_arrow_blocks

    ds = ds.materialize()           # consumed twice (hist + attach)

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "key": np.asarray(t.column(key_col).to_pandas(),
                              dtype=object),
            "v": t.column(value_col).to_numpy()}) \
            .groupby(["key", "v"], as_index=False).size()
        return pa.table({
            "key": pa.array(g["key"].tolist(), pa.string()),
            "v": pa.array(g["v"].to_numpy(np.int64), pa.int64()),
            "c": pa.array(g["size"].to_numpy(np.int64), pa.int64())})

    hist = _to_arrow_blocks(
        ds.map_batches(hist_partial, batch_format="pyarrow")
          .groupby(["key", "v"])
          .aggregate(Sum("c", alias_name="c"))).to_pandas()
    if not len(hist):
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            key_col: pa.array([], pa.string()),
            value_col: pa.array([], pa.int64()),
            "pr_ppm": pa.array([], pa.int64())}))

    hist = hist.sort_values(["key", "v"])
    keys_u, seg_start = np.unique(
        np.asarray(hist["key"], dtype=object), return_index=True)
    offsets = np.append(seg_start, len(hist)).astype(np.int64)
    vals = hist["v"].to_numpy(np.int64)
    cnts = hist["c"].to_numpy(np.int64)
    cum_before = np.empty(len(hist), dtype=np.int64)
    ns = np.empty(len(keys_u), dtype=np.int64)
    for i in range(len(keys_u)):
        lo, hi = offsets[i], offsets[i + 1]
        cs = np.cumsum(cnts[lo:hi])
        cum_before[lo:hi] = cs - cnts[lo:hi]
        ns[i] = cs[-1]
    bc = ray.put((keys_u, offsets, vals, cum_before, ns))

    def attach(t: pa.Table) -> pa.Table:
        keys_u_, offsets_, vals_, cum_, ns_ = ray.get(bc)
        k = np.asarray(t.column(key_col).to_pandas(), dtype=object)
        v = t.column(value_col).to_numpy()
        ki = np.searchsorted(keys_u_, k)
        pr = np.zeros(len(v), dtype=np.int64)
        for i in np.unique(ki):
            lo, hi = offsets_[i], offsets_[i + 1]
            rows = ki == i
            pos = lo + np.searchsorted(vals_[lo:hi], v[rows])
            n = ns_[i]
            pr[rows] = (1_000_000 * cum_[pos]) // (n - 1) \
                if n > 1 else 0
        return pa.table({
            id_col: t.column(id_col),
            key_col: t.column(key_col),
            value_col: pa.array(v, pa.int64()),
            "pr_ppm": pa.array(pr, pa.int64())})

    return ds.map_batches(attach, batch_format="pyarrow")


def percentile_rank_oracle_sql(rows_cte: str, *,
                               key_col: str = "source",
                               value_col: str = "n_chars",
                               id_col: str = "doc_id") -> str:
    """Window RANK()/COUNT() twin of the integer percentile rank."""
    return f"""
        WITH rows_in AS MATERIALIZED ({rows_cte})
        SELECT {id_col}, {key_col},
               CAST({value_col} AS BIGINT) AS {value_col},
               CAST(CASE WHEN COUNT(*) OVER w = 1 THEN 0
                    ELSE (1000000 * (RANK() OVER (PARTITION BY
                              {key_col} ORDER BY {value_col}) - 1))
                         // (COUNT(*) OVER w - 1)
                    END AS BIGINT) AS pr_ppm
        FROM rows_in
        WINDOW w AS (PARTITION BY {key_col})"""
