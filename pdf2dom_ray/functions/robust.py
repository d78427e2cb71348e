"""Robust per-slice outlier rates (integer median / MAD).

Mean-and-stddev outlier rules break on exactly the data they should
flag (the outliers drag the mean); the robust standard is the
median/MAD rule — flag x when |x − median| > k·MAD (Iglewicz &
Hoaglin's modified z-score, k ≈ 3..5 on the raw MAD). Both statistics
here are the LOWER-median SELECTION

    med = smallest v with cum_count(v) ≥ (n + 1) // 2

(a pure integer pick — SQL's interpolating median() is a float and
would flake the hash; the same selection applied to |x − med| gives
the MAD), so the whole operator is exact int64:

    (key, n_rows, med, mad, n_outliers)   with the k·MAD test
    |x − med| > k · mad  evaluated in integers.

Distributed shape (the rankcorr/prank histogram identity, per
slice): ONE narrow (key, value) histogram exchange; the driver
prefix-scans each slice's sorted histogram TWICE (once for med, once
over the folded |x−med| histogram — derivable from the same
histogram without touching rows again); outlier counts are another
pure histogram read. The row table never shuffles and is scanned
exactly once. Quantize-at-1e12-rows prescription shared with
rankcorr/kstest/prank."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["robust_outliers", "robust_oracle_sql"]


def _lower_median(vals: np.ndarray, cnts: np.ndarray) -> int:
    """Smallest v with cumulative count ≥ (n+1)//2 over the SORTED
    histogram."""
    cum = np.cumsum(cnts)
    need = (int(cum[-1]) + 1) // 2
    return int(vals[np.searchsorted(cum, need)])


def robust_outliers(ds: rd.Dataset, *, key_col: str = "source",
                    value_col: str = "n_chars",
                    k: int = 4) -> rd.Dataset:
    """(key, n_rows, med, mad, n_outliers) per slice: lower-median,
    MAD from the folded histogram, and the |x−med| > k·mad count."""
    from .dedup import _to_arrow_blocks

    def partial(t: pa.Table) -> pa.Table:
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
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["key", "v"])
          .aggregate(Sum("c", alias_name="c"))).to_pandas()
    out = {"key": [], "n_rows": [], "med": [], "mad": [],
           "n_outliers": []}
    if len(hist):
        hist = hist.sort_values(["key", "v"])
        for key, g in hist.groupby("key", sort=True):
            vals = g["v"].to_numpy(np.int64)
            cnts = g["c"].to_numpy(np.int64)
            med = _lower_median(vals, cnts)
            dev = np.abs(vals - med)
            order = np.argsort(dev, kind="stable")
            mad = _lower_median(dev[order], cnts[order])
            n_out = int(cnts[dev > k * mad].sum())
            out["key"].append(key)
            out["n_rows"].append(int(cnts.sum()))
            out["med"].append(med)
            out["mad"].append(mad)
            out["n_outliers"].append(n_out)
    return rd.from_arrow(pa.table({
        "key": pa.array(out["key"], pa.string()),
        "n_rows": pa.array(out["n_rows"], pa.int64()),
        "med": pa.array(out["med"], pa.int64()),
        "mad": pa.array(out["mad"], pa.int64()),
        "n_outliers": pa.array(out["n_outliers"], pa.int64())}))


def robust_oracle_sql(rows_cte: str, *, key_col: str = "source",
                      value_col: str = "n_chars",
                      k: int = 4) -> str:
    """The same lower-median selections via window cumulative counts
    (two levels: med over v, mad over |v − med|)."""
    return f"""
        WITH m AS MATERIALIZED (
            SELECT {key_col} AS key, CAST({value_col} AS BIGINT) AS v
            FROM ({rows_cte})),
        tot AS MATERIALIZED (
            SELECT key, CAST(count(*) AS BIGINT) AS n
            FROM m GROUP BY 1),
        med AS MATERIALIZED (
            SELECT key, MIN(v) AS med FROM (
                SELECT m.key, m.v,
                       count(*) OVER (PARTITION BY m.key
                                      ORDER BY m.v) AS cum,
                       tot.n
                FROM m JOIN tot USING (key))
            WHERE cum >= (n + 1) // 2 GROUP BY key),
        dev AS MATERIALIZED (
            SELECT m.key, abs(m.v - med.med) AS d
            FROM m JOIN med USING (key)),
        mad AS MATERIALIZED (
            SELECT key, MIN(d) AS mad FROM (
                SELECT dev.key, dev.d,
                       count(*) OVER (PARTITION BY dev.key
                                      ORDER BY dev.d) AS cum,
                       tot.n
                FROM dev JOIN tot USING (key))
            WHERE cum >= (n + 1) // 2 GROUP BY key)
        SELECT tot.key, tot.n AS n_rows,
               CAST(med.med AS BIGINT) AS med,
               CAST(mad.mad AS BIGINT) AS mad,
               CAST((SELECT count(*) FROM m
                     WHERE m.key = tot.key
                       AND abs(m.v - med.med) > {k} * mad.mad)
                    AS BIGINT) AS n_outliers
        FROM tot JOIN med USING (key) JOIN mad USING (key)"""
