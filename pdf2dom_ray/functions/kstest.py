"""Pairwise two-sample Kolmogorov–Smirnov distance on an integer
metric column, exact via histogram CDFs.

The ORDERED complement of ``divergence.py``'s total variation: TV
treats values as unordered symbols, so a length distribution that
shifted by +5% barely moves it; the KS statistic

    D(a, b) = max_v |CDF_a(v) − CDF_b(v)|

is exactly the drift detector distribution-shift monitors threshold
on ("did this crawl's doc-length / quality-score distribution move?").
Put over the common denominator N_a·N_b it is pure integers:

    D_num(a, b) = max_v |cum_a(v)·N_b − cum_b(v)·N_a|
    ks_ppm      = (1e6 · D_num) // (N_a · N_b)

— no floats anywhere (the CLAUDE.md invariant), and the max over v
only needs the MERGED distinct values of the pair, since CDFs are
step functions that change only at observed values. cum·N products
must stay < 2^63: fine to ~3e9 rows per slice pair.

Distributed shape: ONE narrow (source, value) histogram exchange
(batch-local combiners first — rows collapse to distinct values per
batch), then the driver prefix-scans each source's sorted histogram
and evaluates every pair on the merged value grid — O(S · distinct
values) driver work, no second exchange at all (the pair loop is
arithmetic over already-reduced histograms, not data). At 1e12 rows
quantize the metric first (bucketed CDFs bound the histogram), the
same prescription as ``rankcorr.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["ks_pairwise", "ks_oracle_sql"]


def ks_pairwise(ds: rd.Dataset, *, value_col: str = "v",
                key_col: str = "source") -> rd.Dataset:
    """(source_a, source_b, d_num, n_a, n_b, ks_ppm) for every
    unordered source pair (a < b): the exact KS distance between the
    two slices' ``value_col`` distributions."""
    from .dedup import _to_arrow_blocks

    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": np.asarray(t.column(key_col).to_pandas(),
                                 dtype=object),
            "v": t.column(value_col).to_numpy()})
        g = df.groupby(["source", "v"], as_index=False).size()
        return pa.table({
            "source": pa.array(g["source"].tolist(), pa.string()),
            "v": pa.array(g["v"].to_numpy(np.int64), pa.int64()),
            "c": pa.array(g["size"].to_numpy(np.int64), pa.int64())})

    hist = _to_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["source", "v"])
          .aggregate(Sum("c", alias_name="c"))).to_pandas()

    out = {"source_a": [], "source_b": [], "d_num": [],
           "n_a": [], "n_b": [], "ks_ppm": []}
    if len(hist):
        srcs = sorted(hist["source"].unique().tolist())
        per = {}
        for s in srcs:
            h = hist[hist["source"] == s].sort_values("v")
            vals = h["v"].to_numpy(np.int64)
            cum = np.cumsum(h["c"].to_numpy(np.int64))
            per[s] = (vals, cum, int(cum[-1]))
        for i, a in enumerate(srcs):
            va, ca, na = per[a]
            for b in srcs[i + 1:]:
                vb, cb, nb = per[b]
                grid = np.union1d(va, vb)
                # CDF value at v = cum count of last value ≤ v
                ia = np.searchsorted(va, grid, side="right") - 1
                ib = np.searchsorted(vb, grid, side="right") - 1
                cum_a = np.where(ia >= 0, ca[ia], 0)
                cum_b = np.where(ib >= 0, cb[ib], 0)
                d = int(np.abs(cum_a * nb - cum_b * na).max())
                out["source_a"].append(a)
                out["source_b"].append(b)
                out["d_num"].append(d)
                out["n_a"].append(na)
                out["n_b"].append(nb)
                out["ks_ppm"].append((1_000_000 * d) // (na * nb))
    return rd.from_arrow(pa.table({
        "source_a": pa.array(out["source_a"], pa.string()),
        "source_b": pa.array(out["source_b"], pa.string()),
        "d_num": pa.array(out["d_num"], pa.int64()),
        "n_a": pa.array(out["n_a"], pa.int64()),
        "n_b": pa.array(out["n_b"], pa.int64()),
        "ks_ppm": pa.array(out["ks_ppm"], pa.int64())}))


def ks_oracle_sql(metrics_cte: str, *, value_col: str = "v",
                  key_col: str = "source") -> str:
    """The same integer KS arithmetic in DuckDB: per-source histogram
    → windowed running CDF evaluated on the merged value grid per
    pair → MAX |cross-multiplied difference|."""
    return f"""
        WITH m AS MATERIALIZED (
            SELECT {key_col} AS source, CAST({value_col} AS BIGINT)
                   AS v FROM ({metrics_cte})),
        hist AS MATERIALIZED (
            SELECT source, v, CAST(count(*) AS BIGINT) AS c
            FROM m GROUP BY 1, 2),
        tot AS MATERIALIZED (
            SELECT source, CAST(SUM(c) AS BIGINT) AS n
            FROM hist GROUP BY 1),
        pairs AS MATERIALIZED (
            SELECT a.source AS sa, a.n AS na,
                   b.source AS sb, b.n AS nb
            FROM tot a JOIN tot b ON a.source < b.source),
        grid AS MATERIALIZED (
            SELECT p.sa, p.sb, p.na, p.nb, h.v
            FROM pairs p JOIN (SELECT DISTINCT source, v
                               FROM hist) h
                 ON h.source IN (p.sa, p.sb)
            GROUP BY 1, 2, 3, 4, 5),
        cdf AS MATERIALIZED (
            SELECT g.sa, g.sb, g.na, g.nb, g.v,
                   CAST(COALESCE((SELECT SUM(c) FROM hist
                                  WHERE source = g.sa
                                    AND v <= g.v), 0) AS BIGINT)
                       AS cum_a,
                   CAST(COALESCE((SELECT SUM(c) FROM hist
                                  WHERE source = g.sb
                                    AND v <= g.v), 0) AS BIGINT)
                       AS cum_b
            FROM grid g)
        SELECT sa AS source_a, sb AS source_b,
               CAST(MAX(abs(cum_a * nb - cum_b * na)) AS BIGINT)
                   AS d_num,
               na AS n_a, nb AS n_b,
               CAST((1000000 * MAX(abs(cum_a * nb - cum_b * na)))
                    // (na * nb) AS BIGINT) AS ks_ppm
        FROM cdf GROUP BY sa, sb, na, nb"""
