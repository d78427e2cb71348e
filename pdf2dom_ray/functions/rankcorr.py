"""Spearman rank correlation between two integer metric columns —
exact, sort-free, one narrow exchange per column.

"Do two per-document metrics rank-agree?" (chars vs tokens, indegree
vs pagerank, quality score vs LM perplexity) is the standard QA probe
before trusting one metric as a cheap proxy for another. Pearson needs
float moments (order-dependent sums — the CLAUDE.md hash hazard);
Spearman on competition ("min") ranks is pure integers: with
d_i = rank_a(i) − rank_b(i),

    ρ = 1 − 6·Σd² / (n·(n² − 1))

reported as exact (n, sum_d2) plus the convenience ppm form
rho_ppm = 1e6 − (6e6·Σd²) // (n(n²−1)) — floor division both engines.
Competition ranking is exactly SQL's ``RANK() OVER (ORDER BY m)``, so
the DuckDB oracle replays the run with window functions while the Ray
side never sorts anything.

Sort-free distributed shape: rank(v) under competition ranking is
1 + |{rows with value < v}| — a pure function of the VALUE HISTOGRAM.
Each column takes one narrow groupby(value)→count exchange (distinct
metric values, not rows), the driver prefix-sums the sorted histogram
into a (values, ranks) pair broadcast via ``ray.put``, and one
map_batches pass probes both with ``np.searchsorted`` and folds
per-batch Σd² partials — O(distinct values) driver state, O(blocks)
scalar rows folded. At 1e12-row scale quantize the metrics first
(bucketed ranks); the histogram then stays bounded by design. The ppm
column needs 6e6·Σd² < 2^63 (n ≤ ~16M rows); (n, sum_d2) stay exact
far beyond.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["spearman_rank", "spearman_oracle_sql"]


def _rank_map(ds: rd.Dataset, col: str):
    """(sorted distinct values, competition rank of each) from one
    narrow histogram exchange."""
    from .dedup import _to_arrow_blocks

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy()
        uv, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uv, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    hist = _to_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby("v").aggregate(Sum("c", alias_name="c"))) \
        .to_pandas().sort_values("v")
    vals = hist["v"].to_numpy(np.int64)
    cnt = hist["c"].to_numpy(np.int64)
    ranks = 1 + np.concatenate([[0], np.cumsum(cnt)[:-1]])
    return vals, ranks.astype(np.int64), int(cnt.sum())


def spearman_rank(ds: rd.Dataset, col_a: str, col_b: str
                  ) -> rd.Dataset:
    """One row (n, sum_d2, rho_ppm): exact Spearman components over
    the two int64 metric columns of ``ds`` (competition ranks)."""
    ds = ds.materialize()           # consumed 3× (2 histograms + scan)
    va, ra, n = _rank_map(ds, col_a)
    vb, rb, _ = _rank_map(ds, col_b)
    if n < 2:
        return rd.from_arrow(pa.table({
            "n": pa.array([n], pa.int64()),
            "sum_d2": pa.array([0], pa.int64()),
            "rho_ppm": pa.array([0], pa.int64())}))
    refs = [ray.put(x) for x in (va, ra, vb, rb)]

    def partial(t: pa.Table) -> pa.Table:
        va_, ra_, vb_, rb_ = (ray.get(r) for r in refs)
        a = t.column(col_a).to_numpy()
        b = t.column(col_b).to_numpy()
        d = ra_[np.searchsorted(va_, a)] - rb_[np.searchsorted(vb_, b)]
        return pa.table({
            "sum_d2": pa.array([int((d * d).sum())], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .materialize()
    sum_d2 = int(parts.sum("sum_d2") or 0)
    rho_ppm = 1_000_000 - (6_000_000 * sum_d2) // (n * (n * n - 1))
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "sum_d2": pa.array([sum_d2], pa.int64()),
        "rho_ppm": pa.array([rho_ppm], pa.int64())}))


def spearman_oracle_sql(metrics_cte: str, col_a: str = "ma",
                        col_b: str = "mb") -> str:
    """The same statistic via SQL window RANK() (competition ranking
    == the histogram prefix-sum rank by construction); HUGEINT guards
    the 6e6·Σd² product before the BIGINT cast."""
    return f"""
        WITH m AS MATERIALIZED ({metrics_cte}),
        r AS MATERIALIZED (
            SELECT CAST(RANK() OVER (ORDER BY {col_a}) AS BIGINT)
                       AS ra,
                   CAST(RANK() OVER (ORDER BY {col_b}) AS BIGINT)
                       AS rb
            FROM m)
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(SUM((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2,
               CAST(1000000 -
                    (6000000 * CAST(SUM((ra - rb) * (ra - rb))
                                    AS HUGEINT))
                    // (count(*) * (count(*) * count(*) - 1))
                    AS BIGINT) AS rho_ppm
        FROM r"""
