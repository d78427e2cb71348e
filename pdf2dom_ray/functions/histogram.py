"""Equi-width histogram profile of an integer column.

The first plot anyone makes of a new column — fixed-width bins over
[lo, hi) with explicit under/overflow buckets — as exact integers:
bin_id = (v − lo) // width clamped to [−1, n_bins] where −1 is the
underflow and n_bins the overflow bucket. Equi-DEPTH profiling lives
in percentiles.py/length_deciles; this is its equi-WIDTH sibling, the
one whose bin EDGES are stable across corpus versions (monitoring
dashboards difference histograms between snapshots, which only works
when the buckets don't move).

Distributed shape: one np.bincount per batch over the clamped bin
ids → one (n_bins + 2)-row groupby. Nothing else moves."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["equiwidth_histogram", "histogram_oracle_sql"]


def equiwidth_histogram(ds: rd.Dataset, *, value_col: str,
                        lo: int, width: int,
                        n_bins: int) -> rd.Dataset:
    """(bin_id, bin_lo, n) for bin_id ∈ [−1, n_bins] (−1 = underflow,
    n_bins = overflow; bin_lo of those sentinels is lo−width and
    lo+n_bins·width). Every bucket is emitted, 0-filled."""
    from .dedup import _to_arrow_blocks

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy()
        b = np.clip((v - lo) // width, -1, n_bins)
        cnt = np.bincount((b + 1).astype(np.int64),
                          minlength=n_bins + 2)
        ids = np.arange(-1, n_bins + 1, dtype=np.int64)
        return pa.table({
            "bin_id": pa.array(ids, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    agg = _to_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby("bin_id").aggregate(Sum("n", alias_name="n"))) \
        .to_pandas()
    # the result is inherently n_bins+2 rows: reindex on the full
    # grid at the driver so an EMPTY input still emits every 0-filled
    # bucket (the stable-bin-edges contract)
    ids = np.arange(-1, n_bins + 1, dtype=np.int64)
    if len(agg):
        counts = agg.set_index("bin_id")["n"] \
            .reindex(ids, fill_value=0).to_numpy(np.int64)
    else:
        counts = np.zeros(len(ids), dtype=np.int64)
    return rd.from_arrow(pa.table({
        "bin_id": pa.array(ids, pa.int64()),
        "bin_lo": pa.array(lo + ids * width, pa.int64()),
        "n": pa.array(counts, pa.int64())}))


def histogram_oracle_sql(rows_cte: str, *, value_col: str,
                         lo: int, width: int, n_bins: int) -> str:
    """Clamped floor-division binning over a generated bucket grid
    (every bucket emitted, 0-filled)."""
    return f"""
        WITH v AS MATERIALIZED (
            SELECT CAST({value_col} AS BIGINT) AS v
            FROM ({rows_cte})),
        binned AS MATERIALIZED (
            -- DuckDB // TRUNCATES toward zero on negatives (numpy
            -- floors): route underflow explicitly so the // only
            -- ever sees a non-negative numerator
            SELECT CASE WHEN v < {lo} THEN CAST(-1 AS BIGINT)
                   ELSE least(CAST({n_bins} AS BIGINT),
                              (v - {lo}) // {width}) END AS bin_id,
                   CAST(count(*) AS BIGINT) AS n
            FROM v GROUP BY 1),
        grid AS MATERIALIZED (
            SELECT CAST(unnest(generate_series(-1, {n_bins}))
                        AS BIGINT) AS bin_id)
        SELECT grid.bin_id,
               CAST({lo} + grid.bin_id * {width} AS BIGINT) AS bin_lo,
               CAST(COALESCE(binned.n, 0) AS BIGINT) AS n
        FROM grid LEFT JOIN binned USING (bin_id)"""
