"""Exact distributed percentiles via value histograms.

The scalable way to get EXACT quantiles of a bounded-cardinality
numeric column (lengths, counts, scores bucketed to ints) without a
global sort: per-batch value-count partials (Arrow ``value_counts``),
one narrow groupby to merge, then a driver-side cumulative walk over
the (value, count) histogram — driver state is O(distinct values),
not O(rows), which for token/char-length columns is thousands at any
corpus size. (Unbounded-cardinality doubles would need a t-digest /
KLL sketch instead — approximate by nature; this operator targets the
exact case.)

Rank semantics are pinned explicitly (rank = max(1, ceil(q*n)),
1-based over the sorted column) so the SQL oracle states the same
formula with a window function — no reliance on any engine's
quantile-interpolation flavor.
"""

from __future__ import annotations

import math

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["exact_percentiles", "exact_percentiles_by"]


def exact_percentiles(ds: rd.Dataset, col: str,
                      qs: tuple[float, ...] = (0.25, 0.5, 0.75,
                                               0.9, 0.99)) -> pa.Table:
    """(q, value) exact percentile table for an integer column."""

    def partial(t: pa.Table) -> pa.Table:
        vc = t.column(col).value_counts()
        return pa.table({
            "v": vc.field("values").cast(pa.int64()),
            "c": vc.field("counts").cast(pa.int64()),
        })

    hist = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("c", alias_name="c"))
    rows = sorted((r["v"], r["c"]) for r in hist.take_all())
    n = sum(c for _, c in rows)
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, math.ceil(q * n))
        cum = 0
        val = rows[-1][0] if rows else None
        for v, c in rows:
            cum += c
            if cum >= rank:
                val = v
                break
        out_q.append(float(q))
        out_v.append(val)
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.int64())})


def _walk(rows: list[tuple[int, int]], qs) -> list[tuple[float, int]]:
    n = sum(c for _, c in rows)
    out = []
    for q in qs:
        rank = max(1, math.ceil(q * n))
        cum = 0
        val = rows[-1][0] if rows else None
        for v, c in rows:
            cum += c
            if cum >= rank:
                val = v
                break
        out.append((float(q), val))
    return out


def exact_percentiles_by(ds: rd.Dataset, col: str, by: str,
                         qs: tuple[float, ...] = (0.25, 0.5, 0.75,
                                                  0.9, 0.99)) -> pa.Table:
    """(group, q, value) exact percentiles per group — same
    histogram method keyed by (group, value); driver state is
    O(groups x distinct values)."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([by, col]).group_by([by, col]).aggregate(
            [([], "count_all")])
        return g.rename_columns([by, "v", "c"])

    hist = ds.select_columns([by, col]).map_batches(
        partial, batch_format="pyarrow") \
        .groupby([by, "v"]).aggregate(Sum("c", alias_name="c"))
    acc: dict[str, list[tuple[int, int]]] = {}
    for r in hist.take_all():
        acc.setdefault(r[by], []).append((r["v"], r["c"]))
    gs, out_q, out_v = [], [], []
    for gkey in sorted(acc):
        for q, v in _walk(sorted(acc[gkey]), qs):
            gs.append(gkey)
            out_q.append(q)
            out_v.append(v)
    return pa.table({by: pa.array(gs, pa.string()),
                     "q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.int64())})
