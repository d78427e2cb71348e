"""Skyline (Pareto frontier) operator — Börzsönyi et al. 2001.

"Which documents are the best trade-offs?" — longest AND most
lexically diverse, highest-quality AND least-duplicated — is a
SKYLINE query: keep every row not DOMINATED by another (x' ≥ x,
y' ≥ y, and strictly better on one; both metrics maximized). The
classic DB operator the curation picker wants before a scalarized
score commits to one weighting.

The skyline is UNION-COMBINABLE — skyline(A ∪ B) =
skyline(skyline(A) ∪ skyline(B)) — because any dominator is itself
dominated by some skyline point (dominance is transitive). That makes
the distributed shape the canonical combiner fold: a vectorized
per-batch skyline (sort by (x desc, y desc), survivors are rows whose
y equals their x-group max AND strictly exceed the running best y of
all larger-x groups) cuts each batch to its frontier, and a driver
tree-fold of the bounded partials (a 2-D integer skyline holds at
most one y per distinct x) finishes with the same routine. No shuffle
at all. Ties on BOTH coordinates are all kept (neither dominates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["skyline2d", "skyline_oracle_sql"]


def _local_skyline(df: pd.DataFrame) -> pd.DataFrame:
    """Frontier of one frame (maximize x and y), all columns kept."""
    if not len(df):
        return df
    df = df.sort_values(["x", "y"], ascending=False,
                        kind="mergesort").reset_index(drop=True)
    x = df["x"].to_numpy(np.int64)
    y = df["y"].to_numpy(np.int64)
    new_x = np.empty(len(x), dtype=bool)
    new_x[:1] = True
    new_x[1:] = x[1:] != x[:-1]
    grp = np.cumsum(new_x) - 1
    gmax = y[new_x][grp]                 # per-x-group max (sorted)
    best_before = np.concatenate(
        [[np.iinfo(np.int64).min],
         np.maximum.accumulate(y[new_x])])[grp]
    keep = (y == gmax) & (gmax > best_before)
    return df[keep]


def skyline2d(ds: rd.Dataset, *, x_col: str, y_col: str,
              id_col: str = "doc_id") -> rd.Dataset:
    """(id, x, y) rows on the Pareto frontier of (maximize
    ``x_col``, maximize ``y_col``)."""

    def local(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "id": t.column(id_col).to_numpy(),
            "x": t.column(x_col).to_numpy(),
            "y": t.column(y_col).to_numpy()})
        out = _local_skyline(df)
        return pa.table({
            "id": pa.array(out["id"].to_numpy(np.int64), pa.int64()),
            "x": pa.array(out["x"].to_numpy(np.int64), pa.int64()),
            "y": pa.array(out["y"].to_numpy(np.int64), pa.int64())})

    parts = [b for b in ray.get(
        ds.map_batches(local, batch_format="pyarrow")
          .to_arrow_refs()) if getattr(b, "num_columns", 0)]
    if not parts:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            x_col: pa.array([], pa.int64()),
            y_col: pa.array([], pa.int64())}))
    merged = _local_skyline(pa.concat_tables(parts).to_pandas())
    return rd.from_arrow(pa.table({
        id_col: pa.array(merged["id"].to_numpy(np.int64),
                         pa.int64()),
        x_col: pa.array(merged["x"].to_numpy(np.int64), pa.int64()),
        y_col: pa.array(merged["y"].to_numpy(np.int64),
                        pa.int64())}))


def skyline_oracle_sql(rows_cte: str, *, x_col: str, y_col: str,
                       id_col: str = "doc_id") -> str:
    """NOT EXISTS dominance twin."""
    return f"""
        WITH m AS MATERIALIZED (
            SELECT {id_col}, CAST({x_col} AS BIGINT) AS x,
                   CAST({y_col} AS BIGINT) AS y
            FROM ({rows_cte}))
        SELECT {id_col}, x AS {x_col}, y AS {y_col}
        FROM m a
        WHERE NOT EXISTS (
            SELECT 1 FROM m b
            WHERE b.x >= a.x AND b.y >= a.y
              AND (b.x > a.x OR b.y > a.y))"""
