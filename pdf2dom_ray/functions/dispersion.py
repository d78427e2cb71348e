"""Per-label embedding centroid dispersion (cluster tightness audit).

The embedding-quality screen run before clustering-based curation
(SemDeDup / DCLM-style): per label, the total squared deviation from
the label centroid — algebraically ``n·Σᵢ(n·qᵢ − sᵢ²)`` where
``sᵢ = Σⱼ xⱼᵢ`` and ``qᵢ = Σⱼ xⱼᵢ²`` over fixed-point int64
components ``x = floor(v·1000 + 0.5)`` (half-up — ``floor(+0.5)``
evaluates identically on the same double in numpy and DuckDB,
avoiding banker's-rounding skew). The identity makes it ONE pass: no
centroid broadcast, no second scan, and the integer moments make the
result bit-exact under any partitioning (CLAUDE.md invariant).
Magnitude check: |x| ≤ 531, n ≤ rows/label, q ≤ n·531²,
n·Σ(n·q − s²) ≤ n²·D·531² — int64-safe to ~10⁶ rows/label at D=64;
beyond that drop the scale factor a decade.

Scale shape: per-batch (label, dim) moment partials (labels×D rows,
pre-reduced) → driver fold of O(labels·D·blocks) narrow rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["label_dispersion", "label_dispersion_oracle_sql"]


def label_dispersion(ds: rd.Dataset, *, label_col: str = "label",
                     vec_col: str = "embedding",
                     scale: int = 1000) -> rd.Dataset:
    """(label, n_vecs, dispersion): Σ squared deviation from the
    label centroid, in fixed-point (scale²) units × n."""

    def partial(t: pa.Table) -> pa.Table:
        labels = np.asarray(t.column(label_col), dtype=np.int64)
        vecs = t.column(vec_col)
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        flat = np.asarray(vecs.values, dtype=np.float64)
        offs = np.asarray(vecs.offsets, dtype=np.int64)
        lens = np.diff(offs)
        if not len(labels) or not lens.sum():
            return pa.table({"label": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64())})
        x = np.floor(flat * scale + 0.5).astype(np.int64)
        row = np.repeat(np.arange(len(lens)), lens)
        dim = np.arange(len(flat)) - offs[:-1][row]
        df = pd.DataFrame({"label": labels[row], "i": dim,
                           "n": np.ones(len(x), np.int64),
                           "s": x, "q": x * x})
        g = df.groupby(["label", "i"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold_block(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            t.to_pandas().groupby(["label", "i"],
                                  as_index=False).sum(),
            preserve_index=False)

    from .fold import bounded_fold_tables
    parts = ds.map_batches(partial, batch_format="pyarrow")
    tables = bounded_fold_tables(parts, fold_block)
    if not tables:
        return rd.from_arrow(pa.table({
            "label": pa.array([], pa.int64()),
            "n_vecs": pa.array([], pa.int64()),
            "dispersion": pa.array([], pa.int64())}))
    g = pa.concat_tables(tables).to_pandas() \
        .groupby(["label", "i"], as_index=False).sum()
    n = g["n"].to_numpy(np.int64)
    s = g["s"].to_numpy(np.int64)
    q = g["q"].to_numpy(np.int64)
    g["t"] = n * q - s * s
    out = g.groupby("label", as_index=False) \
        .agg(n_dim=("n", "max"), t=("t", "sum")) \
        .sort_values("label")
    return rd.from_arrow(pa.table({
        "label": pa.array(out["label"].to_numpy(np.int64),
                          pa.int64()),
        "n_vecs": pa.array(out["n_dim"].to_numpy(np.int64),
                           pa.int64()),
        "dispersion": pa.array(
            (out["n_dim"] * out["t"]).to_numpy(np.int64),
            pa.int64())}))


def label_dispersion_oracle_sql(table: str = "embeddings",
                                scale: int = 1000) -> str:
    return f"""
        WITH e AS (
          SELECT label, generate_subscripts(embedding, 1) AS i,
                 CAST(floor(unnest(embedding) * {scale} + 0.5)
                      AS BIGINT) AS x
          FROM {table}),
        g AS (SELECT label, i, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(x) AS BIGINT) AS s,
                     CAST(SUM(x * x) AS BIGINT) AS q
              FROM e GROUP BY 1, 2),
        d AS (SELECT label, MAX(n) AS n,
                     SUM(n * q - s * s) AS t
              FROM g GROUP BY 1)
        SELECT CAST(label AS BIGINT) AS label,
               CAST(n AS BIGINT) AS n_vecs,
               CAST(n * t AS BIGINT) AS dispersion
        FROM d ORDER BY 1
    """
