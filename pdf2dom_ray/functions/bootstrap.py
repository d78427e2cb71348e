"""Deterministic Poisson bootstrap (online bootstrap replicates).

The streaming-bootstrap standard (Oza & Russell 2001; Kleiner's BLB
lineage): instead of resampling n rows with replacement, give every
row an independent Poisson(1) weight per replicate — mergeable,
single-pass, and embarrassingly parallel. Here the Poisson draw is
DETERMINISTIC: u = md5('boot:' ‖ id ‖ ':' ‖ replicate) interpreted
as a 32-hex-digit fraction, inverted through the Poisson(1) CDF via
lexicographic compares against fixed hex thresholds — the repo's
seeded-decision convention, replayed verbatim by the SQL twin's
CASE cascade. Weights ≥ 6 are clamped (P ≈ 10⁻⁴ at λ=1; both sides
clamp identically).

Scale shape: one scan, per-batch (replicate, Σw·cents, Σw) int64
partials (replicates × blocks rows), driver fold. The replicate
spread IS the bootstrap distribution of the total.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["bootstrap_totals", "bootstrap_oracle_sql"]

# 32-hex-digit Poisson(1) CDF thresholds for k = 0..5 (u < T[k] ⇒
# weight ≤ k); generated once from math.exp(-1) partial sums
_T = ("5e2d58d8b3bce0000000000000000000",
      "bc5ab1b16779c0000000000000000000",
      "eb715e1dc15830000000000000000000",
      "fb23979734a258000000000000000000",
      "ff1025f59174e0000000000000000000",
      "ffd90f3ba40560000000000000000000")


def _weights(ids: np.ndarray, rep: int) -> np.ndarray:
    out = np.empty(len(ids), dtype=np.int64)
    for j, i in enumerate(ids.tolist()):
        u = hashlib.md5(f"boot:{i}:{rep}".encode()).hexdigest()
        w = 6
        for k, t in enumerate(_T):
            if u < t:
                w = k
                break
        out[j] = w
    return out


def bootstrap_totals(sf_dir: str, *, replicates: int = 16
                     ) -> rd.Dataset:
    """(replicate, total_cents, n_eff) — Poisson-bootstrap replicate
    totals of events.value (n_eff = Σ weights)."""
    if replicates <= 0:
        raise ValueError("replicates must be positive")
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("event_id"), dtype=np.int64)
        cents = np.floor(np.asarray(t.column("value"),
                                    dtype=np.float64) * 100.0) \
            .astype(np.int64)
        reps, tot, ne = [], [], []
        for r in range(replicates):
            w = _weights(ids, r)
            reps.append(r)
            tot.append(int((w * cents).sum()))
            ne.append(int(w.sum()))
        return pa.table({
            "replicate": pa.array(reps, pa.int64()),
            "total_cents": pa.array(tot, pa.int64()),
            "n_eff": pa.array(ne, pa.int64())})

    def fold_block(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            t.to_pandas().groupby("replicate",
                                  as_index=False).sum(),
            preserve_index=False)

    from .fold import bounded_fold_tables
    tables = bounded_fold_tables(
        ds.map_batches(partial, batch_format="pyarrow"), fold_block)
    if not tables:
        return rd.from_arrow(pa.table({
            "replicate": pa.array([], pa.int64()),
            "total_cents": pa.array([], pa.int64()),
            "n_eff": pa.array([], pa.int64())}))
    merged = pa.concat_tables(tables).to_pandas() \
        .groupby("replicate", as_index=False).sum() \
        .sort_values("replicate")
    return rd.from_arrow(pa.Table.from_pandas(merged,
                                              preserve_index=False))


def bootstrap_oracle_sql(replicates: int = 16) -> str:
    cases = " ".join(
        f"WHEN h < '{t}' THEN {k}" for k, t in enumerate(_T))
    return f"""
        WITH reps AS (SELECT unnest(range({replicates})) AS r),
        w AS (
          SELECT reps.r,
                 CAST(floor(e.value * 100) AS BIGINT) AS cents,
                 CASE {cases} ELSE 6 END AS wt
          FROM events e, reps,
               LATERAL (SELECT md5('boot:'
                                   || CAST(e.event_id AS VARCHAR)
                                   || ':' || CAST(reps.r AS VARCHAR))
                            AS h) m)
        SELECT CAST(r AS BIGINT) AS replicate,
               CAST(SUM(wt * cents) AS BIGINT) AS total_cents,
               CAST(SUM(wt) AS BIGINT) AS n_eff
        FROM w GROUP BY 1 ORDER BY 1
    """
