"""Benford first-digit audit (forged/synthetic numeric-column
detector).

Organic multiplicative quantities (prices, populations, file sizes)
follow Benford's law — P(first digit = d) = log10(1 + 1/d) — and a
column that drifts far from it is the classic forensic flag for
fabricated or template-generated numbers (Nigrini's fraud-audit
standard). The operator emits, per digit 1–9:

    (digit, n, observed_ppm, benford_ppm)

observed_ppm = 1e6·n // total (exact integer; the CLAUDE.md rule) and
benford_ppm as HARDCODED integer literals (⌊1e6·log10(1+1/d)⌋ —
computing the log at runtime would differ between engines in the last
ulp). The first digit of the int64 value is taken via decimal-string
truncation — exact in both engines, no float log10 anywhere.

Distributed shape: per-batch 9-bin digit histograms (vectorized
string-slice) → one 9-row groupby. Nothing else moves."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["benford_audit", "benford_oracle_sql"]

# floor(1e6 * log10(1 + 1/d)), d = 1..9 — fixed literals by design
BENFORD_PPM = (301029, 176091, 124938, 96910, 79181,
               66946, 57991, 51152, 45757)


def benford_audit(ds: rd.Dataset, *, value_col: str) -> rd.Dataset:
    """(digit, n, observed_ppm, benford_ppm) over the positive int64
    values of ``value_col`` (zeros/negatives are excluded — they have
    no Benford first digit)."""
    from .dedup import _to_arrow_blocks

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy()
        v = v[v > 0]
        # decimal-string truncation: astype('<U1') keeps the first
        # character — exact, no float log10 anywhere
        digits = v.astype(np.int64).astype(str).astype("<U1") \
            .astype(np.int64) if len(v) else \
            np.array([], dtype=np.int64)
        cnt = np.bincount(digits, minlength=10)[1:10] if len(v) \
            else np.zeros(9, dtype=np.int64)
        return pa.table({
            "digit": pa.array(np.arange(1, 10), pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    agg = _to_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby("digit").aggregate(Sum("n", alias_name="n"))) \
        .to_pandas().sort_values("digit")
    total = int(agg["n"].sum())
    n = agg["n"].to_numpy(np.int64)
    obs = (1_000_000 * n) // total if total else \
        np.zeros(9, dtype=np.int64)
    return rd.from_arrow(pa.table({
        "digit": pa.array(agg["digit"].to_numpy(np.int64),
                          pa.int64()),
        "n": pa.array(n, pa.int64()),
        "observed_ppm": pa.array(obs.astype(np.int64), pa.int64()),
        "benford_ppm": pa.array(list(BENFORD_PPM), pa.int64())}))


def benford_oracle_sql(values_cte: str, *,
                       value_col: str = "v") -> str:
    """Decimal-string first digit, the same literals."""
    lits = " UNION ALL ".join(
        f"SELECT CAST({d} AS BIGINT) AS digit, "
        f"CAST({p} AS BIGINT) AS benford_ppm"
        for d, p in zip(range(1, 10), BENFORD_PPM))
    return f"""
        WITH vals AS MATERIALIZED (
            SELECT CAST({value_col} AS BIGINT) AS v
            FROM ({values_cte}) WHERE {value_col} > 0),
        hist AS MATERIALIZED (
            SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT)
                       AS digit,
                   CAST(count(*) AS BIGINT) AS n
            FROM vals GROUP BY 1),
        tot AS MATERIALIZED (SELECT CAST(SUM(n) AS BIGINT) AS t
                             FROM hist),
        lit AS MATERIALIZED ({lits})
        SELECT lit.digit, CAST(COALESCE(hist.n, 0) AS BIGINT) AS n,
               CAST(CASE WHEN tot.t = 0 THEN 0
                    ELSE (1000000 * COALESCE(hist.n, 0)) // tot.t
                    END AS BIGINT) AS observed_ppm,
               lit.benford_ppm
        FROM lit LEFT JOIN hist ON hist.digit = lit.digit
        CROSS JOIN tot"""
