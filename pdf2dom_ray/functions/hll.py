"""HyperLogLog distinct-count sketch (mergeable, deterministic).

Counting distinct URLs/domains/tokens at 100 TB can't afford the
exact groupby: HLL answers with O(2^p) bytes of state and one narrow
pass. This implementation is the standard Flajolet et al. HLL with
linear-counting small-range correction (the HLL++ bias table is an
empirical constant set; omitted and documented — relative error is
~1.04/sqrt(m) ≈ 1.6% at p=12 outside the small-range regime).

Determinism and distribution:

* the hash is **md5** (stable across machines/runs — no seeded
  process-local hashing), so the sketch and its estimate are
  bit-reproducible for a given input SET;
* per-batch partials are 2^p uint8 register arrays; merging is
  elementwise ``np.maximum`` — associative and commutative, so the
  result is invariant to partitioning and merge order (locked by a
  block-count-invariance test);
* the driver merges one 4 KiB array per block — bounded by block
  count, never by row count.

No SQL oracle exists (DuckDB's approx_count_distinct uses its own
hash), so the driver query for this op is rows-only; correctness is
locked by the accuracy/merge/reference tests instead.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["hll_sketch_batch", "hll_merge", "hll_estimate",
           "hll_distinct", "hll_distinct_by", "hll_registers",
           "hll_registers_oracle_sql"]


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_sketch_batch(keys: list[str], p: int = 12) -> np.ndarray:
    """One pass over keys → 2^p uint8 registers."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not keys:
        return regs
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(k.encode("utf-8")).digest()[:8],
                        "big") for k in keys),
        dtype=np.uint64, count=len(keys))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # rho = leading zeros of w (within 64 bits) + 1, capped at 64-p+1
    lz = np.zeros(len(w), dtype=np.uint8)
    probe = w
    for shift in (32, 16, 8, 4, 2, 1):
        mask = probe < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        probe = np.where(mask, probe << np.uint64(shift), probe)
    rho = (lz + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> int:
    m = len(regs)
    est = _alpha(m) * m * m / float(np.sum(2.0 ** -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:          # small-range linear counting
        est = m * math.log(m / zeros)
    return int(round(est))


def hll_distinct(ds: rd.Dataset, col: str, *, p: int = 12) -> int:
    """Distributed distinct-count estimate over a column."""

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_sketch_batch(
            [k for k in t.column(col).to_pylist() if k is not None], p)
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow")
    merged = np.zeros(1 << p, dtype=np.uint8)
    for ref in parts.to_arrow_refs():     # one 4 KiB row per block
        t = ray.get(ref)
        if t.num_columns == 0:
            continue
        for blob in t.column("regs").to_pylist():
            merged = hll_merge(merged,
                               np.frombuffer(blob, dtype=np.uint8))
    return hll_estimate(merged)


def hll_distinct_by(ds: rd.Dataset, col: str, by: str, *,
                    p: int = 12) -> rd.Dataset:
    """(by, distinct_est): per-group HLL distinct count of ``col``.

    GROUP BY x, approx_count_distinct(y) — the shape an exact
    distributed distinct-groupby can't afford at 100 TB (it shuffles
    every (by, col) pair). Here each batch collapses to one 2^p-byte
    register row PER GROUP PRESENT IN THE BATCH, so the shuffle moves
    ≤ groups × blocks sketch rows (4 KiB each at p=12, independent of
    row count); ``groupby(by).map_groups`` merges registers
    elementwise (associative/commutative → partitioning-invariant)
    and estimates. Skew-immune: a hot group costs one register row
    per block, same as a cold one.
    """
    import pandas as pd

    def partial(df: pd.DataFrame) -> pa.Table:
        groups, regs = [], []
        for g, grp in df.groupby(by, sort=False):
            groups.append(g)
            keys = [k for k in grp[col] if k is not None]
            regs.append(hll_sketch_batch(keys, p).tobytes())
        return pa.table({by: pa.array(groups),
                         "regs": pa.array(regs, pa.binary())})

    parts = ds.select_columns([by, col]).map_batches(
        partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pa.Table:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for blob in g["regs"]:
            merged = hll_merge(merged, np.frombuffer(blob, np.uint8))
        return pa.table({
            by: pa.array([g[by].iloc[0]]),
            "distinct_est": pa.array([hll_estimate(merged)], pa.int64())})

    return parts.groupby(by).map_groups(merge, batch_format="pandas")


def hll_registers(ds: rd.Dataset, col: str, *, p: int = 12) -> rd.Dataset:
    """(bucket, register) rows of the merged sketch — ALL 2^p buckets,
    0 where empty.

    The register-level audit surface: because the hash is md5, every
    register is SQL-replayable (at p ≡ 0 (mod 4) the bucket is the
    first p/4 hex nibbles and the rank operand the next 13), so a
    DuckDB oracle can hash-check the ENTIRE sketch state — a far
    stronger external check than comparing estimates (which no SQL
    engine reproduces, hence ``hll_distinct``'s rows-only status).
    Same scale shape as ``hll_distinct``: per-block 2^p-byte partials,
    one elementwise-max driver fold."""
    def partial(t: pa.Table) -> pa.Table:
        regs = hll_sketch_batch(
            [k for k in t.column(col).to_pylist() if k is not None], p)
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow")
    merged = np.zeros(1 << p, dtype=np.uint8)
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if t.num_columns == 0:
            continue
        for blob in t.column("regs").to_pylist():
            merged = hll_merge(merged,
                               np.frombuffer(blob, dtype=np.uint8))
    return rd.from_arrow(pa.table({
        "bucket": pa.array(np.arange(1 << p, dtype=np.int64),
                           pa.int64()),
        "register": pa.array(merged.astype(np.int64), pa.int64())}))


def hll_registers_oracle_sql(keys_cte: str, *, p: int = 12) -> str:
    """DuckDB twin of ``hll_registers`` (md5 hex-nibble replay).

    ``keys_cte`` must yield one VARCHAR column ``k``. Requires
    p ≡ 0 (mod 4) so the bucket aligns on hex nibbles (p=12: bucket =
    first 3 nibbles, rank operand = the next 13 = the low 52 bits;
    rho = leading zeros within the 52-bit window + 1 = 53 −
    bitlength)."""
    if p % 4 != 0:
        raise ValueError("oracle requires p % 4 == 0")
    nib = p // 4
    return f"""
        WITH k AS MATERIALIZED (SELECT k FROM ({keys_cte})),
        r AS MATERIALIZED (
          SELECT CAST(('0x' || substr(md5(k), 1, {nib})) AS INT)
                     AS bucket,
                 CAST(('0x' || substr(md5(k), {nib + 1}, 13))
                      AS BIGINT) AS v
          FROM k),
        mx AS MATERIALIZED (
          SELECT bucket,
                 MAX(CASE WHEN v = 0 THEN 53
                     ELSE 53 - length(ltrim(bin(v), '0')) END)
                     AS register
          FROM r GROUP BY bucket),
        grid AS (SELECT unnest(generate_series(0, {(1 << p) - 1}))
                     AS bucket)
        SELECT CAST(g.bucket AS BIGINT) AS bucket,
               CAST(COALESCE(m.register, 0) AS BIGINT) AS register
        FROM grid g LEFT JOIN mx m ON g.bucket = m.bucket"""
