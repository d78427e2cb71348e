"""Bloom-filter membership sketch and bloom-filtered semi-join.

The classic distributed-join pre-filter (Bloom 1970; used as a
"bloom join" in every warehouse engine): distill the build side's key
set into an m-bit bitmap with k hash functions, broadcast the bitmap
(m/8 bytes — kilobytes, vs. the key set's gigabytes at crawl scale),
and drop probe rows whose bits aren't all set BEFORE the expensive
exchange. False positives pass through (and are caught by the real
join later); false negatives are impossible.

Distributed shape mirrors `functions/hll.py`: per-batch partial
bitmaps, OR-merge on the driver (associative/commutative ⇒ invariant
to partitioning), `ray.put` broadcast, vectorized probe stage.

Determinism: bit j of key x is ``int(md5(f"{x}:{j}")[:8], 16) % m`` —
md5 so the DuckDB oracle replays every bit, INCLUDING the false
positives, making the sketch output itself hash-checkable (same
rationale as `functions/sampling.py` / `functions/hashfeat.py`).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["bloom_bits", "bloom_build", "bloom_probe_mask",
           "bloom_semijoin_flags", "bloom_semijoin_sql"]


def bloom_bits(keys: list[str], *, m: int, k: int) -> np.ndarray:
    """Bit positions (flat int64 array, k per key) for a key list."""
    out = np.empty(len(keys) * k, dtype=np.int64)
    i = 0
    for key in keys:
        for j in range(k):
            h = hashlib.md5(f"{key}:{j}".encode("utf-8")).hexdigest()
            out[i] = int(h[:8], 16) % m
            i += 1
    return out


def _partial_bitmap(keys: list[str], m: int, k: int) -> bytes:
    bits = np.zeros(m, dtype=bool)
    bits[bloom_bits(keys, m=m, k=k)] = True
    return np.packbits(bits).tobytes()


def bloom_build(ds: rd.Dataset, col: str, *, m: int = 8192,
                k: int = 4) -> np.ndarray:
    """Distributed build: per-batch partial bitmaps OR-merged on the
    driver (one m/8-byte row per block). Returns the bool[m] bitmap."""

    def partial(t: pa.Table) -> pa.Table:
        keys = [str(v) for v in t.column(col).to_pylist()
                if v is not None]
        return pa.table({"bm": pa.array([_partial_bitmap(keys, m, k)],
                                        pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow")
    merged = np.zeros(m // 8, dtype=np.uint8)
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if t.num_columns == 0:
            continue
        for blob in t.column("bm").to_pylist():
            merged |= np.frombuffer(blob, dtype=np.uint8)
    return np.unpackbits(merged).astype(bool)


def bloom_probe_mask(keys: list[str], bitmap: np.ndarray, *,
                     k: int) -> np.ndarray:
    """bool mask: all k bits set (possible member) per key."""
    m = len(bitmap)
    pos = bloom_bits(keys, m=m, k=k).reshape(len(keys), k)
    return bitmap[pos].all(axis=1) if len(keys) else \
        np.zeros(0, dtype=bool)


class _Prober:
    """Actor-pool probe stage: fetches the broadcast bitmap once per
    actor in __init__, tests batches vectorized."""

    def __init__(self, bitmap_ref, col: str, k: int):
        self._bitmap = ray.get(bitmap_ref)
        self._col = col
        self._k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        keys = [str(v) for v in t.column(self._col).to_pylist()]
        mask = bloom_probe_mask(keys, self._bitmap, k=self._k)
        return t.append_column(
            "in_bloom", pa.array(mask.astype(np.int64), pa.int64()))


def bloom_semijoin_flags(sf_dir: str, *, m: int = 8192,
                         k: int = 4) -> rd.Dataset:
    """(c_custkey, in_bloom): which customers a bloom filter built
    over ``orders.o_custkey`` admits as possibly-having-orders.

    The flag column (not a filtered table) is returned so the oracle
    checks the exact bit-level behavior, false positives included.
    """
    from ..stages.pool import default_pool

    build = rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey"])
    bitmap = bloom_build(build, "o_custkey", m=m, k=k)
    ref = ray.put(bitmap)

    probe = rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey"])
    return probe.map_batches(_Prober(ref, "c_custkey", k),
                             batch_format="pyarrow")


def bloom_semijoin_sql(*, m: int = 8192, k: int = 4) -> str:
    """DuckDB twin: replays every md5 bit decision of the sketch."""
    js = ", ".join(str(j) for j in range(k))
    bucket = ("CAST(CAST(('0x' || substr(md5(kk || ':' || "
              f"CAST(j AS VARCHAR)), 1, 8)) AS UBIGINT) % {m} "
              "AS BIGINT)")
    return f"""
        WITH js AS (SELECT unnest([{js}]) AS j),
        build AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS kk
                  FROM orders),
        setbits AS (SELECT DISTINCT {bucket} AS bit
                    FROM build CROSS JOIN js),
        probe AS (SELECT c_custkey, CAST(c_custkey AS VARCHAR) AS kk
                  FROM customer),
        pb AS (SELECT c_custkey, {bucket} AS bit
               FROM probe CROSS JOIN js),
        hit AS (SELECT c_custkey, CAST(count(*) AS BIGINT) AS nset
                FROM pb JOIN setbits USING (bit) GROUP BY 1)
        SELECT p.c_custkey,
               CAST(CASE WHEN COALESCE(h.nset, 0) = {k} THEN 1 ELSE 0
                    END AS BIGINT) AS in_bloom
        FROM (SELECT DISTINCT c_custkey FROM probe) p
        LEFT JOIN hit h USING (c_custkey)
    """
