"""Rendezvous (HRW) shard assignment (Thaler & Ravishankar 1998).

The data-placement primitive a fixed-size multi-node corpus store
needs: assign every key to one of N named shards such that (a) the
assignment is a pure function of (key, shard name) — any worker
computes it locally with zero coordination, and (b) removing one
shard only remaps THAT shard's keys (the highest-random-weight
property consistent hashing is prized for — no global reshuffle on
topology change, which at 100 TB is the difference between moving
1/N of the corpus and all of it).

    owner(key) = argmax over shards s of md5(s ‖ ':' ‖ key)

md5 is the repo's seeded-decision convention and a DuckDB builtin,
so the oracle replays assignments verbatim; the 128-bit hex compare
is a total order and collisions are 2⁻⁶⁴-scale (a tie would pick the
lexicographically-larger digest on both sides identically anyway).

Scale shape: embarrassingly parallel — one ``map_batches`` scan, per
batch an (n_rows × n_shards) digest matrix reduced by argmax; no
exchange, no state. Output also carries the digest-derived
``weight_hex`` so placement decisions are auditable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

__all__ = ["rendezvous_assign"]


def rendezvous_assign(ds: rd.Dataset, shards: list[str], *,
                      key_col: str = "url") -> rd.Dataset:
    """(key, shard, weight_hex): HRW owner per row of ``ds`` over the
    named ``shards`` (order-insensitive — the max digest wins)."""
    if not shards:
        raise ValueError("rendezvous_assign needs >= 1 shard name")
    names = list(shards)

    def assign(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        best_s = np.empty(len(keys), dtype=object)
        best_w = np.empty(len(keys), dtype=object)
        for i, k in enumerate(keys):
            ks = str(k)
            w, s = max((hashlib.md5(f"{n}:{ks}".encode()).hexdigest(),
                        n) for n in names)
            best_s[i] = s
            best_w[i] = w
        return pa.table({
            key_col: t.column(key_col),
            "shard": pa.array(best_s.tolist(), pa.string()),
            "weight_hex": pa.array(best_w.tolist(), pa.string())})

    return ds.select_columns([key_col]).map_batches(
        assign, batch_format="pyarrow")


def rendezvous_oracle_sql(shards: list[str], *,
                          table: str = "documents",
                          key_expr: str = "CAST(doc_id AS VARCHAR)",
                          key_as: str = "url") -> str:
    """DuckDB twin: greatest-of md5 digests with the matching shard
    name, via a per-shard UNION + per-key argmax."""
    arms = " UNION ALL ".join(
        f"SELECT {key_expr} AS k, '{n}' AS shard, "
        f"md5('{n}:' || {key_expr}) AS w FROM {table}"
        for n in shards)
    return f"""
        WITH cand AS ({arms}),
        ranked AS (
          SELECT k, shard, w,
                 row_number() OVER (PARTITION BY k
                                    ORDER BY w DESC, shard DESC) AS rn
          FROM cand)
        SELECT k AS {key_as}, shard, w AS weight_hex
        FROM ranked WHERE rn = 1"""
