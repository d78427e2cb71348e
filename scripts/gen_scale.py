#!/usr/bin/env python
"""Synthesize a larger test scale from the driver's sf0.1 tables.

Scale-sweep input generator (round-5 verdict item 6): the driver only
ships sf{0.001,0.01,0.1}; scale-edge bugs (r4 found two) surface at
the NEXT decade, so this script writes /tmp/sf0.3 (or any multiple)
as K referentially-consistent copies of sf0.1 with disjoint key
spaces:

- dimension tables (region, nation) copy through unchanged;
- every fact/entity key shifts by ``k * OFFSET_table`` (powers of 10
  above the sf0.1 max), preserving FK relationships inside each copy;
- ``documents.text`` gains a per-copy suffix token (and ``n_chars``
  is recomputed) so exact/near-dup queries see realistic duplicate
  clusters instead of degenerate full-corpus identity;
- ``embeddings.embedding`` gets a deterministic per-copy first-
  component nudge so distance ties stay generic.

Everything is a pure function of the source tables — DuckDB oracles
read the same parquet, so MATCH semantics carry over unchanged.

Usage: python scripts/gen_scale.py [K] [out_dir]   (default 3 /tmp/sf0.3)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

OFFSETS = {
    "c_custkey": 100_000, "s_suppkey": 10_000, "p_partkey": 100_000,
    "o_orderkey": 1_000_000, "l_orderkey": 1_000_000,
    "l_partkey": 100_000, "l_suppkey": 10_000,
    "event_id": 1_000_000, "user_id": 100_000,
    # doc_id / vec_id offsets are filled in dynamically with the
    # source row count: corpus rules bucket by id RANGE
    # (``doc_id * B // count(*)`` etc.), so the scaled id universe
    # must stay contiguous 0..K*N-1 — a gapped universe breaks the
    # operators' documented contract, not the operators
    # (found by the first sf0.3 sweep: vocab_growth IndexError).
    "doc_id": None, "vec_id": None,
}

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def scaled_copy(t: pa.Table, name: str, k: int) -> pa.Table:
    if k == 0 or name in ("region", "nation"):
        return t
    cols = {}
    for field in t.schema:
        col = t.column(field.name)
        if field.name in OFFSETS:
            off = OFFSETS[field.name]
            if off is None:                   # contiguous id universe
                off = t.num_rows
            col = pc.add(col, pa.scalar(k * off, type=field.type))
        cols[field.name] = col
    if name == "documents":
        text = pc.binary_join_element_wise(
            cols["text"], pa.scalar(f"copytok{k}"), " ")
        cols["text"] = text
        cols["n_chars"] = pc.cast(pc.utf8_length(text), pa.int64())
    if name == "embeddings":
        emb = cols["embedding"].combine_chunks()
        vals = emb.values.to_numpy(zero_copy_only=False).copy()
        dim = len(emb[0])
        vals[::dim] += np.float32(k) * np.float32(1e-3)
        cols["embedding"] = pa.ListArray.from_arrays(
            emb.offsets, pa.array(vals, pa.float32()))
    return pa.table(cols, schema=pa.schema(
        [(f.name, t.schema.field(f.name).type) for f in t.schema]))


def main() -> int:
    k_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.3"
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        if name in ("region", "nation"):
            parts = [t]
        else:
            parts = [scaled_copy(t, name, k) for k in range(k_copies)]
        pq.write_table(pa.concat_tables(parts), f"{out}/{name}.parquet")
        print(f"{name}: {sum(p.num_rows for p in parts)} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
