#!/usr/bin/env python
"""Driver-style oracle sweep: run every ``__ray_entry__.queries()``
entry and compare against its ``oracle_sql()`` in DuckDB (order-
insensitive but DTYPE-STRICT), mirroring the external correctness
gate.  Dtype strictness matters: DuckDB HUGEINT/DECIMAL aggregates
land in pandas as float64 while the Ray side emits int64 — values
compare equal here but the driver's value-hash (which sees dtype)
flags them.  Every such oracle must CAST(... AS BIGINT)/DOUBLE.

Usage (cwd must be the repo root — Ray workers inherit it):
    python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(df, pd):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


def main() -> int:
    import duckdb
    import pandas as pd
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    args = sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    # sf-parameterized oracles (e.g. semdedup's derived k) must build
    # against the same dir the queries run on; the driver always uses
    # sf0.01 (the env default)
    os.environ["GRAFT_ORACLE_SF"] = sf

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")

    failures = 0
    # engine-side-only queries for big-scale sweeps: the SQL twin is
    # pair-quadratic (minutes at sf>=0.3) but the engine run + row
    # count still catch scale breaks (round-4 discipline)
    skip_oracle = {s for s in
                   os.environ.get("GRAFT_SKIP_ORACLE", "").split(",")
                   if s}
    oracles = E.oracle_sql()
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            res = fn(sf)
            df = res.to_pandas() if hasattr(res, "to_pandas") else \
                pd.DataFrame(res)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: RAY FAIL {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles or name in skip_oracle:
            tag = "oracle-skipped" if name in oracles else "rows-only"
            print(f"{name}: {tag}, {len(df)} rows, "
                  f"cols={list(df.columns)}")
            continue
        odf = con.execute(oracles[name]).df()
        ra, rb = df, odf  # raw frames: dtype check before str-coercion
        a, b = norm(df, pd), norm(odf, pd)
        if len(a) != len(b):
            print(f"{name}: ROWCOUNT MISMATCH ray={len(a)} oracle={len(b)}")
            failures += 1
            continue
        if list(a.columns) != list(b.columns):
            print(f"{name}: SCHEMA MISMATCH {list(a.columns)} vs "
                  f"{list(b.columns)}")
            failures += 1
            continue
        bad_dt = [(c, str(ra.dtypes[c]), str(rb.dtypes[c]))
                  for c in a.columns
                  if c in ra.columns and c in rb.columns
                  and str(ra.dtypes[c]) != str(rb.dtypes[c])]
        if bad_dt:
            print(f"{name}: DTYPE MISMATCH {bad_dt}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=False,
                                          rtol=1e-9, atol=1e-9)
            print(f"{name}: MATCH ({len(a)} rows)")
        except AssertionError as e:
            print(f"{name}: VALUE MISMATCH: {str(e)[:300]}")
            failures += 1
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
