"""Per-key categorical Gini impurity (functions/impurity.py):
hand case, partition invariance, and the DuckDB twin."""

import duckdb
import pandas as pd
import ray.data as rd

from pdf2dom_ray.functions.impurity import (impurity_oracle_sql,
                                            type_impurity)


def _ds(rows, nparts=1):
    ds = rd.from_items([{"user_id": u, "event_type": t}
                        for u, t in rows], override_num_blocks=4)
    return ds.repartition(nparts) if nparts > 1 else ds


def test_hand_case(ray_session):
    rows = [(1, "a")] * 4 + [(2, "a"), (2, "b")] + \
        [(3, "a"), (3, "b"), (3, "c"), (3, "d")]
    got = type_impurity(_ds(rows)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    # user 1: pure → 0; user 2: 1 − 2·(1/2)² = 1/2; user 3: 3/4
    assert got["n_events"].tolist() == [4, 2, 4]
    assert got["impurity_ppm"].tolist() == [0, 500000, 750000]


def test_partition_invariance_and_oracle(ray_session):
    rows = [(u, f"t{(u * 3 + i) % 4}") for u in range(12)
            for i in range(u % 5 + 1)]
    a = type_impurity(_ds(rows, 1)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    b = type_impurity(_ds(rows, 5)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    vals = ", ".join(f"({u}, '{t}')" for u, t in rows)
    cte = (f"SELECT CAST(col0 AS BIGINT) AS user_id, "
           f"col1 AS event_type FROM (VALUES {vals})")
    want = duckdb.connect().execute(impurity_oracle_sql(cte)).df() \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, want, check_dtype=False)
