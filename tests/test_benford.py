"""Benford first-digit audit: hand histogram, zero/negative
exclusion, log-uniform closeness, DuckDB oracle."""

import numpy as np


def _ds(vals):
    import ray.data as rd
    return rd.from_items([{"v": int(x)} for x in vals], override_num_blocks=4)


def test_benford_hand_histogram(ray_session):
    from pdf2dom_ray.functions.benford import benford_audit
    vals = [1, 12, 19, 2, 25, 300, 9, 0, -7]    # 0/-7 excluded
    got = {r["digit"]: (r["n"], r["observed_ppm"])
           for r in benford_audit(_ds(vals),
                                  value_col="v").take_all()}
    assert got[1] == (3, 428571)                 # 3/7
    assert got[2] == (2, 285714)
    assert got[3] == (1, 142857)
    assert got[9] == (1, 142857)
    assert got[4] == (0, 0)
    assert sum(n for n, _ in got.values()) == 7


def test_benford_loguniform_is_close(ray_session):
    from pdf2dom_ray.functions.benford import (BENFORD_PPM,
                                               benford_audit)
    rng = np.random.RandomState(149)
    vals = np.exp(rng.uniform(0, 14, 3000)).astype(np.int64)
    got = {r["digit"]: r["observed_ppm"]
           for r in benford_audit(_ds(vals[vals > 0]),
                                  value_col="v").take_all()}
    for d in range(1, 10):
        assert abs(got[d] - BENFORD_PPM[d - 1]) < 40_000


def test_benford_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.benford import (benford_audit,
                                               benford_oracle_sql)
    rng = np.random.RandomState(151)
    vals = np.exp(rng.uniform(0, 10, 300)).astype(np.int64)
    vals = vals[vals > 0]
    got = sorted((r["digit"], r["n"], r["observed_ppm"],
                  r["benford_ppm"])
                 for r in benford_audit(_ds(vals),
                                        value_col="v").take_all())
    sql_vals = " UNION ALL ".join(f"SELECT {int(x)} AS v"
                                  for x in vals)
    want = sorted(map(tuple, duckdb.sql(
        benford_oracle_sql(sql_vals, value_col="v")).fetchall()))
    assert got == want


def test_benford_empty_and_nonpositive_only(ray_session):
    from pdf2dom_ray.functions.benford import benford_audit
    got = benford_audit(_ds([0, -1, -99]), value_col="v").take_all()
    assert [r["n"] for r in got] == [0] * 9
    assert [r["observed_ppm"] for r in got] == [0] * 9
