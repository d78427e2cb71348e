"""Equi-width histogram: hand bins incl. under/overflow, 0-fill,
DuckDB oracle (incl. the negative-// truncation guard)."""

import numpy as np


def _ds(vals):
    import ray.data as rd
    return rd.from_items([{"v": int(x)} for x in vals], override_num_blocks=4)


def test_histogram_hand_bins(ray_session):
    from pdf2dom_ray.functions.histogram import equiwidth_histogram
    got = {r["bin_id"]: (r["bin_lo"], r["n"])
           for r in equiwidth_histogram(
               _ds([-3, 0, 5, 9, 10, 25, 99]), value_col="v",
               lo=0, width=10, n_bins=3).take_all()}
    assert got[-1] == (-10, 1)       # underflow
    assert got[0] == (0, 3)
    assert got[1] == (10, 1)
    assert got[2] == (20, 1)
    assert got[3] == (30, 1)         # overflow (99)
    assert len(got) == 5             # every bucket emitted


def test_histogram_oracle_sql_matches_with_negatives(ray_session):
    """Negative values exercise the DuckDB //-truncation guard."""
    import duckdb
    from pdf2dom_ray.functions.histogram import (
        equiwidth_histogram, histogram_oracle_sql)
    rng = np.random.RandomState(251)
    vals = np.concatenate([rng.randint(-40, 140, 300)])
    got = sorted((r["bin_id"], r["bin_lo"], r["n"])
                 for r in equiwidth_histogram(
                     _ds(vals), value_col="v", lo=0, width=10,
                     n_bins=10).take_all())
    sqlv = " UNION ALL ".join(f"SELECT {int(x)} AS v" for x in vals)
    want = sorted(map(tuple, duckdb.sql(histogram_oracle_sql(
        sqlv, value_col="v", lo=0, width=10,
        n_bins=10)).fetchall()))
    assert got == want
    assert sum(n for _, _, n in got) == 300


def test_histogram_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.histogram import equiwidth_histogram
    ds = rd.from_arrow(pa.table({"v": pa.array([], pa.int64())}))
    got = equiwidth_histogram(ds, value_col="v", lo=0, width=10,
                              n_bins=4).take_all()
    # still every 0-filled bucket (the stable-bin-edges contract)
    assert sorted(r["bin_id"] for r in got) == [-1, 0, 1, 2, 3, 4]
    assert all(r["n"] == 0 for r in got)
