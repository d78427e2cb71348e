"""Skyline operator: brute dominance reference, ties, partition
invariance, DuckDB oracle."""

import numpy as np
import pytest


def _ds(rows, n_blocks=1):
    import ray.data as rd
    ds = rd.from_items(rows, override_num_blocks=4)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _brute(rows):
    pts = [(r["doc_id"], r["x"], r["y"]) for r in rows]
    out = []
    for i, x, y in pts:
        if not any((bx >= x and by >= y and (bx > x or by > y))
                   for _, bx, by in pts):
            out.append((i, x, y))
    return sorted(out)


def _got(rows, **kw):
    from pdf2dom_ray.functions.skyline import skyline2d
    return sorted((r["doc_id"], r["x"], r["y"])
                  for r in skyline2d(_ds(rows, **kw), x_col="x",
                                     y_col="y").take_all())


@pytest.mark.parametrize("n_blocks", [1, 7])
def test_skyline_matches_brute_any_partitioning(ray_session,
                                                n_blocks):
    rng = np.random.RandomState(181)
    rows = [{"doc_id": i, "x": int(rng.randint(0, 40)),
             "y": int(rng.randint(0, 40))} for i in range(250)]
    assert _got(rows, n_blocks=n_blocks) == _brute(rows)


def test_skyline_ties_both_kept_and_domination(ray_session):
    rows = [{"doc_id": 0, "x": 5, "y": 5},
            {"doc_id": 1, "x": 5, "y": 5},     # exact tie → both
            {"doc_id": 2, "x": 5, "y": 4},     # dominated (y)
            {"doc_id": 3, "x": 9, "y": 1},     # frontier corner
            {"doc_id": 4, "x": 1, "y": 9}]     # frontier corner
    assert _got(rows) == [(0, 5, 5), (1, 5, 5), (3, 9, 1),
                          (4, 1, 9)]


def test_skyline_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.skyline import skyline_oracle_sql
    rng = np.random.RandomState(191)
    rows = [{"doc_id": i, "x": int(rng.randint(0, 30)),
             "y": int(rng.randint(0, 30))} for i in range(200)]
    vals = " UNION ALL ".join(
        f"SELECT {r['doc_id']} AS doc_id, {r['x']} AS x,"
        f" {r['y']} AS y" for r in rows)
    import duckdb as dk
    want = sorted(map(tuple, dk.sql(
        skyline_oracle_sql(vals, x_col="x", y_col="y")).fetchall()))
    assert _got(rows) == want


def test_skyline_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.skyline import skyline2d
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                 "x": pa.array([], pa.int64()),
                                 "y": pa.array([], pa.int64())}))
    assert skyline2d(ds, x_col="x", y_col="y").take_all() == []
