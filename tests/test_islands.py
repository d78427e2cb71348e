"""Gaps-and-islands: hand streaks, cross-batch dedup, DuckDB
DENSE_RANK oracle."""

import datetime

import numpy as np


def _ds(rows):
    import ray.data as rd
    return rd.from_items(rows, override_num_blocks=4)


def _t(h, m=0):
    return datetime.datetime(2024, 6, 1) + datetime.timedelta(
        hours=h, minutes=m)


def test_islands_hand_streaks(ray_session):
    from pdf2dom_ray.functions.islands import activity_islands
    rows = ([{"user_id": 1, "ts": _t(h)} for h in (0, 1, 2, 5, 6, 9)]
            + [{"user_id": 1, "ts": _t(1, 30)}]   # same hour dedups
            + [{"user_id": 2, "ts": _t(4)}])
    got = {r["key"]: (r["n_active_hours"], r["n_islands"],
                      r["longest_island"])
           for r in activity_islands(_ds(rows)).take_all()}
    # user 1: hours {0,1,2,5,6,9} → islands [0-2],[5-6],[9]
    assert got == {1: (6, 3, 3), 2: (1, 1, 1)}


def test_islands_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.islands import (activity_islands,
                                               islands_oracle_sql)
    rng = np.random.RandomState(229)
    rows = [{"user_id": int(rng.randint(8)),
             "ts": _t(int(rng.randint(72)), int(rng.randint(60)))}
            for _ in range(400)]
    got = sorted(tuple(r[c] for c in ("key", "n_active_hours",
                                     "n_islands", "longest_island"))
                 for r in activity_islands(_ds(rows)).take_all())
    vals = " UNION ALL ".join(
        f"SELECT {r['user_id']} AS user_id, TIMESTAMP '{r['ts']}'"
        f" AS ts" for r in rows)
    want = sorted(map(tuple, duckdb.sql(islands_oracle_sql(vals))
                      .fetchall()))
    assert got == want


def test_islands_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.islands import activity_islands
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us"))}))
    assert activity_islands(ds).take_all() == []
