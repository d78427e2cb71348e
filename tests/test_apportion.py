"""Hamilton apportionment: exact-sum invariant, quota rule, hand
case with remainder ties, DuckDB window oracle."""

import numpy as np
import pytest


def _ds(rows):
    import ray.data as rd
    return rd.from_items(rows, override_num_blocks=4)


def test_apportion_hand_case_with_tie(ray_session):
    from pdf2dom_ray.functions.apportion import apportion_budget
    # counts 3/3/4, budget 7: base 2/2/2, remainders 1/1/8 → the one
    # leftover unit goes to the largest remainder (c); a/b tie at 1
    rows = ([{"source": "a"}] * 3 + [{"source": "b"}] * 3
            + [{"source": "c"}] * 4)
    got = {r["key"]: r["quota"]
           for r in apportion_budget(_ds(rows), budget=7).take_all()}
    assert got == {"a": 2, "b": 2, "c": 3}


@pytest.mark.parametrize("budget", [1, 13, 97, 1000])
def test_apportion_sum_and_quota_rule(ray_session, budget):
    from pdf2dom_ray.functions.apportion import apportion_budget
    rng = np.random.RandomState(131)
    rows = [{"source": f"s{rng.randint(6)}"} for _ in range(400)]
    out = apportion_budget(_ds(rows), budget=budget).take_all()
    assert sum(r["quota"] for r in out) == budget
    total = sum(r["n_rows"] for r in out)
    for r in out:                      # quota rule: |q − B·n/N| < 1
        exact = budget * r["n_rows"] / total
        assert exact - 1 < r["quota"] < exact + 1


def test_apportion_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.apportion import (apportion_budget,
                                                 apportion_oracle_sql)
    rng = np.random.RandomState(137)
    rows = [{"source": f"s{rng.randint(9)}"} for _ in range(300)]
    got = sorted((r["key"], r["n_rows"], r["quota"]) for r in
                 apportion_budget(_ds(rows), budget=53).take_all())
    vals = " UNION ALL ".join(f"SELECT '{r['source']}' AS source"
                              for r in rows)
    want = sorted(map(tuple, duckdb.sql(
        apportion_oracle_sql(vals, budget=53)).fetchall()))
    assert got == want


def test_apportion_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.apportion import apportion_budget
    ds = rd.from_arrow(pa.table({"source": pa.array([], pa.string())}))
    assert apportion_budget(ds, budget=10).take_all() == []


def test_apportion_weighted_matches_and_sums(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.apportion import apportion_weighted
    rows = [{"key": "a", "w": 30}, {"key": "b", "w": 50},
            {"key": "c", "w": 21}]
    got = {r["key"]: (r["w"], r["quota"])
           for r in apportion_weighted(rd.from_items(rows, override_num_blocks=4),
                                       budget=10).take_all()}
    # shares 2.97/4.95/2.08 → base 2/4/2, remainders .97/.95/.08
    assert got == {"a": (30, 3), "b": (50, 5), "c": (21, 2)}
    assert sum(q for _, q in got.values()) == 10


def test_apportion_weighted_all_zero_uniform(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.apportion import apportion_weighted
    rows = [{"key": k, "w": 0} for k in "abc"]
    got = {r["key"]: r["quota"]
           for r in apportion_weighted(rd.from_items(rows, override_num_blocks=4),
                                       budget=7).take_all()}
    assert sum(got.values()) == 7
    assert max(got.values()) - min(got.values()) <= 1
