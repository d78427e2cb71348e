"""Robust outliers: brute lower-median/MAD reference, planted
outliers, even/odd counts, DuckDB oracle."""

import numpy as np


def _ds(rows):
    import ray.data as rd
    return rd.from_items(rows, override_num_blocks=4)


def _ref(rows, k=4):
    by = {}
    for r in rows:
        by.setdefault(r["source"], []).append(r["n_chars"])
    out = {}
    for key, vs in by.items():
        vs = sorted(vs)
        n = len(vs)
        med = vs[(n + 1) // 2 - 1]
        dev = sorted(abs(x - med) for x in vs)
        mad = dev[(n + 1) // 2 - 1]
        n_out = sum(1 for x in vs if abs(x - med) > k * mad)
        out[key] = (n, med, mad, n_out)
    return out


def test_robust_matches_reference_with_planted(ray_session):
    from pdf2dom_ray.functions.robust import robust_outliers
    rng = np.random.RandomState(197)
    rows = [{"source": f"s{rng.randint(3)}",
             "n_chars": int(rng.normal(50, 5))} for _ in range(200)]
    rows += [{"source": "s1", "n_chars": 9999}] * 2
    got = {r["key"]: (r["n_rows"], r["med"], r["mad"],
                      r["n_outliers"])
           for r in robust_outliers(_ds(rows)).take_all()}
    assert got == _ref(rows)
    assert got["s1"][3] >= 2


def test_robust_even_odd_lower_median(ray_session):
    from pdf2dom_ray.functions.robust import robust_outliers
    rows = ([{"source": "even", "n_chars": v}
             for v in (1, 2, 3, 4)]           # lower median = 2
            + [{"source": "odd", "n_chars": v}
               for v in (1, 2, 3)])           # median = 2
    got = {r["key"]: r["med"]
           for r in robust_outliers(_ds(rows)).take_all()}
    assert got == {"even": 2, "odd": 2}


def test_robust_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.robust import (robust_oracle_sql,
                                              robust_outliers)
    rng = np.random.RandomState(199)
    rows = [{"source": f"s{rng.randint(4)}",
             "n_chars": int(rng.randint(0, 60))} for _ in range(250)]
    got = sorted(tuple(r[c] for c in ("key", "n_rows", "med", "mad",
                                      "n_outliers"))
                 for r in robust_outliers(_ds(rows)).take_all())
    vals = " UNION ALL ".join(
        f"SELECT '{r['source']}' AS source, {r['n_chars']} AS n_chars"
        for r in rows)
    want = sorted(map(tuple, duckdb.sql(robust_oracle_sql(vals))
                      .fetchall()))
    assert got == want


def test_robust_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.robust import robust_outliers
    ds = rd.from_arrow(pa.table({
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64())}))
    assert robust_outliers(ds).take_all() == []
