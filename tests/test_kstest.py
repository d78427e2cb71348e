"""Two-sample KS distance: brute CDF reference, shift sensitivity,
DuckDB oracle."""

import numpy as np


def _ref(rows):
    by = {}
    for r in rows:
        by.setdefault(r["source"], []).append(r["v"])
    srcs = sorted(by)
    out = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            xa, xb = sorted(by[a]), sorted(by[b])
            na, nb = len(xa), len(xb)
            grid = sorted(set(xa) | set(xb))
            d = max(abs(sum(1 for x in xa if x <= v) * nb
                        - sum(1 for x in xb if x <= v) * na)
                    for v in grid)
            out[(a, b)] = (d, na, nb, (1_000_000 * d) // (na * nb))
    return out


def _rows():
    rng = np.random.RandomState(29)
    return ([{"source": "a", "v": int(x)}
             for x in rng.normal(50, 10, 80).astype(int)]
            + [{"source": "b", "v": int(x)}
               for x in rng.normal(70, 10, 60).astype(int)]
            + [{"source": "c", "v": int(x)}
               for x in rng.normal(50, 10, 70).astype(int)])


def test_ks_matches_brute_reference(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.kstest import ks_pairwise
    rows = _rows()
    got = {(r["source_a"], r["source_b"]):
           (r["d_num"], r["n_a"], r["n_b"], r["ks_ppm"])
           for r in ks_pairwise(rd.from_items(rows, override_num_blocks=4)).take_all()}
    assert got == _ref(rows)
    # the +20 shifted pair dominates the same-distribution pair
    assert got[("a", "b")][3] > got[("a", "c")][3]


def test_ks_identical_and_disjoint_extremes(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.kstest import ks_pairwise
    rows = ([{"source": "x", "v": i % 5} for i in range(40)]
            + [{"source": "y", "v": i % 5} for i in range(40)]
            + [{"source": "z", "v": 100 + i % 3} for i in range(30)])
    got = {(r["source_a"], r["source_b"]): r["ks_ppm"]
           for r in ks_pairwise(rd.from_items(rows, override_num_blocks=4)).take_all()}
    assert got[("x", "y")] == 0            # identical distributions
    assert got[("x", "z")] == 1_000_000    # fully separated supports


def test_ks_oracle_sql_matches(ray_session):
    import duckdb
    import ray.data as rd
    from pdf2dom_ray.functions.kstest import (ks_oracle_sql,
                                              ks_pairwise)
    rows = _rows()
    got = sorted((r["source_a"], r["source_b"], r["d_num"],
                  r["n_a"], r["n_b"], r["ks_ppm"])
                 for r in ks_pairwise(rd.from_items(rows, override_num_blocks=4)).take_all())
    vals = " UNION ALL ".join(
        f"SELECT '{r['source']}' AS source, {r['v']} AS v"
        for r in rows)
    want = sorted(map(tuple, duckdb.sql(ks_oracle_sql(vals))
                      .fetchall()))
    assert got == want


def test_ks_single_source_empty(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.kstest import ks_pairwise
    got = ks_pairwise(rd.from_items(
        [{"source": "only", "v": 1}], override_num_blocks=4)).take_all()
    assert got == []
