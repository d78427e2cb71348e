"""Spearman rank correlation: brute rank reference, ties, extremes,
DuckDB window-RANK oracle."""

import numpy as np
import pytest


def _ref(a, b):
    """Competition-rank Spearman components by brute force."""
    def rank(v):
        v = np.asarray(v)
        return np.array([1 + int((v < x).sum()) for x in v],
                        dtype=np.int64)
    d = rank(a) - rank(b)
    n = len(a)
    sum_d2 = int((d * d).sum())
    return n, sum_d2, 1_000_000 - (6_000_000 * sum_d2) \
        // (n * (n * n - 1))


def _ds(a, b):
    import ray.data as rd
    return rd.from_items([{"ma": int(x), "mb": int(y)}
                          for x, y in zip(a, b)], override_num_blocks=4)


def test_spearman_matches_reference_with_ties(ray_session):
    from pdf2dom_ray.functions.rankcorr import spearman_rank
    rng = np.random.RandomState(9)
    a = rng.randint(0, 20, 150)            # heavy ties
    b = (a + rng.randint(-5, 5, 150)).clip(0)
    got = spearman_rank(_ds(a, b), "ma", "mb").take_all()[0]
    assert (got["n"], got["sum_d2"], got["rho_ppm"]) == _ref(a, b)


@pytest.mark.parametrize("flip,expect", [(False, 1_000_000),
                                         (True, -1_000_000)])
def test_spearman_perfect_and_inverse(ray_session, flip, expect):
    from pdf2dom_ray.functions.rankcorr import spearman_rank
    a = np.arange(1, 41)
    b = a[::-1] if flip else a * 7          # monotone map keeps ranks
    got = spearman_rank(_ds(a, b), "ma", "mb").take_all()[0]
    assert got["rho_ppm"] == expect


def test_spearman_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.rankcorr import (spearman_oracle_sql,
                                                spearman_rank)
    rng = np.random.RandomState(11)
    a = rng.randint(0, 30, 120)
    b = rng.randint(0, 30, 120)             # ~independent → rho ≈ 0
    got = spearman_rank(_ds(a, b), "ma", "mb").take_all()[0]
    vals = " UNION ALL ".join(
        f"SELECT {x} AS ma, {y} AS mb"
        for x, y in zip(a.tolist(), b.tolist()))
    want = duckdb.sql(spearman_oracle_sql(vals)).fetchall()[0]
    assert (got["n"], got["sum_d2"], got["rho_ppm"]) == want
    assert abs(got["rho_ppm"]) < 400_000


def test_spearman_degenerate_n(ray_session):
    from pdf2dom_ray.functions.rankcorr import spearman_rank
    got = spearman_rank(_ds([5], [9]), "ma", "mb").take_all()[0]
    assert (got["n"], got["sum_d2"], got["rho_ppm"]) == (1, 0, 0)
