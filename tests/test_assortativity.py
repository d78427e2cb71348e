"""Degree assortativity moments: hand reference, both attach paths,
int and string node ids, DuckDB oracle."""

import collections

import numpy as np
import pyarrow as pa
import pytest

COLS = ("m", "sx", "sy", "sxy", "sxx", "syy")


def _ref(edges):
    e = sorted(set(edges))
    deg = collections.Counter()
    for u, v in e:
        deg[u] += 1
        deg[v] += 1
    x = np.array([deg[u] for u, _ in e], dtype=np.int64)
    y = np.array([deg[v] for _, v in e], dtype=np.int64)
    return (len(e), int(x.sum()), int(y.sum()), int((x * y).sum()),
            int((x * x).sum()), int((y * y).sum()))


def _ds(edges):
    import ray.data as rd
    return rd.from_items([{"src": u, "target": v} for u, v in edges], override_num_blocks=4)


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_assortativity_matches_reference_both_paths(ray_session,
                                                    limit):
    from pdf2dom_ray.functions.assortativity import \
        assortativity_moments
    rng = np.random.RandomState(17)
    edges = [(int(u), int(v))
             for u, v in rng.randint(0, 30, size=(150, 2))]
    got = assortativity_moments(
        _ds(edges + edges[:5]),          # dup edges collapse
        broadcast_limit=limit).take_all()[0]
    assert tuple(got[c] for c in COLS) == _ref(edges)


def test_assortativity_string_ids_star(ray_session):
    from pdf2dom_ray.functions.assortativity import \
        assortativity_moments
    # star: hub degree 4, leaves degree 1 → disassortative moments
    edges = [("hub", f"leaf{i}") for i in range(4)]
    got = assortativity_moments(_ds(edges)).take_all()[0]
    assert tuple(got[c] for c in COLS) == _ref(edges) \
        == (4, 16, 4, 16, 64, 4)


def test_assortativity_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.assortativity import (
        assortativity_moments, assortativity_oracle_sql)
    rng = np.random.RandomState(19)
    edges = [(f"n{u}", f"n{v}")
             for u, v in rng.randint(0, 20, size=(90, 2))]
    got = assortativity_moments(_ds(edges)).take_all()[0]
    vals = " UNION ALL ".join(
        f"SELECT '{u}' AS src, '{v}' AS target" for u, v in edges)
    want = duckdb.sql(assortativity_oracle_sql(vals)).fetchall()[0]
    assert tuple(got[c] for c in COLS) == want


def test_assortativity_empty(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.assortativity import \
        assortativity_moments
    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                 "target": pa.array([], pa.int64())}))
    got = assortativity_moments(ds).take_all()[0]
    assert all(got[c] == 0 for c in COLS)
