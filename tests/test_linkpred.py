"""Per-edge neighbor overlap: hand case, both paths, triangle-free
zeros, DuckDB oracle."""

import numpy as np
import pytest


def _ds(edges):
    import ray.data as rd
    return rd.from_items([{"src": u, "target": v} for u, v in edges], override_num_blocks=4)


def _got(edges, **kw):
    from pdf2dom_ray.functions.linkpred import edge_neighbor_overlap
    return sorted((r["a"], r["b"], r["cn"], r["da"], r["db"],
                   r["jaccard_ppm"])
                  for r in edge_neighbor_overlap(_ds(edges),
                                                 **kw).take_all())


def test_overlap_hand_case(ray_session):
    # K4 minus one edge: (1,2) shares neighbors {3, 4}
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
    got = dict(((a, b), (cn, da, db, j))
               for a, b, cn, da, db, j in _got(edges))
    assert got[(1, 2)] == (2, 3, 3, 500_000)   # cn=2, union=4
    # spoke edges: one common neighbor each
    assert got[(1, 3)][0] == 1 and got[(2, 4)][0] == 1


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_overlap_matches_reference_both_paths(ray_session, limit):
    from pdf2dom_ray.functions.linkpred import edge_overlap_reference
    rng = np.random.RandomState(109)
    edges = [(int(u), int(v))
             for u, v in rng.randint(0, 30, size=(150, 2))]
    got = _got(edges + edges[:5], driver_edge_limit=limit)
    ref = edge_overlap_reference(edges)
    want = sorted((a, b, *vals) for (a, b), vals in ref.items())
    assert got == want


def test_overlap_triangle_free_zeros(ray_session):
    # path graph: no triangles → every edge cn=0, ppm=0
    edges = [(i, i + 1) for i in range(6)]
    got = _got(edges)
    assert all(cn == 0 and j == 0 for _, _, cn, _, _, j in got)
    assert len(got) == 6
    got_d = _got(edges, driver_edge_limit=0)
    assert got == got_d


def test_overlap_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.linkpred import edge_overlap_oracle_sql
    rng = np.random.RandomState(113)
    edges = [(f"n{u}", f"n{v}")
             for u, v in rng.randint(0, 20, size=(90, 2))]
    got = _got(edges)
    vals = " UNION ALL ".join(
        f"SELECT '{u}' AS src, '{v}' AS target" for u, v in edges)
    want = sorted(map(tuple, duckdb.sql(
        edge_overlap_oracle_sql(vals)).fetchall()))
    assert got == want
