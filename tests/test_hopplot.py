"""Neighborhood function (hop plot): both paths, saturation, oracle."""

import pytest

# chain a->b->c->d plus an isolated pair x->y
EDGES = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")]


def _ds(rows):
    import ray.data as rd
    return rd.from_items([{"src": u, "target": v} for u, v in rows], override_num_blocks=4)


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_hopplot_matches_reference_both_paths(ray_session, limit):
    from pdf2dom_ray.functions.hopplot import (neighborhood_function,
                                               neighborhood_reference)
    got = {r["radius"]: r["n_pairs"]
           for r in neighborhood_function(
               _ds(EDGES + [("a", "b")]), radius=4,
               driver_edge_limit=limit).take_all()}
    want = neighborhood_reference(EDGES, radius=4)
    assert got == dict(enumerate(want))
    # hand-check: 6 nodes; r1 adds 4 edges; chain saturates at r3
    assert got[0] == 6 and got[1] == 10
    assert got[3] == got[4]               # saturated


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_hopplot_saturation_fills_levels(ray_session, limit):
    from pdf2dom_ray.functions.hopplot import neighborhood_function
    rows = neighborhood_function(_ds([("a", "b")]), radius=6,
                                 driver_edge_limit=limit).take_all()
    assert [r["radius"] for r in rows] == list(range(7))
    # saturates at r=1 (2 nodes, 3 pairs) and stays constant
    assert [r["n_pairs"] for r in rows] == [2, 3, 3, 3, 3, 3, 3]


def test_hopplot_partition_invariance(ray_session):
    import numpy as np
    from pdf2dom_ray.functions.hopplot import (neighborhood_function,
                                               neighborhood_reference)
    rng = np.random.RandomState(37)
    rows = [(f"u{u}", f"u{v}")
            for u, v in rng.randint(0, 40, size=(200, 2))]
    want = dict(enumerate(neighborhood_reference(rows, radius=3)))
    for n_part in (1, 2, 3):
        got = {r["radius"]: r["n_pairs"]
               for r in neighborhood_function(
                   _ds(rows), radius=3, driver_edge_limit=0,
                   n_part=n_part).take_all()}
        assert got == want, n_part


def test_hopplot_oracle_sql_matches(ray_session):
    import duckdb
    import numpy as np
    from pdf2dom_ray.functions.hopplot import (neighborhood_function,
                                               neighborhood_oracle_sql)
    rng = np.random.RandomState(41)
    pairs = rng.randint(0, 30, size=(120, 2))
    rows = [(f"n{u}", f"n{v}") for u, v in pairs]
    got = sorted((r["radius"], r["n_pairs"]) for r in
                 neighborhood_function(_ds(rows), radius=4).take_all())
    vals = ", ".join(f"('n{u}', 'n{v}')" for u, v in pairs)
    want = sorted(map(tuple, duckdb.sql(neighborhood_oracle_sql(
        f"SELECT DISTINCT src, target FROM (VALUES {vals}) "
        f"AS t(src, target)", radius=4)).fetchall()))
    assert got == want


def test_effective_diameter_hand_case(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.hopplot import effective_diameter
    # directed 4-cycle: N(0)=4, N(1)=8, N(2)=12, N(3)=16 pairs;
    # 90% of N(3)=14.4 -> first h with 100*N >= 90*16=1440 is h=3
    edges = rd.from_items([{"src": i, "target": (i + 1) % 4}
                           for i in range(4)], override_num_blocks=4)
    got = effective_diameter(edges, radius=3, pct=90).to_pandas()
    assert got.values.tolist() == [[3, 16, 16]]
    # pct=50: 100*N >= 800 first at h=1 (N=8)
    got2 = effective_diameter(edges, radius=3, pct=50).to_pandas()
    assert got2.values.tolist() == [[1, 8, 16]]


def test_effective_diameter_empty(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.hopplot import effective_diameter
    got = effective_diameter(
        rd.from_items([{"src": 1, "target": 1}], override_num_blocks=4),
        radius=2).to_pandas()
    # self-loop only: N(r) = 1 pair at every level -> diameter 0
    assert got.eff_diameter.tolist() == [0]
