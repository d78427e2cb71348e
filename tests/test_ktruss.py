"""k-truss peel (functions/ktruss.py)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from pdf2dom_ray.functions.ktruss import ktruss_edges


def _edges(pairs):
    return rd.from_items([{"src": a, "target": b} for a, b in pairs], override_num_blocks=4)


def test_ktruss_clique_survives_bridge_peels(ray_session):
    # two 4-cliques joined by one bridge: every clique edge has 2
    # common neighbors (survives k=4); the bridge has none
    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a + 10, b + 10) for a, b in k4a]
    got = ktruss_edges(_edges(k4a + k4b + [(0, 10)]),
                       k=4, rounds=3).to_pandas()
    assert len(got) == 12
    assert (got.support == 2).all()
    assert not ((got.a == 0) & (got.b == 10)).any()


def test_ktruss_cascade_peel(ray_session):
    # triangle with a pendant triangle sharing one edge: k=4 kills
    # everything (no edge has 2 common neighbors), k=3 keeps both
    tri = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
    assert ktruss_edges(_edges(tri), k=4, rounds=3).to_pandas().empty
    got3 = ktruss_edges(_edges(tri), k=3, rounds=3).to_pandas()
    assert len(got3) == 5


def test_ktruss_distributed_matches_driver(ray_session):
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    extra = [(0, 20), (20, 21), (4, 21)]
    # 2 peel rounds: path identity holds at any round budget
    drv = ktruss_edges(_edges(k5 + extra), k=4,
                       rounds=2).to_pandas()
    bsp = ktruss_edges(_edges(k5 + extra), k=4, rounds=2,
                       driver_edge_limit=0).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert drv.astype("int64").equals(bsp.astype("int64"))


def test_ktruss_dup_and_selfloop_input(ray_session):
    tri = [(0, 1), (1, 0), (1, 2), (0, 2), (2, 2)]
    got = ktruss_edges(_edges(tri), k=3, rounds=2).to_pandas()
    assert len(got) == 3
    assert (got.support == 1).all()


def test_ktruss_k_below_3_raises(ray_session):
    with pytest.raises(ValueError):
        ktruss_edges(_edges([(0, 1)]), k=2)


def test_local_bridges_complement_triangle_edges(ray_session):
    """On two triangles joined by one edge, exactly the joining edge
    is a local bridge (its endpoints share no neighbor)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from pdf2dom_ray.functions.linkpred import edge_neighbor_overlap
    ed = _edges([(0, 1), (1, 2), (0, 2),
                 (10, 11), (11, 12), (10, 12), (2, 10)])
    ov = edge_neighbor_overlap(ed).to_pandas()
    bridges = ov[ov.cn == 0]
    assert bridges[["a", "b"]].values.tolist() == [[2, 10]]


def test_transitivity_bounds_and_consistency(ray_session, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["link_transitivity"](sf_dir).to_pandas()
    t, w, ppm = (int(got.n_triangles[0]), int(got.n_wedges[0]),
                 int(got.transitivity_ppm[0]))
    assert 0 < 3 * t <= w
    assert ppm == (1_000_000 * 3 * t) // w
    # chord-cycle (+1,+2,+3): each node has degree 6, n wedges = 15n,
    # and every node closes triangles — transitivity is substantial
    assert ppm > 200_000
