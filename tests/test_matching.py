"""Maximal matching (functions/matching.py)."""
import numpy as np
import pandas as pd
import ray.data as rd

from pdf2dom_ray.functions.matching import maximal_matching


def _edges(pairs):
    return rd.from_items([{"src": a, "target": b} for a, b in pairs], override_num_blocks=4)


def _is_matching(df):
    nodes = np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()])
    return len(nodes) == len(np.unique(nodes))


def test_matching_is_matching_and_maximal_on_path(ray_session):
    # path 0-1-2-3-4-5: any maximal matching has >= 2 edges and no
    # shared endpoints
    got = maximal_matching(
        _edges([(i, i + 1) for i in range(5)]),
        rounds=6).to_pandas()
    assert _is_matching(got)
    assert len(got) >= 2
    # maximality: every unmatched edge touches a matched node
    matched_nodes = set(got.a) | set(got.b)
    for a, b in [(i, i + 1) for i in range(5)]:
        if (a, b) not in set(zip(got.a, got.b)):
            assert a in matched_nodes or b in matched_nodes


def test_matching_star_picks_one(ray_session):
    got = maximal_matching(
        _edges([(0, i) for i in range(1, 6)]),
        rounds=4).to_pandas()
    assert len(got) == 1 and _is_matching(got)


def test_matching_distributed_matches_driver(ray_session):
    pairs = [(i, i + 1) for i in range(12)] + [(0, 6), (3, 9)]
    drv = maximal_matching(_edges(pairs), rounds=6).to_pandas()
    bsp = maximal_matching(_edges(pairs), rounds=6,
                           driver_edge_limit=0).to_pandas() \
        .reset_index(drop=True)
    assert drv.astype("int64").equals(bsp.astype("int64"))


def test_matching_dups_selfloops(ray_session):
    got = maximal_matching(
        _edges([(0, 1), (1, 0), (2, 2), (1, 2)]),
        rounds=4).to_pandas()
    assert _is_matching(got)
    assert len(got) == 1
