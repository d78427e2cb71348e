"""P==1 BSP layouts: ``options(num_returns=1)`` hands back a bare ref
to the WHOLE scatter return value instead of unpacking it, so every
graph operator's single-shard path needs the piece-not-tuple return
(graphbsp._split_edge_block + each module's scatter). A single-shard
run is also the strongest partition-invariance anchor: zero exchange
concurrency, pure recurrence."""

import ray.data as rd


EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a"),
         ("a", "b")]          # dup edge


def _ds(pairs):
    return rd.from_items([{"src": u, "target": v} for u, v in pairs], override_num_blocks=4)


def test_pagerank_single_shard(ray_session):
    from pdf2dom_ray.functions.pagerank import (SCALE, _pagerank_bsp,
                                                pagerank_reference)
    got = {r["url"]: r["rank"]
           for r in _pagerank_bsp(_ds(EDGES), 4, SCALE, 1).take_all()}
    assert got == pagerank_reference(EDGES, iterations=4)


def test_hits_single_shard(ray_session):
    from pdf2dom_ray.functions.hits import SCALE, _hits_bsp, hits_reference
    got = {r["url"]: (r["authority"], r["hub"])
           for r in _hits_bsp(_ds(EDGES), 4, SCALE, 1).take_all()}
    assert got == hits_reference(EDGES, iterations=4)


def test_bfs_single_shard(ray_session):
    # BFS's BSP path types nodes int64 (doc-id graphs), so integer ids
    from pdf2dom_ray.functions.bfs import bfs_depths
    iedges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (0, 1)]
    got = {r["node"]: r["depth"]
           for r in bfs_depths(_ds(iedges), [1], rounds=8,
                               driver_edge_limit=0, n_part=1).take_all()}
    assert got == {1: 0, 2: 1, 0: 2, 3: 2}


def test_cc_single_shard(ray_session):
    from pdf2dom_ray.functions.ccomp import cc_labels
    got = {r["node"]: r["component"]
           for r in cc_labels(_ds(EDGES + [("x", "y")]), rounds=8,
                              driver_edge_limit=0, n_part=1).take_all()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a",
                   "x": "x", "y": "x"}
