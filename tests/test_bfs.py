"""BFS shortest-path depths: driver path, BSP path, hand reference."""

import numpy as np
import pyarrow as pa
import pytest


EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 3),
         (7, 8), (8, 7)]          # 7/8: unreachable cycle


def _ref(edges, seeds, rounds):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    dist = {n: None for n in nodes}
    for s in seeds:
        if s in dist:
            dist[s] = 0
    for _ in range(rounds):
        for u, v in edges:
            if dist[u] is not None and \
                    (dist[v] is None or dist[v] > dist[u] + 1):
                dist[v] = dist[u] + 1
    return {n: d for n, d in dist.items() if d is not None}


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_bfs_matches_reference_both_paths(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.bfs import bfs_depths
    ds = rd.from_items([{"src": u, "target": v} for u, v in EDGES]
                       + [{"src": 0, "target": 1}], override_num_blocks=4)     # dup edge
    got = {r["node"]: r["depth"]
           for r in bfs_depths(ds, [0], rounds=8,
                               driver_edge_limit=limit).take_all()}
    assert got == _ref(EDGES, [0], 8)
    assert got[4] == 3 and 7 not in got and 8 not in got


def test_bfs_bounded_rounds_and_multi_seed(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.bfs import bfs_depths
    ds = rd.from_items([{"src": u, "target": v} for u, v in EDGES], override_num_blocks=4)
    got = {r["node"]: r["depth"]
           for r in bfs_depths(ds, [0, 8], rounds=1).take_all()}
    # one round: only direct successors (+ the seeds themselves)
    assert got == {0: 0, 1: 1, 5: 1, 8: 0, 7: 1}
    # a seed absent from the node universe is ignored
    got2 = {r["node"]: r["depth"]
            for r in bfs_depths(ds, [99], rounds=4).take_all()}
    assert got2 == {}


def test_bfs_empty_edges(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.bfs import bfs_depths
    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                 "target": pa.array([], pa.int64())}))
    assert bfs_depths(ds, [0], rounds=3).take_all() == []


def test_influence_subset_of_reachability(ray_session, sf_dir):
    """The IC sample is a BFS over a live-edge SUBgraph: every
    activated node is reachable in the full graph at depth <= its
    activation round, and the spread never exceeds full BFS."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    inf = E.queries()["link_influence"](sf_dir).to_pandas()
    full = E.queries()["link_bfs_depth"](sf_dir).to_pandas()
    assert 0 < len(inf) <= len(full)
    m = inf.merge(full, on="node", suffixes=("_ic", "_full"))
    assert len(m) == len(inf)            # activated ⊆ reachable
    assert (m.depth_full <= m.depth_ic).all()
    assert int(inf.loc[inf.node == 0, "depth"].iloc[0]) == 0


def test_influence_curve_monotone(ray_session, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["influence_curve"](sf_dir).to_pandas()
    assert got.p_ppm.tolist() == [250_000, 500_000, 750_000]
    # nested live-edge subgraphs: spread monotone in p
    assert got.n_activated.is_monotonic_increasing
    # the p=1/2 row equals the standalone link_influence sample
    inf = E.queries()["link_influence"](sf_dir).to_pandas()
    assert int(got.loc[got.p_ppm == 500_000,
                       "n_activated"].iloc[0]) == len(inf)


def test_path_counts_consistent_with_bfs(ray_session, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    pc_ = E.queries()["link_path_counts"](sf_dir).to_pandas()
    bfs = E.queries()["link_bfs_depth"](sf_dir).to_pandas()
    m = pc_.merge(bfs, on="node", suffixes=("_pc", "_bfs"))
    # same reachable set, same depths; sigma >= 1 everywhere and
    # sigma(seed) == 1 at depth 0
    assert len(m) == len(pc_) == len(bfs)
    assert (m.depth_pc == m.depth_bfs).all()
    assert (pc_.sigma >= 1).all()
    assert int(pc_.loc[pc_.depth == 0, "sigma"].iloc[0]) == 1
