"""Pivot-sampled stress centrality: driver path, BSP path, brute
shortest-path-enumeration reference, DuckDB oracle."""

import collections
import hashlib

import pyarrow as pa
import pytest

# diamond (two shortest 0→3 paths) + tail + shortcut + self-loop
EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (4, 5), (0, 3),
         (5, 5)]


def _ref(edges, pivots, radius, salt="stress"):
    """Brute enumeration of every ≤radius shortest path from each
    md5-elected pivot; interior nodes counted once per path."""
    nodes = sorted({u for e in edges for u in e})
    adj = collections.defaultdict(list)
    for u, v in set(edges):
        adj[u].append(v)
    piv = sorted(nodes, key=lambda n: (
        hashlib.md5(f"{salt}:{n}".encode()).hexdigest(), n))[:pivots]
    stress = collections.Counter()
    for s in piv:
        dist, paths, frontier = {s: 0}, {s: [[s]]}, [s]
        for level in range(1, radius + 1):
            nf, newp = [], {}
            for u in frontier:
                for v in adj[u]:
                    if v not in dist or dist[v] == level:
                        if v not in dist:
                            dist[v] = level
                            nf.append(v)
                        newp.setdefault(v, []).extend(
                            p + [v] for p in paths[u])
            paths.update(newp)
            frontier = list(dict.fromkeys(nf))
        for ps in paths.values():
            for p in ps:
                for interior in p[1:-1]:
                    stress[interior] += 1
    return {n: stress.get(n, 0) for n in nodes}


def _ds(rows):
    import ray.data as rd
    return rd.from_items([{"src": u, "target": v} for u, v in rows], override_num_blocks=4)


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_stress_matches_reference_both_paths(ray_session, limit):
    from pdf2dom_ray.functions.stress import stress_centrality
    got = {r["node"]: r["stress_w"] for r in stress_centrality(
        _ds(EDGES + [(0, 1)]), pivots=8, radius=4,
        driver_edge_limit=limit).take_all()}
    assert got == _ref(EDGES, 8, 4)
    assert got[3] == 6          # σ=3 routes into 3, ×(4 then 5) beyond


def test_stress_pivot_subset_and_radius(ray_session):
    from pdf2dom_ray.functions.stress import stress_centrality
    got = {r["node"]: r["stress_w"] for r in stress_centrality(
        _ds(EDGES), pivots=2, radius=2).take_all()}
    assert got == _ref(EDGES, 2, 2)


def test_stress_partition_invariance(ray_session):
    from pdf2dom_ray.functions.stress import stress_centrality
    import numpy as np
    rng = np.random.RandomState(43)
    rows = [(f"u{u}", f"u{v}")
            for u, v in rng.randint(0, 40, size=(200, 2))]
    base = None
    for n_part in (1, 3):
        got = sorted((r["node"], r["stress_w"])
                     for r in stress_centrality(
                         _ds(rows), pivots=6, radius=3,
                         driver_edge_limit=0,
                         n_part=n_part).take_all())
        base = base or got
        assert got == base
    drv = sorted((r["node"], r["stress_w"])
                 for r in stress_centrality(
                     _ds(rows), pivots=6, radius=3).take_all())
    assert drv == base


def test_stress_oracle_sql_matches(ray_session):
    import duckdb
    import numpy as np
    from pdf2dom_ray.functions.stress import (stress_centrality,
                                              stress_oracle_sql)
    rng = np.random.RandomState(44)
    pairs = rng.randint(0, 30, size=(120, 2))
    rows = [(int(u), int(v)) for u, v in pairs]
    got = sorted((r["node"], r["stress_w"]) for r in
                 stress_centrality(_ds(rows), pivots=5,
                                   radius=4).take_all())
    vals = ", ".join(f"({u}, {v})" for u, v in rows)
    want = sorted(map(tuple, duckdb.sql(stress_oracle_sql(
        f"SELECT src, target FROM (VALUES {vals}) AS t(src, target)",
        pivots=5, radius=4)).fetchall()))
    assert got == want


def test_stress_empty_edges(ray_session):
    from pdf2dom_ray.functions.stress import stress_centrality
    ds = pa.table({"src": pa.array([], pa.int64()),
                   "target": pa.array([], pa.int64())})
    import ray.data as rd
    assert stress_centrality(rd.from_arrow(ds)).take_all() == []
