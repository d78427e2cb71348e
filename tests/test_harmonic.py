"""Bounded-radius harmonic centrality: driver path, BSP path, hand
reference (per-node BFS), oracle SQL."""

import pyarrow as pa
import pytest


def _ref(edges, radius):
    """Exact integer harmonic_w via per-source BFS over the distinct
    directed edge set (duplicates/self-loops are no-ops)."""
    import math
    w = math.lcm(*range(1, radius + 1))
    es = {tuple(e) for e in edges}
    nodes = sorted({n for e in es for n in e})
    out = {n: [] for n in nodes}
    for u, v in es:
        out[u].append(v)
    acc = {n: 0 for n in nodes}
    for s in nodes:
        dist = {s: 0}
        frontier = [s]
        for d in range(1, radius + 1):
            nxt = []
            for u in frontier:
                for v in out[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        for v, d in dist.items():
            if 0 < d:
                acc[v] += w // d
    return acc


# directed path 0->1->2->3->4 plus a chord 0->3 and a self-loop
EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (2, 2)]


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_harmonic_matches_reference_both_paths(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.harmonic import harmonic_centrality
    # duplicate rows must not change the score (OR is idempotent)
    rows = EDGES + [(0, 1), (2, 3)]
    ds = rd.from_items([{"src": u, "target": v} for u, v in rows], override_num_blocks=4)
    got = {r["node"]: r["harmonic_w"]
           for r in harmonic_centrality(
               ds, radius=4, driver_edge_limit=limit).take_all()}
    assert got == _ref(EDGES, 4)
    # hand check: node 3 is reached at d=1 from 2 and 0, d=2 from 1;
    # W=12 -> 12+12+6 = 30
    assert got[3] == 30
    assert got[0] == 0          # nothing reaches node 0


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_harmonic_radius_truncation_and_string_ids(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.harmonic import harmonic_centrality
    chain = [("a", "b"), ("b", "c"), ("c", "d")]
    ds = rd.from_items([{"src": u, "target": v} for u, v in chain], override_num_blocks=4)
    for radius in (1, 2, 3):
        got = {r["node"]: r["harmonic_w"]
               for r in harmonic_centrality(
                   ds, radius=radius,
                   driver_edge_limit=limit).take_all()}
        assert got == _ref(chain, radius), radius
    # radius=1, W=1: each node scores its in-degree
    assert _ref(chain, 1) == {"a": 0, "b": 1, "c": 1, "d": 1}


def test_harmonic_partition_invariance(ray_session):
    import numpy as np
    import ray.data as rd
    from pdf2dom_ray.functions.harmonic import harmonic_centrality
    rng = np.random.RandomState(5)
    rows = [{"src": int(u), "target": int(v)}
            for u, v in rng.randint(0, 60, size=(400, 2))]
    ds = rd.from_items(rows, override_num_blocks=4)
    want = sorted((r["node"], r["harmonic_w"]) for r in
                  harmonic_centrality(ds, radius=4).take_all())
    for n_part in (1, 2, 3):
        got = sorted((r["node"], r["harmonic_w"]) for r in
                     harmonic_centrality(
                         ds, radius=4, driver_edge_limit=0,
                         n_part=n_part).take_all())
        assert got == want, n_part


def test_harmonic_empty_and_self_loops_only(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.harmonic import harmonic_centrality
    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "target": pa.array([], pa.int64())}))
    assert harmonic_centrality(empty).take_all() == []
    loops = rd.from_items([{"src": 3, "target": 3}], override_num_blocks=4)
    got = harmonic_centrality(loops).take_all()
    assert [(r["node"], r["harmonic_w"]) for r in got] == [(3, 0)]


def test_harmonic_oracle_sql_matches(ray_session):
    import duckdb
    import numpy as np
    import ray.data as rd
    from pdf2dom_ray.functions.harmonic import (harmonic_centrality,
                                                harmonic_oracle_sql)
    rng = np.random.RandomState(23)
    pairs = rng.randint(0, 40, size=(120, 2))
    ds = rd.from_items([{"src": int(u), "target": int(v)}
                        for u, v in pairs], override_num_blocks=4)
    got = sorted((r["node"], r["harmonic_w"]) for r in
                 harmonic_centrality(ds, radius=3).take_all())
    vals = ", ".join(f"({u}, {v})" for u, v in pairs)
    sql = harmonic_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, target)", radius=3)
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want
