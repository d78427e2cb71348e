"""HyperBall neighborhood sketch: driver path, BSP path, hand
reference (exact balls + reference registers), estimate accuracy,
oracle SQL."""

import hashlib

import pyarrow as pa
import pytest


def _ball(edges, radius):
    """node -> exact ball(node, radius) member set (incoming ≤radius
    reachability, self included) via per-source BFS."""
    es = {tuple(e) for e in edges}
    nodes = sorted({n for e in es for n in e})
    out = {n: [] for n in nodes}
    for u, v in es:
        out[u].append(v)
    ball = {n: {n} for n in nodes}
    for s in nodes:
        dist = {s: 0}
        frontier = [s]
        for _ in range(radius):
            nxt = []
            for u in frontier:
                for v in out[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            frontier = nxt
        for v in dist:
            ball[v].add(s)
    return ball


def _ref_regsum(members):
    """Reference HLL register summary over a member set (m=16
    registers, md5 of the decimal string): (Σ 2^(34 - M_j),
    #zero registers)."""
    regs = [0] * 16
    for x in members:
        h = hashlib.md5(str(x).encode()).hexdigest()
        j = int(h[:4], 16) % 16
        v32 = int(h[4:12], 16)
        rho = 33 if v32 == 0 else 33 - v32.bit_length()
        regs[j] = max(regs[j], rho)
    return sum(1 << (34 - m) for m in regs), regs.count(0)


EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (2, 2)]


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_hyperball_matches_reference_both_paths(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.hyperball import hyperball_sketch
    rows = EDGES + [(0, 1), (2, 3)]       # duplicates are no-ops
    ds = rd.from_items([{"src": u, "target": v} for u, v in rows], override_num_blocks=4)
    got = {r["node"]: (r["ball_regsum"], r["zero_regs"])
           for r in hyperball_sketch(
               ds, radius=4, driver_edge_limit=limit).take_all()}
    want = {n: _ref_regsum(b) for n, b in _ball(EDGES, 4).items()}
    assert got == want


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_hyperball_radius_and_string_ids(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.hyperball import hyperball_sketch
    chain = [("a", "b"), ("b", "c"), ("c", "d")]
    ds = rd.from_items([{"src": u, "target": v} for u, v in chain], override_num_blocks=4)
    for radius in (1, 2, 3):
        got = {r["node"]: (r["ball_regsum"], r["zero_regs"])
               for r in hyperball_sketch(
                   ds, radius=radius,
                   driver_edge_limit=limit).take_all()}
        want = {n: _ref_regsum(b)
                for n, b in _ball(chain, radius).items()}
        assert got == want, radius


def test_hyperball_partition_invariance(ray_session):
    import numpy as np
    import ray.data as rd
    from pdf2dom_ray.functions.hyperball import hyperball_sketch
    rng = np.random.RandomState(7)
    rows = [{"src": int(u), "target": int(v)}
            for u, v in rng.randint(0, 60, size=(400, 2))]
    ds = rd.from_items(rows, override_num_blocks=4)
    want = sorted((r["node"], r["ball_regsum"], r["zero_regs"]) for r
                  in hyperball_sketch(ds, radius=4).take_all())
    for n_part in (1, 2, 3):
        got = sorted((r["node"], r["ball_regsum"], r["zero_regs"])
                     for r in hyperball_sketch(
                         ds, radius=4, driver_edge_limit=0,
                         n_part=n_part).take_all())
        assert got == want, n_part


def test_hyperball_estimate_tracks_exact_ball_size(ray_session):
    import numpy as np
    import ray.data as rd
    from pdf2dom_ray.functions.hyperball import (hll_ball_estimate,
                                                 hyperball_sketch)
    rng = np.random.RandomState(11)
    pairs = [(int(u), int(v)) for u, v in rng.randint(0, 300,
                                                      size=(900, 2))]
    ds = rd.from_items([{"src": u, "target": v} for u, v in pairs], override_num_blocks=4)
    got = {r["node"]: (r["ball_regsum"], r["zero_regs"])
           for r in hyperball_sketch(ds, radius=3).take_all()}
    exact = {n: len(b) for n, b in _ball(pairs, 3).items()}
    ests = hll_ball_estimate(
        np.array([got[n][0] for n in sorted(got)]),
        np.array([got[n][1] for n in sorted(got)]))
    true = np.array([exact[n] for n in sorted(got)], dtype=float)
    # m=16 with linear-counting small-range correction: mean relative
    # error over 300 balls lands ~0.16 on this seed; 0.25 bounds it
    rel = np.abs(ests - true) / true
    assert rel.mean() < 0.25, rel.mean()


def test_hyperball_empty_and_self_loops_only(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.hyperball import hyperball_sketch
    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "target": pa.array([], pa.int64())}))
    assert hyperball_sketch(empty).take_all() == []
    loops = rd.from_items([{"src": 3, "target": 3}], override_num_blocks=4)
    got = hyperball_sketch(loops).take_all()
    assert [(r["node"], r["ball_regsum"], r["zero_regs"])
            for r in got] == [(3, *_ref_regsum({3}))]


def test_hyperball_oracle_sql_matches(ray_session):
    import duckdb
    import numpy as np
    import ray.data as rd
    from pdf2dom_ray.functions.hyperball import (hyperball_oracle_sql,
                                                 hyperball_sketch)
    rng = np.random.RandomState(29)
    pairs = rng.randint(0, 40, size=(120, 2))
    ds = rd.from_items([{"src": int(u), "target": int(v)}
                        for u, v in pairs], override_num_blocks=4)
    got = sorted((r["node"], r["ball_regsum"], r["zero_regs"])
                 for r in hyperball_sketch(ds, radius=3).take_all())
    vals = ", ".join(f"({u}, {v})" for u, v in pairs)
    sql = hyperball_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, target)", radius=3)
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want
