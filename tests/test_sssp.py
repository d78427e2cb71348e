"""Weighted SSSP (bounded Bellman-Ford): both paths, min-edge rule."""

import pyarrow as pa
import pytest


# 0→1 (w5), 0→2 (w1), 2→1 (w1): cheapest 0→1 is 2 via 2 hops;
# 1→3 (w10); unreachable pair 7→8 (w1)
EDGES = [(0, 1, 5), (0, 2, 1), (2, 1, 1), (1, 3, 10), (7, 8, 1)]


def _ref(edges, seeds, rounds):
    nodes = sorted({u for u, _, _ in edges}
                   | {v for _, v, _ in edges})
    best = {}
    for u, v, w in edges:
        best[(u, v)] = min(best.get((u, v), w), w)
    dist = {n: None for n in nodes}
    for s in seeds:
        if s in dist:
            dist[s] = 0
    for _ in range(rounds):
        nxt = dict(dist)
        for (u, v), w in best.items():
            if dist[u] is not None and \
                    (nxt[v] is None or nxt[v] > dist[u] + w):
                nxt[v] = dist[u] + w
        dist = nxt
    return {n: d for n, d in dist.items() if d is not None}


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_sssp_matches_reference_both_paths(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.sssp import sssp_distances
    rows = [{"src": u, "target": v, "w": w} for u, v, w in EDGES]
    # duplicate parallel edge with a WORSE weight: MIN rule drops it
    rows.append({"src": 0, "target": 2, "w": 9})
    got = {r["node"]: r["dist"]
           for r in sssp_distances(rd.from_items(rows, override_num_blocks=4), [0], rounds=8,
                                   driver_edge_limit=limit).take_all()}
    assert got == _ref(EDGES, [0], 8)
    assert got[1] == 2 and got[3] == 12 and 7 not in got


def test_sssp_bounded_rounds(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.sssp import sssp_distances
    rows = [{"src": u, "target": v, "w": w} for u, v, w in EDGES]
    got = {r["node"]: r["dist"]
           for r in sssp_distances(rd.from_items(rows, override_num_blocks=4), [0],
                                   rounds=1).take_all()}
    # one round: direct edges only — 0→1 still costs 5
    assert got == {0: 0, 1: 5, 2: 1}


def test_sssp_empty(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.sssp import sssp_distances
    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                 "target": pa.array([], pa.int64()),
                                 "w": pa.array([], pa.int64())}))
    assert sssp_distances(ds, [0], rounds=3).take_all() == []


def test_sssp_oracle_sql_matches_reference():
    import duckdb
    from pdf2dom_ray.functions.sssp import sssp_oracle_sql
    con = duckdb.connect()
    con.execute("CREATE TABLE edg (src BIGINT, target BIGINT, w BIGINT)")
    con.executemany("INSERT INTO edg VALUES (?, ?, ?)",
                    [list(e) for e in EDGES] + [[0, 2, 9]])
    sql = sssp_oracle_sql("SELECT src, target, w FROM edg",
                          "SELECT CAST(0 AS BIGINT) AS node", rounds=8)
    got = {n: d for n, d in con.execute(sql).fetchall()}
    assert got == _ref(EDGES, [0], 8)
