"""Bounded closeness components: both paths, hand truth, oracle."""

import pyarrow as pa
import pytest


# path 0→1→2→3 plus shortcut 0→2; isolated edge 7→8
EDGES = [(0, 1), (1, 2), (2, 3), (0, 2), (7, 8)]


def _ref(edges, radius):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out = {}
    for v in nodes:
        # inbound distances via reverse BFS
        dist = {v: 0}
        frontier = [v]
        for d in range(1, radius + 1):
            nxt = [u for u, w in edges
                   if w in frontier and u not in dist]
            for u in set(nxt):
                dist[u] = d
            frontier = list(set(nxt))
        reach = [d for d in dist.values() if d > 0]
        out[v] = (len(reach), sum(reach))
    return out


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_closeness_matches_reference_both_paths(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.closeness import closeness_centrality
    ds = rd.from_items([{"src": u, "target": v} for u, v in EDGES]
                       + [{"src": 0, "target": 1}], override_num_blocks=4)     # dup edge
    got = {r["node"]: (r["reached"], r["totdist_w"])
           for r in closeness_centrality(
               ds, radius=4, driver_edge_limit=limit).take_all()}
    assert got == _ref(EDGES, 4)
    # node 3: reached by 2 (d1), 1 (d2), 0 (d2 via shortcut)
    assert got[3] == (3, 5)
    assert got[0] == (0, 0) and got[8] == (1, 1)


def test_closeness_bounded_radius(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.closeness import closeness_centrality
    ds = rd.from_items([{"src": u, "target": v} for u, v in EDGES], override_num_blocks=4)
    got = {r["node"]: (r["reached"], r["totdist_w"])
           for r in closeness_centrality(ds, radius=1).take_all()}
    assert got == _ref(EDGES, 1)
    assert got[3] == (1, 1)        # only the direct predecessor


def test_closeness_empty(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.closeness import closeness_centrality
    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                 "target": pa.array([], pa.int64())}))
    assert closeness_centrality(ds, radius=3).take_all() == []


def test_closeness_oracle_sql_matches_reference():
    import duckdb
    from pdf2dom_ray.functions.closeness import closeness_oracle_sql
    con = duckdb.connect()
    con.execute("CREATE TABLE edg (src BIGINT, target BIGINT)")
    con.executemany("INSERT INTO edg VALUES (?, ?)",
                    [list(e) for e in EDGES])
    sql = closeness_oracle_sql("SELECT src, target FROM edg", radius=4)
    got = {n: (r, t) for n, r, t in con.execute(sql).fetchall()}
    assert got == _ref(EDGES, 4)
