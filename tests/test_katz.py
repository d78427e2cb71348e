"""Katz centrality: driver path, BSP path, hand reference, oracle."""

import pyarrow as pa
import pytest


EDGES = [(0, 1), (1, 2), (2, 3), (0, 2), (3, 0), (4, 2), (2, 0)]


def _ref(edges, rounds):
    from pdf2dom_ray.functions.katz import katz_reference
    return katz_reference(edges, iterations=rounds)


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_katz_matches_reference_both_paths(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.katz import katz_centrality
    ds = rd.from_items([{"src": u, "target": v} for u, v in EDGES]
                       + [{"src": 0, "target": 1}], override_num_blocks=4)     # dup edge
    got = {r["node"]: r["katz"]
           for r in katz_centrality(ds, iterations=5,
                                    driver_edge_limit=limit).take_all()}
    assert got == _ref(EDGES, 5)
    # source-only node 4 keeps the bare base score
    assert got[4] == 10 ** 9


def test_katz_string_nodes_and_zero_rounds(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.katz import katz_centrality
    ds = rd.from_items([{"src": "a", "target": "b"},
                        {"src": "b", "target": "c"}], override_num_blocks=4)
    got = {r["node"]: r["katz"]
           for r in katz_centrality(ds, iterations=0).take_all()}
    assert got == {"a": 10 ** 9, "b": 10 ** 9, "c": 10 ** 9}
    one = {r["node"]: r["katz"]
           for r in katz_centrality(ds, iterations=1).take_all()}
    assert one["b"] == one["c"] == 10 ** 9 + 10 ** 9 * 15 // 100
    assert one["a"] == 10 ** 9


def test_katz_empty_edges(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.katz import katz_centrality
    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                 "target": pa.array([], pa.int64())}))
    assert katz_centrality(ds, iterations=3).take_all() == []


def test_katz_oracle_sql_matches_reference():
    import duckdb
    from pdf2dom_ray.functions.katz import katz_oracle_sql
    con = duckdb.connect()
    con.execute("CREATE TABLE edg (src BIGINT, target BIGINT)")
    con.executemany("INSERT INTO edg VALUES (?, ?)",
                    [list(e) for e in EDGES] + [[0, 1]])
    sql = katz_oracle_sql("SELECT src, target FROM edg", iterations=5)
    got = {n: k for n, k in con.execute(sql).fetchall()}
    assert got == _ref(EDGES, 5)
