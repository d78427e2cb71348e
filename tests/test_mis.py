"""Luby-style MIS: independence/maximality, both paths, oracle."""

import pyarrow as pa
import pytest


# path 0-1-2-3-4, triangle 10-11-12, isolated edge 20-21,
# self-loop 30-30 (dropped), duplicate + reversed rows
EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12),
         (12, 10), (20, 21), (30, 30), (1, 0), (0, 1)]


def _check(got):
    sym = {(u, v) for u, v in EDGES if u != v}
    sym |= {(v, u) for u, v in sym}
    ins = {n for n, s in got.items() if s == "in"}
    # independence
    assert not any((u, v) in sym for u in ins for v in ins)
    # with 8 rounds on this graph everything decides; maximality:
    # every 'out' node has an 'in' neighbor
    assert "undecided" not in got.values()
    for n, s in got.items():
        if s == "out":
            assert any((n, v) in sym and v in ins for v in got)
    # self-loop-only node is not part of the universe
    assert 30 not in got


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_mis_valid_and_paths_identical(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.mis import mis_select
    ds = rd.from_items([{"src": u, "target": v} for u, v in EDGES], override_num_blocks=4)
    got = {r["node"]: r["status"]
           for r in mis_select(ds, rounds=8,
                               driver_edge_limit=limit).take_all()}
    _check(got)
    # both paths bit-identical
    other = {r["node"]: r["status"]
             for r in mis_select(
                 ds, rounds=8,
                 driver_edge_limit=0 if limit else 10**9).take_all()}
    assert got == other


def test_mis_empty_and_selfloop_only(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.mis import mis_select
    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                 "target": pa.array([], pa.int64())}))
    assert mis_select(ds, rounds=3).take_all() == []
    only_self = rd.from_items([{"src": 5, "target": 5}], override_num_blocks=4)
    assert mis_select(only_self, rounds=3).take_all() == []


def test_mis_oracle_sql_matches_operator(ray_session):
    import duckdb
    import ray.data as rd
    from pdf2dom_ray.functions.mis import mis_oracle_sql, mis_select
    con = duckdb.connect()
    con.execute("CREATE TABLE edg (src BIGINT, target BIGINT)")
    con.executemany("INSERT INTO edg VALUES (?, ?)",
                    [list(e) for e in EDGES])
    sql = mis_oracle_sql("SELECT src, target FROM edg", rounds=8)
    want = {n: s for n, s in con.execute(sql).fetchall()}
    ds = rd.from_items([{"src": u, "target": v} for u, v in EDGES], override_num_blocks=4)
    got = {r["node"]: r["status"]
           for r in mis_select(ds, rounds=8).take_all()}
    assert got == want
