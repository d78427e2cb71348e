"""Bow-tie FW-BW classification: both bfs paths, hand truth, oracle."""

import pyarrow as pa
import pytest


# core cycle 0→1→2→0; IN: 10→0, 11→10; OUT: 2→20, 20→21;
# disconnected pair 30→31
EDGES = [(0, 1), (1, 2), (2, 0), (10, 0), (11, 10),
         (2, 20), (20, 21), (30, 31)]
TRUTH = {0: "SCC", 1: "SCC", 2: "SCC", 10: "IN", 11: "IN",
         20: "OUT", 21: "OUT", 30: "OTHER", 31: "OTHER"}


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_bowtie_matches_truth_both_paths(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.bowtie import bowtie_classify
    ds = rd.from_items([{"src": u, "target": v} for u, v in EDGES]
                       + [{"src": 0, "target": 1}], override_num_blocks=4)     # dup edge
    got = {r["node"]: r["cls"]
           for r in bowtie_classify(ds, 0, rounds=8,
                                    driver_edge_limit=limit)
           .take_all()}
    assert got == TRUTH


def test_bowtie_bounded_rounds(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.bowtie import bowtie_classify
    ds = rd.from_items([{"src": u, "target": v} for u, v in EDGES], override_num_blocks=4)
    # 1 round: only direct neighbors classified; 11 and 21 fall OTHER
    got = {r["node"]: r["cls"]
           for r in bowtie_classify(ds, 0, rounds=1).take_all()}
    assert got[11] == "OTHER" and got[21] == "OTHER"
    assert got[10] == "IN" and got[1] == "OUT"   # cycle unseen at r=1


def test_bowtie_empty(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.bowtie import bowtie_classify
    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                 "target": pa.array([], pa.int64())}))
    assert bowtie_classify(ds, 0, rounds=3).take_all() == []


def test_bowtie_oracle_sql_matches_truth():
    import duckdb
    from pdf2dom_ray.functions.bowtie import bowtie_oracle_sql
    con = duckdb.connect()
    con.execute("CREATE TABLE edg (src BIGINT, target BIGINT)")
    con.executemany("INSERT INTO edg VALUES (?, ?)",
                    [list(e) for e in EDGES])
    sql = bowtie_oracle_sql("SELECT src, target FROM edg",
                            "SELECT CAST(0 AS BIGINT) AS node",
                            rounds=8)
    got = {n: c for n, c in con.execute(sql).fetchall()}
    assert got == TRUTH
