"""Redirect-chain pointer doubling: both paths, loops, oracle."""

import pyarrow as pa
import pytest


# chain a→b→c→d (terminal), side entry e→c, 2-loop x↔y, self-loop z
EDGES = [("a", "b"), ("b", "c"), ("c", "d"), ("e", "c"),
         ("x", "y"), ("y", "x"), ("z", "z")]


def _ref(edges, rounds):
    from pdf2dom_ray.functions.redirects import redirect_reference
    return redirect_reference(edges, rounds=rounds)


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_redirects_match_reference_both_paths(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.redirects import resolve_redirects
    ds = rd.from_items([{"src": u, "target": v} for u, v in EDGES]
                       + [{"src": "a", "target": "b"}], override_num_blocks=4)   # dup row
    got = {r["node"]: (r["final"], r["hops"])
           for r in resolve_redirects(ds, rounds=4,
                                      driver_edge_limit=limit)
           .take_all()}
    assert got == _ref(EDGES, 4)
    # chain fully resolved with exact hop counts
    assert got["a"] == ("d", 3) and got["e"] == ("d", 2)
    assert got["d"] == ("d", 0)            # terminal: self, 0 hops
    # loops never resolve; hops saturate toward 2^rounds
    assert got["x"][0] in ("x", "y") and got["x"][1] == 16
    assert got["z"] == ("z", 16)


def test_redirects_min_target_and_long_chain(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.redirects import resolve_redirects
    # dirty data: two targets for one src -> MIN target wins
    ds = rd.from_items([{"src": "s", "target": "b"},
                        {"src": "s", "target": "a"}], override_num_blocks=4)
    got = {r["node"]: (r["final"], r["hops"])
           for r in resolve_redirects(ds, rounds=2).take_all()}
    assert got["s"] == ("a", 1)
    # chain of length 10 needs 2^rounds >= 10
    chain = [{"src": i, "target": i + 1} for i in range(10)]
    got2 = {r["node"]: (r["final"], r["hops"])
            for r in resolve_redirects(
                rd.from_items(chain, override_num_blocks=4), rounds=4).take_all()}
    assert got2[0] == (10, 10) and got2[10] == (10, 0)
    # under-provisioned rounds resolve only 2^rounds hops
    got3 = {r["node"]: (r["final"], r["hops"])
            for r in resolve_redirects(
                rd.from_items(chain, override_num_blocks=4), rounds=2).take_all()}
    assert got3[0] == (4, 4)


def test_redirects_bsp_int_nodes(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.redirects import resolve_redirects
    chain = [{"src": i, "target": i + 1} for i in range(6)]
    got = {r["node"]: (r["final"], r["hops"])
           for r in resolve_redirects(rd.from_items(chain, override_num_blocks=4), rounds=3,
                                      driver_edge_limit=0).take_all()}
    assert got[0] == (6, 6) and got[5] == (6, 1)


def test_redirects_empty(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.redirects import resolve_redirects
    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.string()),
                                 "target": pa.array([], pa.string())}))
    assert resolve_redirects(ds, rounds=3).take_all() == []


def test_redirect_oracle_sql_matches_reference():
    import duckdb
    from pdf2dom_ray.functions.redirects import redirect_oracle_sql
    con = duckdb.connect()
    con.execute("CREATE TABLE edg (src VARCHAR, target VARCHAR)")
    con.executemany("INSERT INTO edg VALUES (?, ?)",
                    [list(e) for e in EDGES] + [["a", "b"]])
    sql = redirect_oracle_sql("SELECT src, target FROM edg", rounds=4)
    got = {n: (f, h) for n, f, h in con.execute(sql).fetchall()}
    assert got == _ref(EDGES, 4)
