"""Host-partition modularity: hand case, Q extremes, DuckDB oracle."""

import numpy as np


def _ds(edges):
    import ray.data as rd
    return rd.from_items([{"src": u, "target": v} for u, v in edges], override_num_blocks=4)


def _url(h, i):
    return f"https://{h}/p/{i}"


def test_modularity_hand_case(ray_session):
    from pdf2dom_ray.functions.modularity import host_modularity
    # two intra-host edges on a, one cross edge a-b (+dup +self-loop)
    edges = [(_url("a", 1), _url("a", 2)),
             (_url("a", 2), _url("a", 3)),
             (_url("a", 1), _url("b", 1)),
             (_url("b", 1), _url("a", 1)),      # reverse dup collapses
             (_url("a", 1), _url("a", 1))]      # self-loop dropped
    got = {r["host"]: (r["e_in"], r["d"], r["q_contrib"])
           for r in host_modularity(_ds(edges)).take_all()}
    # m=3; a: e_in=2, d=5 → 4·3·2−25=−1 ; b: e_in=0, d=1 → −1
    assert got == {"a": (2, 5, -1), "b": (0, 1, -1)}


def test_modularity_fully_intra_is_maximal(ray_session):
    from pdf2dom_ray.functions.modularity import host_modularity
    edges = [(_url("a", i), _url("a", i + 1)) for i in range(5)] + \
            [(_url("b", i), _url("b", i + 1)) for i in range(5)]
    got = {r["host"]: r["q_contrib"]
           for r in host_modularity(_ds(edges)).take_all()}
    # Q = Σq/(4m²): m=10, each host e_in=5, d=10 → 100 each, Q=0.5
    assert got == {"a": 100, "b": 100}


def test_modularity_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.modularity import (host_modularity,
                                                  modularity_oracle_sql)
    rng = np.random.RandomState(37)
    hosts = ["a.test", "b.test", "c.test"]
    edges = [(_url(hosts[rng.randint(3)], rng.randint(15)),
              _url(hosts[rng.randint(3)], rng.randint(15)))
             for _ in range(120)]
    got = sorted((r["host"], r["e_in"], r["d"], r["q_contrib"])
                 for r in host_modularity(_ds(edges)).take_all())
    vals = " UNION ALL ".join(
        f"SELECT '{u}' AS src, '{v}' AS target" for u, v in edges)
    want = sorted(map(tuple,
                      duckdb.sql(modularity_oracle_sql(vals))
                      .fetchall()))
    assert got == want


def test_modularity_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.modularity import host_modularity
    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.string()),
                                 "target": pa.array([], pa.string())}))
    assert host_modularity(ds).take_all() == []


def test_conductance_hand_case(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.modularity import host_conductance
    # host a: internal edge (a/1, a/2); one crossing edge a/1 - b/1
    edges = rd.from_items([
        {"src": "https://a.x/1", "target": "https://a.x/2"},
        {"src": "https://a.x/1", "target": "https://b.x/1"}], override_num_blocks=4)
    got = host_conductance(edges).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    # m=2, 2m=4. host a.x: vol=3, cut=1, denom=min(3,1)=1 -> 1e6
    # host b.x: vol=1, cut=1, denom=1 -> 1e6
    assert got.host.tolist() == ["a.x", "b.x"]
    assert got.cut.tolist() == [1, 1]
    assert got.vol.tolist() == [3, 1]
    assert got.conductance_ppm.tolist() == [1_000_000, 1_000_000]


def test_conductance_isolated_host_zero(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.modularity import host_conductance
    edges = rd.from_items([
        {"src": "https://a.x/1", "target": "https://a.x/2"},
        {"src": "https://b.x/1", "target": "https://b.x/2"}], override_num_blocks=4)
    got = host_conductance(edges).to_pandas()
    assert (got.conductance_ppm == 0).all()
    assert (got.cut == 0).all()


def test_conductance_partition_invariance(ray_session, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    from pdf2dom_ray.functions.modularity import host_conductance
    a = host_conductance(E.__dict__["_host_link_edges"](sf_dir)) \
        .to_pandas().sort_values("host").reset_index(drop=True)
    b = host_conductance(
        E.__dict__["_host_link_edges"](sf_dir).repartition(7)) \
        .to_pandas().sort_values("host").reset_index(drop=True)
    assert a.equals(b)
