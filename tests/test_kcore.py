"""k-core peel: driver path, BSP path, hand reference, oracle SQL."""

import pyarrow as pa
import pytest


def _ref(edges, k, rounds):
    """Synchronous bounded peel over the distinct undirected pair
    set; returns {node: degree among survivors}."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    alive = {n for e in und for n in e}

    def deg(s):
        d = {n: 0 for n in s}
        for u, v in und:
            if u in s and v in s:
                d[u] += 1
                d[v] += 1
        return d

    for _ in range(rounds):
        d = deg(alive)
        nxt = {n for n in alive if d[n] >= k}
        if nxt == alive:
            break
        alive = nxt
    return {n: d for n, d in deg(alive).items()}


# triangle {0,1,2} + tail 2-3-4 + pendant 5 off the triangle
EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (0, 5)]


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_kcore_matches_reference_both_paths(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.kcore import kcore_nodes
    # dup + reversed + self-loop rows must not change degrees
    rows = EDGES + [(1, 0), (2, 1), (4, 4)]
    ds = rd.from_items([{"src": u, "target": v} for u, v in rows], override_num_blocks=4)
    got = {r["node"]: r["core_degree"]
           for r in kcore_nodes(ds, k=2, rounds=8,
                                driver_edge_limit=limit).take_all()}
    assert got == _ref(EDGES, 2, 8)
    assert got == {0: 2, 1: 2, 2: 2}      # the triangle is the 2-core


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_kcore_bounded_rounds_and_cascade(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.kcore import kcore_nodes
    # path a-b-c-d-e with k=2: each peel removes the two endpoints,
    # so bounded rounds freeze the cascade mid-way
    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    ds = rd.from_items([{"src": u, "target": v} for u, v in chain], override_num_blocks=4)
    got1 = {r["node"]: r["core_degree"]
            for r in kcore_nodes(ds, k=2, rounds=1,
                                 driver_edge_limit=limit).take_all()}
    assert got1 == _ref(chain, 2, 1) == {"b": 1, "c": 2, "d": 1}
    got3 = kcore_nodes(ds, k=2, rounds=3,
                       driver_edge_limit=limit).take_all()
    assert got3 == [] and _ref(chain, 2, 3) == {}


def test_kcore_partition_invariance(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.kcore import kcore_nodes
    import numpy as np
    rng = np.random.RandomState(7)
    rows = [{"src": int(u), "target": int(v)}
            for u, v in rng.randint(0, 60, size=(400, 2))]
    ds = rd.from_items(rows, override_num_blocks=4)
    want = sorted((r["node"], r["core_degree"]) for r in
                  kcore_nodes(ds, k=3, rounds=8).take_all())
    for n_part in (1, 2, 3):
        got = sorted((r["node"], r["core_degree"]) for r in
                     kcore_nodes(ds, k=3, rounds=8, driver_edge_limit=0,
                                 n_part=n_part).take_all())
        assert got == want, n_part


def test_kcore_empty_and_kwarg_validation(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.kcore import kcore_nodes
    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "target": pa.array([], pa.int64())}))
    assert kcore_nodes(empty, k=2).take_all() == []
    loops = rd.from_items([{"src": 3, "target": 3}], override_num_blocks=4)
    assert kcore_nodes(loops, k=1).take_all() == []
    with pytest.raises(ValueError):
        kcore_nodes(empty, k=0)


def test_kcore_oracle_sql_matches(ray_session):
    import duckdb
    import ray.data as rd
    from pdf2dom_ray.functions.kcore import kcore_nodes, kcore_oracle_sql
    import numpy as np
    rng = np.random.RandomState(11)
    pairs = rng.randint(0, 40, size=(250, 2))
    ds = rd.from_items([{"src": int(u), "target": int(v)}
                        for u, v in pairs], override_num_blocks=4)
    got = sorted((r["node"], r["core_degree"]) for r in
                 kcore_nodes(ds, k=3, rounds=4).take_all())
    vals = ", ".join(f"({u}, {v})" for u, v in pairs)
    sql = kcore_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, target)",
        k=3, rounds=4)
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want


def test_core_number_composition(ray_session, sf_dir):
    """Core numbers are the max-k survival across kcore levels, and
    the planted-clique graph's full blocks reach core 5."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["link_core_number"](sf_dir).to_pandas()
    assert got.core_number.max() == 5          # capped at K=5
    assert got.core_number.min() >= 1
    # monotone containment: the k-core survivors at k=3 are exactly
    # the nodes with core_number >= 3
    from pdf2dom_ray.functions.kcore import kcore_nodes
    k3 = set(kcore_nodes(E.__dict__["_lpa_edges"](sf_dir), k=3,
                         rounds=6).to_pandas().node)
    assert set(got.loc[got.core_number >= 3, "node"]) == k3
