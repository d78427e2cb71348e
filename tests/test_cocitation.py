"""Co-citation / coupling: both paths, reference, cap, oracle SQL."""

import pytest

# hubs u1,u2 both cite (a,b); u3 cites (a,b,c); u4 is a mega-hub
EDGES = [("u1", "a"), ("u1", "b"),
         ("u2", "a"), ("u2", "b"),
         ("u3", "a"), ("u3", "b"), ("u3", "c"),
         ("u4", "a"), ("u4", "b"), ("u4", "c"), ("u4", "d")]


def _ds(rows):
    import ray.data as rd
    return rd.from_items([{"src": u, "target": v} for u, v in rows], override_num_blocks=4)


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_cocitation_matches_reference_both_paths(ray_session, limit):
    from pdf2dom_ray.functions.cocitation import (cocitation,
                                                  cocitation_reference)
    got = {(r["a"], r["b"]): r["n_common"]
           for r in cocitation(_ds(EDGES + [EDGES[0]]), max_fanout=3,
                               min_count=2,
                               driver_edge_limit=limit).take_all()}
    want = cocitation_reference(EDGES, max_fanout=3, min_count=2)
    assert got == want
    assert got[("a", "b")] == 3            # u1, u2, u3
    assert ("a", "d") not in got           # only via the capped u4


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_coupling_mode_both_paths(ray_session, limit):
    from pdf2dom_ray.functions.cocitation import (cocitation,
                                                  cocitation_reference)
    got = {(r["a"], r["b"]): r["n_common"]
           for r in cocitation(_ds(EDGES), mode="coupling",
                               max_fanout=8, min_count=2,
                               driver_edge_limit=limit).take_all()}
    want = cocitation_reference(EDGES, mode="coupling", max_fanout=8,
                                min_count=2)
    assert got == want
    # u1..u4 all cite a and b -> every hub pair couples
    assert got[("u1", "u2")] == 2


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_cocitation_no_pairs_stable_schema(ray_session, limit):
    from pdf2dom_ray.functions.cocitation import cocitation
    out = cocitation(_ds([("u", "a"), ("v", "b")]),
                     driver_edge_limit=limit)
    assert out.take_all() == []
    assert set(out.schema().names) == {"a", "b", "n_common"}


def test_cocitation_partition_invariance(ray_session):
    import numpy as np
    from pdf2dom_ray.functions.cocitation import cocitation
    rng = np.random.RandomState(3)
    rows = [(f"h{u}", f"i{v}")
            for u, v in rng.randint(0, 40, size=(300, 2))]
    want = sorted((r["a"], r["b"], r["n_common"]) for r in
                  cocitation(_ds(rows), max_fanout=10,
                             min_count=2).take_all())
    # one distributed partitioning vs the driver baseline covers the
    # property; each run is a full pass (suite-time budget)
    for n_part in (3,):
        got = sorted((r["a"], r["b"], r["n_common"]) for r in
                     cocitation(_ds(rows), max_fanout=10, min_count=2,
                                driver_edge_limit=0,
                                num_partitions=n_part).take_all())
        assert got == want, n_part


def test_cocitation_oracle_sql_matches(ray_session):
    import duckdb
    import numpy as np
    from pdf2dom_ray.functions.cocitation import (cocitation,
                                                  cocitation_oracle_sql)
    rng = np.random.RandomState(9)
    pairs = rng.randint(0, 30, size=(200, 2))
    rows = [(f"h{u}", f"i{v}") for u, v in pairs]
    vals = ", ".join(f"('h{u}', 'i{v}')" for u, v in pairs)
    cte = f"SELECT * FROM (VALUES {vals}) AS t(src, target)"
    for mode in ("cocitation", "coupling"):
        got = sorted((r["a"], r["b"], r["n_common"]) for r in
                     cocitation(_ds(rows), mode=mode, max_fanout=8,
                                min_count=2).take_all())
        want = sorted(map(tuple, duckdb.sql(cocitation_oracle_sql(
            cte, mode=mode, max_fanout=8, min_count=2)).fetchall()))
        assert got == want, mode
