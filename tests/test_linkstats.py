"""Degree + reciprocity stats: reference, dedup, self-loops, oracle."""


EDGES = [("a", "b"), ("b", "a"),          # reciprocal pair
         ("a", "c"), ("c", "d"), ("d", "d")]  # one-way chain + self-loop


def _ds(rows):
    import ray.data as rd
    return rd.from_items([{"src": u, "target": v} for u, v in rows], override_num_blocks=4)


def test_degree_stats_matches_reference(ray_session):
    from pdf2dom_ray.functions.linkstats import (degree_stats,
                                                 degree_stats_reference)
    # duplicates must not change anything (distinct edge set)
    got = {r["url"]: (r["in_deg"], r["out_deg"], r["n_reciprocal"])
           for r in degree_stats(_ds(EDGES + [("a", "b")])).take_all()}
    want = degree_stats_reference(EDGES)
    assert got == want
    assert got["a"] == (1, 2, 1)          # b reciprocates, c doesn't
    assert got["d"] == (2, 1, 0)          # self-loop not reciprocal


def test_degree_stats_partition_invariance(ray_session):
    import numpy as np
    from pdf2dom_ray.functions.linkstats import (degree_stats,
                                                 degree_stats_reference)
    rng = np.random.RandomState(29)
    rows = [(f"u{u}", f"u{v}")
            for u, v in rng.randint(0, 30, size=(250, 2))]
    want = degree_stats_reference(rows)
    # the multi-partition run is the risky case (pair-locality); the
    # single-partition degenerate equals the reference computation and
    # costs a full distributed pass (suite-time budget)
    for n_part in (4,):
        got = {r["url"]: (r["in_deg"], r["out_deg"], r["n_reciprocal"])
               for r in degree_stats(_ds(rows),
                                     num_partitions=n_part).take_all()}
        assert got == want, n_part


def test_degree_stats_oracle_matches(ray_session):
    import duckdb
    import numpy as np
    from pdf2dom_ray.functions.linkstats import (degree_stats,
                                                 degree_stats_oracle_sql)
    rng = np.random.RandomState(31)
    pairs = rng.randint(0, 25, size=(150, 2))
    rows = [(f"n{u}", f"n{v}") for u, v in pairs]
    got = sorted((r["url"], r["in_deg"], r["out_deg"],
                  r["n_reciprocal"])
                 for r in degree_stats(_ds(rows)).take_all())
    vals = ", ".join(f"('n{u}', 'n{v}')" for u, v in pairs)
    want = sorted(map(tuple, duckdb.sql(degree_stats_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, target)"))
        .fetchall()))
    assert got == want


def test_annd_hand_case(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.linkstats import avg_neighbor_degree
    # star 0-1,0-2,0-3: hub degree 3 (neighbors all degree 1),
    # leaves degree 1 (neighbor degree 3)
    ed = rd.from_items([{"src": 0, "target": i} for i in (1, 2, 3)], override_num_blocks=4)
    got = avg_neighbor_degree(ed).to_pandas().set_index("degree")
    assert int(got.loc[1, "n_nodes"]) == 3
    assert int(got.loc[1, "annd_ppm"]) == 3_000_000
    assert int(got.loc[3, "annd_ppm"]) == 1_000_000


def test_annd_partition_invariance(ray_session, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    from pdf2dom_ray.functions.linkstats import avg_neighbor_degree
    a = avg_neighbor_degree(E.__dict__["_host_link_edges"](sf_dir),
                            num_partitions=2).to_pandas()
    b = avg_neighbor_degree(E.__dict__["_host_link_edges"](sf_dir),
                            num_partitions=6).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
