"""TrustRank: driver path, BSP path, pure reference, oracle SQL."""

import pyarrow as pa
import pytest

# seed 'a' feeds a small web; 'x'→'y' is a spam island no trust
# reaches; 'd' is dangling (its mass teleports back to the seeds)
EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
         ("c", "d"), ("x", "y")]
SEEDS = ["a"]


def _ds(rows):
    import ray.data as rd
    return rd.from_items([{"src": u, "target": v} for u, v in rows], override_num_blocks=4)


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_trustrank_matches_reference_both_paths(ray_session, limit):
    from pdf2dom_ray.functions.trustrank import (trustrank,
                                                 trustrank_reference)
    # dup rows + dup seeds + absent seed must not change anything
    got = {r["url"]: r["trust"]
           for r in trustrank(_ds(EDGES + [("a", "b")]),
                              SEEDS + ["a", "ghost"], iterations=5,
                              driver_edge_limit=limit).take_all()}
    want = trustrank_reference(EDGES, SEEDS, iterations=5)
    assert got == want
    # trust reaches the seed's web but not the island
    assert got["a"] > 0 and got["b"] > 0 and got["c"] > 0
    assert got["x"] == 0 and got["y"] == 0


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_trustrank_no_seed_in_graph_is_all_zero(ray_session, limit):
    from pdf2dom_ray.functions.trustrank import trustrank
    got = trustrank(_ds(EDGES), ["ghost"], iterations=3,
                    driver_edge_limit=limit).take_all()
    assert {r["url"] for r in got} == {"a", "b", "c", "d", "x", "y"}
    assert all(r["trust"] == 0 for r in got)


def test_trustrank_empty_edges(ray_session):
    from pdf2dom_ray.functions.trustrank import trustrank
    empty = _ds([])
    assert trustrank(empty, SEEDS).take_all() == []


def test_trustrank_partition_invariance(ray_session):
    import numpy as np
    from pdf2dom_ray.functions.trustrank import trustrank
    rng = np.random.RandomState(5)
    rows = [(f"u{u}", f"u{v}")
            for u, v in rng.randint(0, 50, size=(300, 2))]
    seeds = [f"u{i}" for i in range(0, 50, 9)]
    want = sorted((r["url"], r["trust"]) for r in
                  trustrank(_ds(rows), seeds, iterations=4).take_all())
    for n_part in (1, 2, 3):
        got = sorted((r["url"], r["trust"]) for r in
                     trustrank(_ds(rows), seeds, iterations=4,
                               driver_edge_limit=0,
                               n_part=n_part).take_all())
        assert got == want, n_part


def test_trustrank_oracle_sql_matches(ray_session):
    import duckdb
    import numpy as np
    from pdf2dom_ray.functions.trustrank import (trustrank,
                                                 trustrank_oracle_sql)
    rng = np.random.RandomState(13)
    pairs = rng.randint(0, 40, size=(200, 2))
    rows = [(f"n{u}", f"n{v}") for u, v in pairs]
    seeds = [f"n{i}" for i in range(0, 40, 7)] + ["ghost"]
    got = sorted((r["url"], r["trust"]) for r in
                 trustrank(_ds(rows), seeds, iterations=4).take_all())
    vals = ", ".join(f"('n{u}', 'n{v}')" for u, v in pairs)
    seed_vals = ", ".join(f"('{s}')" for s in seeds)
    sql = trustrank_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, target)",
        f"SELECT * FROM (VALUES {seed_vals}) AS s(url)",
        iterations=4)
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want


def test_trust_gap_composition(ray_session, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["trust_gap"](sf_dir).to_pandas()
    assert len(got) == 20
    assert (got.gap == got.pagerank - got.trustrank).all()
    # spam-mass intuition: the biggest gaps are non-trusted pages
    # (every page outside the seed neighborhood has trustrank 0 or
    # small); gaps sorted descending with the (gap, url) total order
    assert got.gap.is_monotonic_decreasing or \
        (got.gap.diff().dropna() <= 0).all()
