"""Weighted PageRank: driver path, join path, reference, oracle,
unit-weight degeneration, host_rank(weighted=True) composition."""

import pytest

EDGES = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 5),
         ("c", "d", 1), ("x", "y", 4)]


def _ds(rows):
    import ray.data as rd
    return rd.from_items([{"src": u, "target": v, "w": w}
                          for u, v, w in rows], override_num_blocks=4)


@pytest.mark.parametrize("limit,mode", [(5_000_000, "bsp"),
                                        (0, "bsp"), (0, "joins")])
def test_wpr_matches_reference_all_paths(ray_session, limit, mode):
    from pdf2dom_ray.functions.wpagerank import (
        weighted_pagerank, weighted_pagerank_reference)
    # a duplicate pair must SUM its weights
    got = {r["url"]: r["rank"]
           for r in weighted_pagerank(_ds(EDGES + [("a", "b", 2)]),
                                      iterations=4,
                                      driver_edge_limit=limit,
                                      mode=mode).take_all()}
    want = weighted_pagerank_reference(EDGES + [("a", "b", 2)],
                                       iterations=4)
    assert got == want


def test_wpr_bsp_partition_invariance(ray_session):
    import numpy as np
    from pdf2dom_ray.functions.wpagerank import weighted_pagerank
    rng = np.random.RandomState(23)
    trips = [(f"u{u}", f"u{v}", int(w)) for u, v, w in
             np.c_[rng.randint(0, 50, size=(300, 2)),
                   rng.randint(1, 7, 300)]]
    want = sorted((r["url"], r["rank"]) for r in
                  weighted_pagerank(_ds(trips), iterations=4)
                  .take_all())
    for n_part in (1, 2, 3):
        got = sorted((r["url"], r["rank"]) for r in
                     weighted_pagerank(_ds(trips), iterations=4,
                                       driver_edge_limit=0,
                                       num_partitions=n_part)
                     .take_all())
        assert got == want, n_part


def test_wpr_unit_weights_degenerate_to_pagerank(ray_session):
    from pdf2dom_ray.functions.pagerank import pagerank_reference
    from pdf2dom_ray.functions.wpagerank import weighted_pagerank
    unit = [(u, v, 1) for u, v, _ in EDGES]
    got = {r["url"]: r["rank"]
           for r in weighted_pagerank(_ds(unit),
                                      iterations=5).take_all()}
    want = pagerank_reference([(u, v) for u, v, _ in EDGES],
                              iterations=5)
    assert got == want


def test_wpr_weight_shifts_mass(ray_session):
    """b receives 3/4 of a's endorsement vs 1/4 for c's direct share —
    the weighted rank must separate them where unit weights tie."""
    from pdf2dom_ray.functions.wpagerank import weighted_pagerank
    rows = [("h", "b", 3), ("h", "c", 1)]
    got = {r["url"]: r["rank"]
           for r in weighted_pagerank(_ds(rows),
                                      iterations=2).take_all()}
    assert got["b"] > got["c"]


def test_wpr_empty(ray_session):
    from pdf2dom_ray.functions.wpagerank import weighted_pagerank
    assert weighted_pagerank(_ds([])).take_all() == []


def test_wpr_oracle_sql_matches(ray_session):
    import duckdb
    import numpy as np
    from pdf2dom_ray.functions.wpagerank import (
        weighted_pagerank, weighted_pagerank_oracle_sql)
    rng = np.random.RandomState(17)
    trips = [(f"n{u}", f"n{v}", int(w)) for u, v, w in
             np.c_[rng.randint(0, 40, size=(200, 2)),
                   rng.randint(1, 9, 200)]]
    got = sorted((r["url"], r["rank"]) for r in
                 weighted_pagerank(_ds(trips), iterations=4).take_all())
    vals = ", ".join(f"('{u}', '{v}', {w})" for u, v, w in trips)
    sql = weighted_pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, target, w)",
        iterations=4)
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want


def test_host_rank_weighted_composition(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.hostgraph import host_rank
    from pdf2dom_ray.functions.wpagerank import (
        weighted_pagerank_reference)
    edges = [("https://a.test/1", "https://b.test/1"),
             ("https://a.test/2", "https://b.test/2"),
             ("https://a.test/1", "https://a.test/2"),
             ("https://b.test/1", "https://c.test/1")]
    ds = rd.from_items([{"src": u, "target": v} for u, v in edges], override_num_blocks=4)
    got = {r["host"]: r["rank"]
           for r in host_rank(ds, iterations=4,
                              weighted=True).take_all()}
    want = weighted_pagerank_reference(
        [("a.test", "b.test", 2), ("a.test", "a.test", 1),
         ("b.test", "c.test", 1)], iterations=4)
    assert got == want
