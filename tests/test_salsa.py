"""SALSA: driver path, BSP path, pure reference, oracle SQL."""

import pytest

EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
         ("c", "d"), ("x", "y")]


def _ds(rows):
    import ray.data as rd
    return rd.from_items([{"src": u, "target": v} for u, v in rows], override_num_blocks=4)


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_salsa_matches_reference_both_paths(ray_session, limit):
    from pdf2dom_ray.functions.salsa import salsa, salsa_reference
    # duplicate rows must not change anything (distinct edge set)
    got = {r["url"]: (r["authority"], r["hub"])
           for r in salsa(_ds(EDGES + [("a", "b")]), iterations=4,
                          driver_edge_limit=limit).take_all()}
    want = salsa_reference(EDGES, iterations=4)
    assert got == want
    # the chains live on the sides of the bipartite graph: no
    # in-edges -> authority 0, no out-edges -> hub 0
    assert got["a"][0] > 0 and got["x"][0] == 0
    assert got["d"][1] == 0 and got["y"][1] == 0


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_salsa_mass_never_amplifies(ray_session, limit):
    """Each hop redistributes (floors only lose) — totals bounded by
    n * SCALE, the int64-safety argument in the module docstring."""
    from pdf2dom_ray.functions.salsa import SCALE, salsa
    rows = salsa(_ds(EDGES), iterations=6,
                 driver_edge_limit=limit).take_all()
    n = len(rows)
    assert sum(r["authority"] for r in rows) <= n * SCALE
    assert sum(r["hub"] for r in rows) <= n * SCALE


def test_salsa_empty_edges(ray_session):
    from pdf2dom_ray.functions.salsa import salsa
    assert salsa(_ds([])).take_all() == []


def test_salsa_partition_invariance(ray_session):
    import numpy as np
    from pdf2dom_ray.functions.salsa import salsa
    rng = np.random.RandomState(7)
    rows = [(f"u{u}", f"u{v}")
            for u, v in rng.randint(0, 50, size=(300, 2))]
    want = sorted((r["url"], r["authority"], r["hub"]) for r in
                  salsa(_ds(rows), iterations=4).take_all())
    for n_part in (1, 2, 3):
        got = sorted((r["url"], r["authority"], r["hub"]) for r in
                     salsa(_ds(rows), iterations=4,
                           driver_edge_limit=0,
                           n_part=n_part).take_all())
        assert got == want, n_part


def test_salsa_oracle_sql_matches(ray_session):
    import duckdb
    import numpy as np
    from pdf2dom_ray.functions.salsa import salsa, salsa_oracle_sql
    rng = np.random.RandomState(11)
    pairs = rng.randint(0, 40, size=(200, 2))
    rows = [(f"n{u}", f"n{v}") for u, v in pairs]
    got = sorted((r["url"], r["authority"], r["hub"]) for r in
                 salsa(_ds(rows), iterations=3).take_all())
    vals = ", ".join(f"('n{u}', 'n{v}')" for u, v in pairs)
    sql = salsa_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, target)",
        iterations=3)
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want


def test_salsa_resists_tkc_vs_hits(ray_session):
    """The paper's motivating property (TKC effect): a tightly-knit
    clique soaks up ever more of HITS' authority mass, starving an
    independently-popular page endorsed by many weak hubs — its score
    decays geometrically with iteration count. SALSA's
    column-stochastic walk redistributes without amplifying, so the
    popular page holds ~SCALE alongside the clique members."""
    from pdf2dom_ray.functions.hits import hits
    from pdf2dom_ray.functions.salsa import salsa
    clique = [f"c{i}" for i in range(4)]
    edges = [(u, v) for u in clique for v in clique if u != v]
    edges += [(f"w{i}", "pop") for i in range(6)]
    s = {r["url"]: r["authority"]
         for r in salsa(_ds(edges), iterations=8).take_all()}
    h = {r["url"]: r["authority"]
         for r in hits(_ds(edges), iterations=8).take_all()}
    assert h["pop"] < h["c0"] // 5          # HITS: TKC starves 'pop'
    assert s["pop"] > s["c0"] * 99 // 100   # SALSA: 'pop' holds steady
