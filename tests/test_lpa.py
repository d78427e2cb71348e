"""Synchronous LPA communities: driver path, BSP path, hand
reference, oracle SQL."""

import pyarrow as pa
import pytest


def _ref(edges, rounds):
    """Synchronous mode-update LPA over the distinct undirected
    simple pair set; ties → smallest label."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    nbrs = {n: [] for n in nodes}
    for u, v in und:
        nbrs[u].append(v)
        nbrs[v].append(u)
    lbl = {n: n for n in nodes}
    for _ in range(rounds):
        nxt = {}
        for n in nodes:
            cnt: dict = {}
            for m in nbrs[n]:
                cnt[lbl[m]] = cnt.get(lbl[m], 0) + 1
            nxt[n] = min(cnt, key=lambda c: (-cnt[c], c))
        if nxt == lbl:
            break
        lbl = nxt
    return lbl


# two triangles joined by one bridge edge: LPA converges to one
# label per triangle
EDGES = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_lpa_matches_reference_both_paths(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.lpa import lpa_communities
    # dup + reversed + self-loop rows must not change the multiset
    rows = EDGES + [(1, 0), (2, 1), (4, 4)]
    ds = rd.from_items([{"src": u, "target": v} for u, v in rows], override_num_blocks=4)
    got = {r["node"]: r["community"]
           for r in lpa_communities(ds, rounds=4,
                                    driver_edge_limit=limit).take_all()}
    assert got == _ref(EDGES, 4)
    # the two triangles end in different communities
    assert len({got[0], got[1], got[2]}) == 1
    assert len({got[3], got[4], got[5]}) == 1
    assert got[0] != got[3]


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_lpa_bounded_rounds_and_string_ids(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.lpa import lpa_communities
    # star a-(b,c,d): round 1 sends every leaf to label 'a' and 'a'
    # to the smallest leaf label 'b' (3-way tie); round 2 flips back
    star = [("a", "b"), ("a", "c"), ("a", "d")]
    ds = rd.from_items([{"src": u, "target": v} for u, v in star], override_num_blocks=4)
    for rounds in (1, 2):
        got = {r["node"]: r["community"]
               for r in lpa_communities(
                   ds, rounds=rounds,
                   driver_edge_limit=limit).take_all()}
        assert got == _ref(star, rounds), rounds
    assert _ref(star, 1) == {"a": "b", "b": "a", "c": "a", "d": "a"}


def test_lpa_partition_invariance(ray_session):
    import numpy as np
    import ray.data as rd
    from pdf2dom_ray.functions.lpa import lpa_communities
    rng = np.random.RandomState(3)
    rows = [{"src": int(u), "target": int(v)}
            for u, v in rng.randint(0, 60, size=(400, 2))]
    ds = rd.from_items(rows, override_num_blocks=4)
    want = sorted((r["node"], r["community"]) for r in
                  lpa_communities(ds, rounds=4).take_all())
    for n_part in (1, 2, 3):
        got = sorted((r["node"], r["community"]) for r in
                     lpa_communities(ds, rounds=4, driver_edge_limit=0,
                                     n_part=n_part).take_all())
        assert got == want, n_part


def test_lpa_empty_and_self_loops_only(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.lpa import lpa_communities
    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "target": pa.array([], pa.int64())}))
    assert lpa_communities(empty).take_all() == []
    loops = rd.from_items([{"src": 3, "target": 3}], override_num_blocks=4)
    assert lpa_communities(loops).take_all() == []


def test_lpa_oracle_sql_matches(ray_session):
    import duckdb
    import numpy as np
    import ray.data as rd
    from pdf2dom_ray.functions.lpa import (lpa_communities,
                                           lpa_oracle_sql)
    rng = np.random.RandomState(17)
    pairs = rng.randint(0, 40, size=(250, 2))
    ds = rd.from_items([{"src": int(u), "target": int(v)}
                        for u, v in pairs], override_num_blocks=4)
    got = sorted((r["node"], r["community"]) for r in
                 lpa_communities(ds, rounds=3).take_all())
    vals = ", ".join(f"({u}, {v})" for u, v in pairs)
    sql = lpa_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, target)", rounds=3)
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want
