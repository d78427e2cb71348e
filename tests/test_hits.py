"""HITS hubs/authorities (functions/hits.py): reference equivalence,
driver vs distributed bit-identity, DuckDB oracle round-trip of the
unrolled SQL, structure sanity on a known graph, empty input.
"""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from pdf2dom_ray.functions.hits import (SCALE, hits, hits_oracle_sql,
                                        hits_reference)


def _edges_ds(pairs, nparts=None):
    t = pa.table({
        "src": pa.array([p[0] for p in pairs], pa.string()),
        "target": pa.array([p[1] for p in pairs], pa.string()),
    })
    ds = rd.from_arrow(t)
    if nparts:
        ds = ds.repartition(nparts)
    return ds


def _rand_graph(seed, n=24, m=80):
    rng = np.random.default_rng(seed)
    return [(f"u{int(a)}", f"u{int(b)}")
            for a, b in rng.integers(0, n, (m, 2))]


def _as_map(rows):
    return {r["url"]: (r["authority"], r["hub"]) for r in rows}


def test_matches_reference_on_random_graphs():
    for seed in (0, 1, 2):
        pairs = _rand_graph(seed)
        got = _as_map(hits(_edges_ds(pairs), iterations=4).take_all())
        assert got == hits_reference(pairs, iterations=4)


def test_driver_and_distributed_paths_identical():
    # 2 iterations: path identity is per-round bit-equality, so extra
    # rounds only add BSP fixed cost (suite-time budget)
    pairs = _rand_graph(7, n=30, m=120)
    a = _as_map(hits(_edges_ds(pairs, nparts=4),
                     iterations=2).take_all())
    bsp = _as_map(hits(_edges_ds(pairs, nparts=4), iterations=2,
                       driver_edge_limit=0).take_all())
    joins = _as_map(hits(_edges_ds(pairs, nparts=4), iterations=2,
                         driver_edge_limit=0, mode="joins").take_all())
    assert a == bsp == joins


def test_duplicate_edges_ignored():
    pairs = [("a", "b"), ("a", "b"), ("b", "c"), ("a", "b")]
    got = _as_map(hits(_edges_ds(pairs)).take_all())
    assert got == hits_reference([("a", "b"), ("b", "c")])


def test_star_graph_structure():
    # hub u links to 3 authorities; authorities have no out-links
    pairs = [("hub", "x"), ("hub", "y"), ("hub", "z")]
    got = _as_map(hits(_edges_ds(pairs)).take_all())
    assert got["hub"][1] > 0 and got["hub"][0] == 0     # pure hub
    assert got["x"][0] > 0 and got["x"][1] == 0         # pure authority
    assert got["x"] == got["y"] == got["z"]
    # normalization: max score lands at (or within rounding of) SCALE
    assert max(v[1] for v in got.values()) == SCALE


def test_empty_edges():
    out = hits(_edges_ds([]).filter(lambda r: False)).take_all()
    assert out == []


def test_oracle_sql_matches_engine():
    pairs = _rand_graph(11, n=16, m=50)
    vals = ", ".join(f"('{a}', '{b}')" for a, b in pairs)
    cte = f"SELECT src, target FROM (VALUES {vals}) v(src, target)"
    df = duckdb.sql(hits_oracle_sql(cte, iterations=4)).df()
    got = _as_map(hits(_edges_ds(pairs), iterations=4).take_all())
    oracle = {r.url: (r.authority, r.hub) for r in df.itertuples()}
    assert got == oracle


def test_scale_param_respected():
    pairs = _rand_graph(3)
    small = _as_map(hits(_edges_ds(pairs), scale=10 ** 4).take_all())
    assert max(v[0] for v in small.values()) <= 10 ** 4
    assert hits_reference(pairs, scale=10 ** 4) == small
