"""Jones-Plassmann greedy coloring: proper-coloring property, exact
equality with the single-process reference on both paths, string
ids, bounded rounds, and the unrolled DuckDB oracle."""

import hashlib

import pandas as pd
import ray.data as rd


def _edges_df(edge_list):
    return pd.DataFrame(edge_list, columns=["src", "target"])


def _ray_colors(edge_list, **kw):
    from pdf2dom_ray.functions.coloring import jp_coloring
    ds = jp_coloring(rd.from_pandas(_edges_df(edge_list)), **kw)
    got = ds.to_pandas()
    if got.empty:
        return {}
    return dict(zip(got["node"], got["color"].astype(int)))


def _assert_proper(colors, edge_list):
    for a, b in edge_list:
        if a != b and colors[a] >= 0 and colors[b] >= 0:
            assert colors[a] != colors[b], (a, b)


def test_k4_and_path(ray_session):
    from pdf2dom_ray.functions.coloring import jp_coloring_reference
    edges = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    edges += [(10, 11), (11, 12), (12, 13)]
    ref = jp_coloring_reference(edges)
    got = _ray_colors(edges)
    assert got == ref
    assert all(c >= 0 for c in got.values())
    _assert_proper(got, edges)
    assert sorted({got[i] for i in range(4)}) == [0, 1, 2, 3]  # K4
    assert max(got[v] for v in (10, 11, 12, 13)) <= 1          # path


def test_pseudo_random_graph(ray_session):
    from pdf2dom_ray.functions.coloring import jp_coloring_reference
    edges = []
    for i in range(300):
        h = hashlib.md5(f"col:{i}".encode()).hexdigest()
        a = int(h[:4], 16) % 60
        b = int(h[4:8], 16) % (12 if i % 3 == 0 else 60)
        edges.append((a, b))
    # hub-skewed priority chains need more than the default 12 waves
    ref = jp_coloring_reference(edges, rounds=40)
    got = _ray_colors(edges, rounds=40)
    assert got == ref
    _assert_proper(got, [e for e in edges if e[0] != e[1]])
    assert all(c >= 0 for c in got.values())


def test_driver_and_bsp_paths_identical(ray_session):
    from pdf2dom_ray.functions.coloring import jp_coloring_reference
    edges = []
    for i in range(200):
        h = hashlib.md5(f"c2:{i}".encode()).hexdigest()
        edges.append((int(h[:4], 16) % 40, int(h[4:8], 16) % 40))
    ref = jp_coloring_reference(edges)
    fast = _ray_colors(edges)
    dist = _ray_colors(edges, driver_edge_limit=0, n_part=3)
    assert fast == ref
    assert dist == ref


def test_string_node_ids_both_paths(ray_session):
    urls = [f"https://h{c}.test/" for c in "abcde"]
    edges = [(urls[i], urls[(i + 1) % 5]) for i in range(5)]  # C5
    from pdf2dom_ray.functions.coloring import jp_coloring_reference
    ref = jp_coloring_reference(edges)
    assert _ray_colors(edges) == ref
    assert _ray_colors(edges, driver_edge_limit=0, n_part=2) == ref
    _assert_proper(ref, edges)


def test_bounded_rounds_leaves_undecided(ray_session):
    # one round on a path colors only the priority-minima wave
    edges = [(i, i + 1) for i in range(30)]
    got = _ray_colors(edges, rounds=1)
    assert any(c == -1 for c in got.values())
    assert any(c == 0 for c in got.values())
    from pdf2dom_ray.functions.coloring import jp_coloring_reference
    assert got == jp_coloring_reference(edges, rounds=1)


def test_oracle_sql_matches(ray_session):
    import duckdb

    from pdf2dom_ray.functions.coloring import (coloring_oracle_sql,
                                                jp_coloring_reference)
    edges = []
    for i in range(120):
        h = hashlib.md5(f"c3:{i}".encode()).hexdigest()
        edges.append((int(h[:4], 16) % 25, int(h[4:8], 16) % 25))
    con = duckdb.connect()
    con.register("edges_in", _edges_df(edges))
    sql = coloring_oracle_sql("SELECT src, target FROM edges_in",
                              rounds=12)
    ora = con.execute(sql).df()
    want = dict(zip(ora["node"], ora["color"].astype(int)))
    ref = jp_coloring_reference(edges, rounds=12)
    assert want == ref
    assert _ray_colors(edges) == ref
