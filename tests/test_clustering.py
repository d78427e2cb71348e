"""Local clustering coefficient: exact integer-ppm values vs a
single-process brute-force reference, on cliques, stars, rings,
string node ids, and a pseudo-random skewed graph."""

import hashlib

import pandas as pd
import ray.data as rd


def _reference(edge_list) -> dict:
    """Brute force: cc_ppm(v) = 2*T(v)*1e6 // (d(d-1)) for d >= 2."""
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            continue
        t = sum(1 for x in nbrs for y in nbrs
                if x < y and y in adj.get(x, ()))
        out[v] = (d, t, 2 * t * 1_000_000 // (d * (d - 1)))
    return out


def _ray_cc(edge_list):
    from pdf2dom_ray.functions.clustering import clustering_coefficient
    df = pd.DataFrame(edge_list, columns=["a", "b"])
    got = clustering_coefficient(rd.from_pandas(df)).to_pandas()
    if got.empty:
        return {}
    return {r.node: (int(r.degree), int(r.n_triangles), int(r.cc_ppm))
            for r in got.itertuples()}


def test_k5_clique_and_star(ray_session):
    # K5 nodes: d=4, T=6, cc=1.0 -> 1_000_000 ppm; star hub: d=8,
    # T=0 -> 0 ppm; leaves d=1 omitted
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(100, 200 + k) for k in range(8)]
    edges += [(3, 3)]                     # self-loop ignored
    edges += [(1, 0), (2, 0)]             # reverse dups ignored
    got = _ray_cc(edges)
    assert got == _reference(edges)
    assert got[0] == (4, 6, 1_000_000)
    assert got[100] == (8, 0, 0)
    assert 200 not in got                 # degree 1 omitted


def test_ring_has_zero_coefficient(ray_session):
    edges = [(i, (i + 1) % 10) for i in range(10)]
    got = _ray_cc(edges)
    assert got == {i: (2, 0, 0) for i in range(10)}


def test_pseudo_random_graph_matches_reference(ray_session):
    edges = []
    for i in range(250):
        h = hashlib.md5(f"cc:{i}".encode()).hexdigest()
        a = int(h[:4], 16) % 50
        b = int(h[4:8], 16) % (8 if i % 3 == 0 else 50)  # hot nodes
        edges.append((a, b))
    got = _ray_cc(edges)
    ref = _reference(edges)
    assert got == ref
    assert any(v[2] not in (0, 1_000_000) for v in ref.values())


def test_string_node_ids(ray_session):
    urls = [f"https://x.test/{c}" for c in "abcd"]
    # square a-b-c-d-a plus diagonal a-c: a,c have d=3,T=2 ->
    # 2*2e6//6 = 666_666 ppm; b,d have d=2,T=1 -> 1_000_000
    edges = [(urls[0], urls[1]), (urls[1], urls[2]), (urls[2], urls[3]),
             (urls[3], urls[0]), (urls[0], urls[2])]
    got = _ray_cc(edges)
    assert got[urls[0]] == (3, 2, 666_666)
    assert got[urls[1]] == (2, 1, 1_000_000)
    assert got == _reference(edges)


def test_oracle_sql_matches_on_duckdb(ray_session):
    import duckdb

    from pdf2dom_ray.functions.clustering import clustering_oracle_sql
    edges = []
    for i in range(120):
        h = hashlib.md5(f"ccq:{i}".encode()).hexdigest()
        edges.append((int(h[:4], 16) % 30, int(h[4:8], 16) % 30))
    df = pd.DataFrame(edges, columns=["a", "b"])
    con = duckdb.connect()
    con.register("edges_in", df)
    sql = clustering_oracle_sql("SELECT a, b FROM edges_in")
    ora = con.execute(sql).df().sort_values("node").reset_index(drop=True)
    got = clustering_coefficient_df(df).sort_values("node") \
        .reset_index(drop=True)
    assert got["node"].tolist() == ora["node"].tolist()
    assert got["cc_ppm"].tolist() == ora["cc_ppm"].astype(int).tolist()
    assert got["degree"].tolist() == ora["degree"].astype(int).tolist()


def clustering_coefficient_df(df):
    from pdf2dom_ray.functions.clustering import clustering_coefficient
    return clustering_coefficient(rd.from_pandas(df)).to_pandas()
