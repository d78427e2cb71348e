"""Distributed triangle counting: exactly-once semantics vs the
single-process reference, on graphs with hubs, duplicate/reverse
edges, self-loops, string node ids, and triangle-free shapes."""

import hashlib

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _ray_counts(edge_list, **kw):
    from pdf2dom_ray.functions.triangles import triangle_counts
    df = pd.DataFrame(edge_list, columns=["a", "b"])
    kw.setdefault("driver_edge_limit", 0)   # force distributed path
    ds = triangle_counts(rd.from_pandas(df), **kw)
    assert set(ds.schema().names) == {"node", "n_triangles"}
    got = ds.to_pandas()
    if got.empty:   # Ray to_pandas drops columns on 0-row datasets
        return {}
    return dict(zip(got["node"], got["n_triangles"].astype(int)))


def test_k5_clique_plus_star_hub(ray_session):
    from pdf2dom_ray.functions.triangles import triangle_counts_reference
    # K5: every node in C(4,2)=6 triangles; hub 100 fans out to
    # 20 leaves with no leaf-leaf edges -> hub adds no triangles
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(100, 200 + k) for k in range(20)]
    edges += [(200 + k, 100) for k in range(20)]      # reverse dups
    edges += [(3, 3), (100, 100)]                      # self-loops
    ref = triangle_counts_reference(edges)
    assert ref == {i: 6 for i in range(5)}
    assert _ray_counts(edges, num_partitions=4) == ref


def test_pseudo_random_graph_matches_reference(ray_session):
    from pdf2dom_ray.functions.triangles import triangle_counts_reference
    # deterministic hash-derived graph: 60 nodes, ~300 edges, skewed
    edges = []
    for i in range(300):
        h = hashlib.md5(f"tri:{i}".encode()).hexdigest()
        a = int(h[:4], 16) % 60
        b = int(h[4:8], 16) % (10 if i % 3 == 0 else 60)  # hot nodes
        edges.append((a, b))
    ref = triangle_counts_reference(edges)
    assert sum(ref.values()) % 3 == 0          # 3 corners per triangle
    assert sum(ref.values()) > 0
    assert _ray_counts(edges, num_partitions=5) == ref


def test_string_node_ids(ray_session):
    urls = [f"https://x.test/{c}" for c in "abcd"]
    # square a-b-c-d-a plus one diagonal a-c -> two triangles
    edges = [(urls[0], urls[1]), (urls[1], urls[2]), (urls[2], urls[3]),
             (urls[3], urls[0]), (urls[0], urls[2])]
    got = _ray_counts(edges)
    assert got == {urls[0]: 2, urls[1]: 1, urls[2]: 2, urls[3]: 1}


def test_bipartite_graph_has_no_triangles(ray_session):
    edges = [(i, 100 + j) for i in range(6) for j in range(4)]
    from pdf2dom_ray.functions.triangles import triangle_counts_reference
    assert triangle_counts_reference(edges) == {}
    assert _ray_counts(edges) == {}


def test_reference_counts_each_triangle_once():
    from pdf2dom_ray.functions.triangles import triangle_counts_reference
    # one triangle, every edge listed both ways
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)]
    assert triangle_counts_reference(edges) == {1: 1, 2: 1, 3: 1}


def test_driver_and_distributed_paths_identical(ray_session):
    import hashlib

    from pdf2dom_ray.functions.triangles import triangle_counts
    edges = []
    for i in range(200):
        h = hashlib.md5(f"t2:{i}".encode()).hexdigest()
        edges.append((int(h[:4], 16) % 40, int(h[4:8], 16) % 40))
    df = pd.DataFrame(edges, columns=["a", "b"])
    fast = triangle_counts(rd.from_pandas(df)).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    dist = triangle_counts(rd.from_pandas(df),
                           driver_edge_limit=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert fast["node"].tolist() == dist["node"].tolist()
    assert fast["n_triangles"].tolist() == dist["n_triangles"].tolist()


def test_triangles_wedge_free_distributed_path(ray_session):
    """Path graphs produce ZERO wedges: the tri join must be skipped
    (a fully-empty join side repartitions to one schema-less block
    and the finalize fails with "No match ... FieldRef")."""
    import ray.data as rd
    from pdf2dom_ray.functions.triangles import triangle_counts
    ds = rd.from_items([{"a": i, "b": i + 1} for i in range(6)], override_num_blocks=4)
    assert triangle_counts(ds, driver_edge_limit=0).take_all() == []
