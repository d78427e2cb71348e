"""Connected components: driver path, BSP path, hand reference."""

import pyarrow as pa
import pytest


EDGES = [(0, 1), (1, 2), (5, 3), (3, 4),
         (7, 8), (8, 7), (9, 9)]     # {0,1,2} {3,4,5} {7,8} {9}


def _ref(edges, rounds):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    lbl = {n: n for n in nodes}
    for _ in range(rounds):
        nxt = dict(lbl)
        for u, v in edges:
            nxt[v] = min(nxt[v], lbl[u])
            nxt[u] = min(nxt[u], lbl[v])
        lbl = nxt
    return lbl


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_cc_matches_reference_both_paths(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.ccomp import cc_labels
    ds = rd.from_items([{"src": u, "target": v} for u, v in EDGES]
                       + [{"src": 0, "target": 1}], override_num_blocks=4)     # dup edge
    got = {r["node"]: r["component"]
           for r in cc_labels(ds, rounds=8,
                              driver_edge_limit=limit).take_all()}
    assert got == _ref(EDGES, 8)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3, 7: 7, 8: 7,
                   9: 9}


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_cc_string_ids_and_bounded_rounds(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.ccomp import cc_labels
    # chain a-b-c-d: after ONE synchronous round the min label only
    # travels one hop (b,c keep their 1-hop min; d sees only c)
    chain = [("b", "c"), ("a", "b"), ("c", "d")]
    ds = rd.from_items([{"src": u, "target": v} for u, v in chain], override_num_blocks=4)
    got = {r["node"]: r["component"]
           for r in cc_labels(ds, rounds=1,
                              driver_edge_limit=limit).take_all()}
    assert got == {"a": "a", "b": "a", "c": "b", "d": "c"}
    got3 = {r["node"]: r["component"]
            for r in cc_labels(ds, rounds=3,
                               driver_edge_limit=limit).take_all()}
    assert got3 == {n: "a" for n in "abcd"}


def test_cc_empty_edges(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.ccomp import cc_labels
    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                 "target": pa.array([], pa.int64())}))
    assert cc_labels(ds, rounds=3).take_all() == []
