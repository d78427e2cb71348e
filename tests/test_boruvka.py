"""Boruvka maximum spanning forest (functions/boruvka.py)."""
import numpy as np
import pandas as pd
import ray.data as rd

from pdf2dom_ray.functions.boruvka import boruvka_forest


def _edges(rows):
    return rd.from_items([{"src": a, "target": b, "w": w}
                          for a, b, w in rows], override_num_blocks=4)


def _kruskal_max(rows, n_nodes):
    """Classic reference: max spanning forest weight."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total = 0
    for a, b, w in sorted(rows, key=lambda r: (-r[2], r[0], r[1])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            total += w
    return total


def _acyclic(df):
    nodes = sorted(set(df.a) | set(df.b))
    idx = {n: i for i, n in enumerate(nodes)}
    parent = list(range(len(nodes)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(df.a, df.b):
        ra, rb = find(idx[a]), find(idx[b])
        if ra == rb:
            return False
        parent[ra] = rb
    return True


def test_boruvka_square_picks_max_tree(ray_session):
    rows = [(0, 1, 10), (1, 2, 20), (2, 3, 30), (0, 3, 40)]
    got = boruvka_forest(_edges(rows), rounds=4,
                         label_rounds=8).to_pandas()
    assert len(got) == 3
    assert got.w.sum() == 90          # drops the weight-10 edge
    assert _acyclic(got)


def test_boruvka_matches_kruskal_weight(ray_session):
    rng_rows = []
    for i in range(40):               # deterministic pseudo graph
        rng_rows.append((i, (2 * i + 1) % 40, (31 * i + 7) % 97))
        rng_rows.append((i, (3 * i + 5) % 40, (17 * i + 3) % 97))
    rows = [(min(a, b), max(a, b), w) for a, b, w in rng_rows
            if a != b]
    # MAX-merge duplicate pairs like the operator does
    dd = {}
    for a, b, w in rows:
        dd[(a, b)] = max(dd.get((a, b), -1), w)
    rows = [(a, b, w) for (a, b), w in dd.items()]
    got = boruvka_forest(_edges(rows), rounds=8,
                         label_rounds=16).to_pandas()
    assert _acyclic(got)
    assert got.w.sum() == _kruskal_max(rows, 40)


def test_boruvka_dups_and_selfloops(ray_session):
    rows = [(0, 1, 5), (1, 0, 9), (1, 1, 99), (1, 2, 7)]
    got = boruvka_forest(_edges(rows), rounds=3,
                         label_rounds=4).to_pandas()
    assert len(got) == 2
    assert got.w.sum() == 16          # dup pair keeps max weight 9


def test_boruvka_distributed_matches_driver(ray_session):
    rows = [(0, 1, 10), (1, 2, 20), (2, 3, 30), (0, 3, 40),
            (3, 4, 15), (4, 5, 25), (5, 0, 35)]
    # bounded rounds: path identity holds at ANY round budget, so the
    # small budget only cuts BSP fixed cost (suite-time budget)
    drv = boruvka_forest(_edges(rows), rounds=2,
                         label_rounds=4).to_pandas() \
        .reset_index(drop=True)
    bsp = boruvka_forest(_edges(rows), rounds=2, label_rounds=4,
                         driver_edge_limit=0).to_pandas() \
        .reset_index(drop=True)
    assert drv.astype("int64").equals(bsp.astype("int64"))
