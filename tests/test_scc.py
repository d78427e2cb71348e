"""Bounded FW-BW peel SCC (functions/scc.py): hand graphs, the
bounded-round semantics, driver/BSP path equality, and the unrolled
DuckDB oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pdf2dom_ray.functions.scc import scc_labels, scc_oracle_sql


def _edges(rows):
    return rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in rows], pa.int64()),
        "target": pa.array([b for _, b in rows], pa.int64())}))


def _got(ds):
    return dict(zip(*[ds.to_pandas().sort_values("node")[c]
                      .to_numpy() for c in ("node", "scc")]))


def test_two_cycles_and_bridge(ray_session):
    # cycle {0,1,2} → bridge → cycle {5,6}; node 9 dangling
    rows = [(0, 1), (1, 2), (2, 0), (2, 5), (5, 6), (6, 5), (9, 0)]
    got = _got(scc_labels(_edges(rows), outer_rounds=3, rounds=8))
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 9: 9}


def test_bounded_outer_rounds_self_label(ray_session):
    # with only ONE peel the second cycle stays unlabeled → each
    # member self-labels (the documented bounded semantics)
    rows = [(0, 1), (1, 0), (5, 6), (6, 5)]
    got = _got(scc_labels(_edges(rows), outer_rounds=1, rounds=8))
    assert got == {0: 0, 1: 0, 5: 5, 6: 6}
    full = _got(scc_labels(_edges(rows), outer_rounds=2, rounds=8))
    assert full == {0: 0, 1: 0, 5: 5, 6: 5}


def test_matches_reference_random(ray_session):
    rng = np.random.default_rng(17)
    rows = [(int(a), int(b))
            for a, b in rng.integers(0, 25, size=(60, 2))
            if a != b]
    # naive reference: repeated min-pivot mutual reach (exact)
    from collections import defaultdict
    succ, pred = defaultdict(set), defaultdict(set)
    nodes = set()
    for a, b in rows:
        succ[a].add(b)
        pred[b].add(a)
        nodes.update((a, b))

    def reach(s, adj):
        seen, st = {s}, [s]
        while st:
            v = st.pop()
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    st.append(w)
        return seen

    want, un = {}, set(nodes)
    while un:
        v = min(un)
        comp = (reach(v, succ) & reach(v, pred)) & un
        for w in comp:
            want[w] = v
        un -= comp
    got = _got(scc_labels(_edges(rows), outer_rounds=len(nodes),
                          rounds=32))
    assert got == want


def test_driver_and_bsp_paths_identical(ray_session):
    rows = [(i, (2 * i + 1) % 20) for i in range(20)] + \
        [(i, (3 * i + 7) % 20) for i in range(20)]
    a = _got(scc_labels(_edges(rows), outer_rounds=3, rounds=12))
    b = _got(scc_labels(_edges(rows), outer_rounds=3, rounds=12,
                        driver_edge_limit=0))
    assert a == b


def test_matches_sql_oracle(ray_session):
    rows = [(0, 1), (1, 2), (2, 0), (2, 5), (5, 6), (6, 5), (9, 0)]
    vals = ", ".join(f"({a}, {b})" for a, b in rows)
    cte = (f"SELECT CAST(col0 AS BIGINT) AS src, "
           f"CAST(col1 AS BIGINT) AS target "
           f"FROM (VALUES {vals})")
    want = duckdb.connect().execute(
        scc_oracle_sql(cte, outer_rounds=3, rounds=8)).df() \
        .sort_values("node").reset_index(drop=True)
    got = scc_labels(_edges(rows), outer_rounds=3,
                     rounds=8).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_condensation_hand_case(ray_session):
    # cycle {0,1,2} -> cycle {5,6} via two parallel quotient edges;
    # dangler 9 -> 0 adds a singleton->SCC edge
    from pdf2dom_ray.functions.scc import condensation_edges
    rows = [(0, 1), (1, 2), (2, 0), (2, 5), (1, 6), (5, 6), (6, 5),
            (9, 0)]
    got = condensation_edges(_edges(rows), outer_rounds=3,
                             rounds=8).to_pandas() \
        .sort_values(["scc_src", "scc_target"]).reset_index(drop=True)
    assert got.to_dict("records") == [
        {"scc_src": 0, "scc_target": 5, "n_edges": 2},
        {"scc_src": 9, "scc_target": 0, "n_edges": 1}]


def test_condensation_matches_oracle(ray_session):
    from pdf2dom_ray.functions.scc import (condensation_edges,
                                           condensation_oracle_sql)
    rows = [(0, 1), (1, 2), (2, 0), (2, 5), (1, 6), (5, 6), (6, 5),
            (9, 0)]
    vals = ", ".join(f"({a}, {b})" for a, b in rows)
    cte = (f"SELECT CAST(col0 AS BIGINT) AS src, "
           f"CAST(col1 AS BIGINT) AS target FROM (VALUES {vals})")
    want = duckdb.connect().execute(
        condensation_oracle_sql(cte, outer_rounds=3, rounds=8)).df() \
        .sort_values(["scc_src", "scc_target"]).reset_index(drop=True)
    got = condensation_edges(_edges(rows), outer_rounds=3,
                             rounds=8).to_pandas() \
        .sort_values(["scc_src", "scc_target"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_anti_join_peel_path(ray_session):
    # broadcast_limit=0 forces the left_anti edge peel and the
    # join-based self-labeling — must agree with the broadcast path
    rows = [(0, 1), (1, 2), (2, 0), (2, 5), (5, 6), (6, 5), (9, 0)]
    a = _got(scc_labels(_edges(rows), outer_rounds=3, rounds=8))
    b = _got(scc_labels(_edges(rows), outer_rounds=3, rounds=8,
                        broadcast_limit=0))
    assert a == b == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 9: 9}


def test_condensation_cross_block_duplicate_edges(ray_session):
    """An identical (src, target) edge duplicated in DIFFERENT blocks
    must count once in n_edges (global distinct, like the oracle's
    SELECT DISTINCT) — batch-local thinning can't see the twin."""
    from pdf2dom_ray.functions.scc import condensation_edges
    rows = [(0, 1), (1, 0), (0, 5), (5, 6)]
    one = _edges(rows).repartition(1)
    # same edges + a cross-block duplicate of (0, 5)
    dup = _edges(rows + [(0, 5)]).repartition(5)
    a = condensation_edges(one, outer_rounds=3, rounds=8) \
        .to_pandas().sort_values(["scc_src", "scc_target"]) \
        .reset_index(drop=True)
    b = condensation_edges(dup, outer_rounds=3, rounds=8) \
        .to_pandas().sort_values(["scc_src", "scc_target"]) \
        .reset_index(drop=True)
    assert a.equals(b)
    assert (a.set_index(["scc_src", "scc_target"])["n_edges"]
            .loc[(0, 5)] == 1)
