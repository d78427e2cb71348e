"""Random walks: both paths, truncation, determinism, oracle SQL."""

import pytest

EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
         ("c", "d"), ("x", "y")]        # d and y are dangling
SEEDS = [(0, "a"), (1, "c"), (2, "x"), (3, "ghost")]


def _ds(rows):
    import ray.data as rd
    return rd.from_items([{"src": u, "target": v} for u, v in rows], override_num_blocks=4)


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_walks_match_reference_both_paths(ray_session, limit):
    from pdf2dom_ray.functions.walks import (random_walks,
                                             random_walks_reference)
    got = sorted((r["walk_id"], r["step"], r["url"]) for r in
                 random_walks(_ds(EDGES + [("a", "b")]), SEEDS,
                              length=6,
                              driver_edge_limit=limit).take_all())
    want = random_walks_reference(EDGES, SEEDS, length=6)
    assert got == want
    # every walk emits its seed row; the absent seed emits ONLY that
    by_walk = {}
    for w, s, u in got:
        by_walk.setdefault(w, []).append((s, u))
    assert by_walk[3] == [(0, "ghost")]
    assert by_walk[2][0] == (0, "x") and by_walk[2][1] == (1, "y")
    assert len(by_walk[2]) == 2            # truncated at dangling y


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_walks_deterministic(ray_session, limit):
    from pdf2dom_ray.functions.walks import random_walks
    a = sorted(map(tuple, (r.values() for r in
                           random_walks(_ds(EDGES), SEEDS, length=5,
                                        driver_edge_limit=limit)
                           .take_all())))
    b = sorted(map(tuple, (r.values() for r in
                           random_walks(_ds(EDGES), SEEDS, length=5,
                                        driver_edge_limit=limit)
                           .take_all())))
    assert a == b


def test_walks_partition_invariance(ray_session):
    import numpy as np
    from pdf2dom_ray.functions.walks import (random_walks,
                                             random_walks_reference)
    rng = np.random.RandomState(43)
    rows = [(f"u{u}", f"u{v}")
            for u, v in rng.randint(0, 30, size=(200, 2))]
    seeds = [(i, f"u{i}") for i in range(0, 30, 3)]
    want = random_walks_reference(rows, seeds, length=5)
    for n_part in (1, 2, 3):
        got = sorted((r["walk_id"], r["step"], r["url"]) for r in
                     random_walks(_ds(rows), seeds, length=5,
                                  driver_edge_limit=0,
                                  n_part=n_part).take_all())
        assert got == want, n_part


def test_walks_oracle_sql_matches(ray_session):
    import duckdb
    import numpy as np
    from pdf2dom_ray.functions.walks import (random_walks,
                                             walks_oracle_sql)
    rng = np.random.RandomState(47)
    pairs = rng.randint(0, 25, size=(150, 2))
    rows = [(f"n{u}", f"n{v}") for u, v in pairs]
    seeds = [(i, f"n{i}") for i in range(0, 25, 2)]
    got = sorted((r["walk_id"], r["step"], r["url"]) for r in
                 random_walks(_ds(rows), seeds, length=5).take_all())
    vals = ", ".join(f"('n{u}', 'n{v}')" for u, v in pairs)
    seed_vals = ", ".join(f"({w}, '{u}')" for w, u in seeds)
    sql = walks_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, target)",
        f"SELECT * FROM (VALUES {seed_vals}) AS s(walk_id, url)",
        length=5)
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want


def test_skipgram_pairs_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from pdf2dom_ray.functions.walks import (skipgram_pairs,
                                             skipgram_oracle_sql)
    rows = [(0, 0, "a"), (0, 1, "b"), (0, 2, "c"), (0, 3, "a"),
            (1, 0, "x"), (1, 1, "y"),
            (2, 0, "solo")]
    ds = rd.from_items([{"walk_id": w, "step": s, "url": u}
                        for w, s, u in rows], override_num_blocks=4)
    got = sorted((r["center"], r["context"], r["n_pairs"]) for r in
                 skipgram_pairs(ds, window=2).take_all())
    vals = ", ".join(f"({w}, {s}, '{u}')" for w, s, u in rows)
    want = sorted(map(tuple, duckdb.sql(skipgram_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(walk_id, step, url)",
        window=2)).fetchall()))
    assert got == want
    # windows never cross walks; the 1-row walk emits nothing
    assert all(c != "solo" and x != "solo" for c, x, _ in got)
    got_by = {(c, x): n for c, x, n in got}
    # 'a' occurs at steps 0 AND 3, both within 2 of b(1) — symmetric
    assert got_by[("a", "b")] == 2 and got_by[("b", "a")] == 2
    assert got_by[("a", "c")] == 2 and got_by[("c", "b")] == 1


def test_skipgram_pairs_partition_invariance(ray_session):
    import numpy as np
    import ray.data as rd
    from pdf2dom_ray.functions.walks import skipgram_pairs
    rng = np.random.RandomState(53)
    rows = [(int(w), int(s), f"n{rng.randint(0, 9)}")
            for w in range(20) for s in range(6)]
    ds = rd.from_items([{"walk_id": w, "step": s, "url": u}
                        for w, s, u in rows], override_num_blocks=4)
    want = sorted((r["center"], r["context"], r["n_pairs"]) for r in
                  skipgram_pairs(ds, window=2,
                                 num_partitions=1).take_all())
    for n_part in (3,):
        got = sorted((r["center"], r["context"], r["n_pairs"]) for r in
                     skipgram_pairs(ds, window=2,
                                    num_partitions=n_part).take_all())
        assert got == want, n_part


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_node2vec_matches_reference_both_paths(ray_session, limit):
    from pdf2dom_ray.functions.walks import (node2vec_reference,
                                             node2vec_walks)
    got = sorted((r["walk_id"], r["step"], r["url"]) for r in
                 node2vec_walks(_ds(EDGES + [("a", "b")]), SEEDS,
                                length=6, wp=1, w1=4, wq=2,
                                driver_edge_limit=limit).take_all())
    want = node2vec_reference(EDGES, SEEDS, length=6,
                              wp=1, w1=4, wq=2)
    assert got == want


def test_node2vec_bias_shifts_distribution(ray_session):
    """With a huge return weight the walk ping-pongs; with a huge
    out-weight it explores — the bias must actually bite."""
    from pdf2dom_ray.functions.walks import node2vec_reference
    star = [("h", f"l{i}") for i in range(4)] + \
           [(f"l{i}", "h") for i in range(4)]
    seeds = [(i, "h") for i in range(40)]
    back = node2vec_reference(star, seeds, length=4,
                              wp=10_000, w1=1, wq=1)
    away = node2vec_reference(star, seeds, length=4,
                              wp=1, w1=1, wq=10_000)
    def returns(rows):
        pos = {(w, s): u for w, s, u in rows}
        return sum(1 for (w, s), u in pos.items()
                   if s >= 2 and u == pos.get((w, s - 2)))
    assert returns(back) > returns(away)


def test_node2vec_oracle_sql_matches(ray_session):
    import duckdb
    import numpy as np
    from pdf2dom_ray.functions.walks import (node2vec_oracle_sql,
                                             node2vec_walks)
    rng = np.random.RandomState(59)
    pairs = rng.randint(0, 20, size=(120, 2))
    rows = [(f"n{u}", f"n{v}") for u, v in pairs]
    seeds = [(i, f"n{i}") for i in range(0, 20, 2)]
    got = sorted((r["walk_id"], r["step"], r["url"]) for r in
                 node2vec_walks(_ds(rows), seeds, length=4,
                                wp=3, w1=5, wq=1).take_all())
    vals = ", ".join(f"('n{u}', 'n{v}')" for u, v in pairs)
    seed_vals = ", ".join(f"({w}, '{u}')" for w, u in seeds)
    sql = node2vec_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, target)",
        f"SELECT * FROM (VALUES {seed_vals}) AS s(walk_id, url)",
        length=4, wp=3, w1=5, wq=1)
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want
