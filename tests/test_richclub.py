"""Rich-club components: hand case, clique extreme, DuckDB oracle."""

import numpy as np


def _ds(edges):
    import ray.data as rd
    return rd.from_items([{"src": u, "target": v} for u, v in edges], override_num_blocks=4)


def test_richclub_hand_case(ray_session):
    from pdf2dom_ray.functions.richclub import rich_club
    # hub h connects to 3 leaves; leaves also form a triangle
    edges = [("h", "a"), ("h", "b"), ("h", "c"),
             ("a", "b"), ("b", "c"), ("a", "c")]
    got = {r["k"]: (r["n_gt"], r["e_gt"])
           for r in rich_club(_ds(edges)).take_all()}
    # degrees: h=3, a=b=c=3 → only k=3 present; nothing above it
    assert got == {3: (0, 0)}


def test_richclub_hub_vs_leaves(ray_session):
    from pdf2dom_ray.functions.richclub import rich_club
    # star: hub degree 4, leaves 1 → at k=1 only the hub survives
    edges = [("h", f"l{i}") for i in range(4)]
    got = {r["k"]: (r["n_gt"], r["e_gt"])
           for r in rich_club(_ds(edges)).take_all()}
    assert got == {1: (1, 0), 4: (0, 0)}


def test_richclub_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.richclub import (rich_club,
                                                rich_club_oracle_sql)
    rng = np.random.RandomState(173)
    edges = [(int(u), int(v))
             for u, v in rng.randint(0, 25, size=(120, 2))]
    got = sorted((r["k"], r["n_gt"], r["e_gt"])
                 for r in rich_club(_ds(edges)).take_all())
    vals = " UNION ALL ".join(
        f"SELECT {u} AS src, {v} AS target" for u, v in edges)
    want = sorted(map(tuple, duckdb.sql(
        rich_club_oracle_sql(vals)).fetchall()))
    assert got == want


def test_richclub_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.richclub import rich_club
    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                 "target": pa.array([], pa.int64())}))
    assert rich_club(ds).take_all() == []
