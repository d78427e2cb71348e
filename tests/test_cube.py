"""CUBE grouping sets: hand totals, sentinel semantics, DuckDB
GROUP BY CUBE oracle."""

import numpy as np


def _ds(rows):
    import ray.data as rd
    return rd.from_items(rows, override_num_blocks=4)


def test_cube_hand_case(ray_session):
    from pdf2dom_ray.functions.cube import cube_counts
    rows = [{"source": "a", "lang": "en"},
            {"source": "a", "lang": "de"},
            {"source": "b", "lang": "en"}]
    got = {(r["source"], r["lang"]): r["n"]
           for r in cube_counts(_ds(rows),
                                ["source", "lang"]).take_all()}
    assert got[("<all>", "<all>")] == 3
    assert got[("a", "<all>")] == 2
    assert got[("<all>", "en")] == 2
    assert got[("a", "en")] == 1
    assert len(got) == 3 + 2 + 2 + 1          # all grouping sets


def test_cube_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.cube import cube_counts, cube_oracle_sql
    rng = np.random.RandomState(223)
    rows = [{"source": f"s{rng.randint(4)}",
             "lang": ["en", "de", "zh"][rng.randint(3)]}
            for _ in range(150)]
    got = sorted((r["source"], r["lang"], r["n"])
                 for r in cube_counts(_ds(rows),
                                      ["source", "lang"]).take_all())
    vals = " UNION ALL ".join(
        f"SELECT '{r['source']}' AS source, '{r['lang']}' AS lang"
        for r in rows)
    want = sorted(map(tuple, duckdb.sql(
        cube_oracle_sql(vals, ["source", "lang"])).fetchall()))
    assert got == want


def test_cube_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.cube import cube_counts
    ds = rd.from_arrow(pa.table({"source": pa.array([], pa.string()),
                                 "lang": pa.array([], pa.string())}))
    assert cube_counts(ds, ["source", "lang"]).take_all() == []
