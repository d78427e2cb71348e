"""Crosstab/PIVOT: 0-fill semantics, dynamic columns, DuckDB PIVOT
oracle."""

import numpy as np


def _ds(rows):
    import ray.data as rd
    return rd.from_items(rows, override_num_blocks=4)


def test_crosstab_zero_fill_and_columns(ray_session):
    from pdf2dom_ray.functions.crosstab import crosstab
    rows = [{"source": "a", "lang": "en"},
            {"source": "a", "lang": "en"},
            {"source": "a", "lang": "de"},
            {"source": "b", "lang": "fr"}]
    df = crosstab(_ds(rows)).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    assert sorted(df.columns) == ["de", "en", "fr", "source"]
    assert df.set_index("source").loc["a"].tolist() == [1, 2, 0]
    assert df.set_index("source").loc["b"].tolist() == [0, 0, 1]


def test_crosstab_matches_duckdb_pivot(ray_session):
    import duckdb
    import pandas as pd
    from pdf2dom_ray.functions.crosstab import (crosstab,
                                                crosstab_oracle_sql)
    rng = np.random.RandomState(47)
    langs = ["en", "de", "fr", "zh"]
    rows = [{"source": f"s{rng.randint(6)}",
             "lang": langs[rng.randint(4)]} for _ in range(250)]
    got = crosstab(_ds(rows)).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    vals = " UNION ALL ".join(
        f"SELECT '{r['source']}' AS source, '{r['lang']}' AS lang"
        for r in rows)
    want = duckdb.sql(crosstab_oracle_sql(vals)).fetchdf() \
        .sort_values("source").reset_index(drop=True)
    cast = {c: "int64" for c in langs}
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].astype(cast),
        want[sorted(want.columns)].astype(cast))


def test_crosstab_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.crosstab import crosstab
    ds = rd.from_arrow(pa.table({"source": pa.array([], pa.string()),
                                 "lang": pa.array([], pa.string())}))
    assert crosstab(ds).take_all() == []


def test_melt_inverts_crosstab(ray_session):
    from pdf2dom_ray.functions.crosstab import crosstab, melt
    rows = [{"source": "a", "lang": "en"},
            {"source": "a", "lang": "de"},
            {"source": "b", "lang": "fr"}]
    long = sorted((r["source"], r["variable"], r["value"])
                  for r in melt(crosstab(_ds(rows)),
                                id_col="source").take_all())
    assert long == [("a", "de", 1), ("a", "en", 1), ("a", "fr", 0),
                    ("b", "de", 0), ("b", "en", 0), ("b", "fr", 1)]


def test_melt_matches_duckdb_unpivot(ray_session):
    import duckdb
    from pdf2dom_ray.functions.crosstab import (crosstab,
                                                crosstab_oracle_sql,
                                                melt,
                                                melt_oracle_sql)
    rng = np.random.RandomState(89)
    langs = ["en", "de", "zh"]
    rows = [{"source": f"s{rng.randint(5)}",
             "lang": langs[rng.randint(3)]} for _ in range(150)]
    got = sorted((r["source"], r["variable"], r["value"])
                 for r in melt(crosstab(_ds(rows)),
                               id_col="source").take_all())
    vals = " UNION ALL ".join(
        f"SELECT '{r['source']}' AS source, '{r['lang']}' AS lang"
        for r in rows)
    want = sorted(map(tuple, duckdb.sql(melt_oracle_sql(
        crosstab_oracle_sql(vals), id_col="source")).fetchall()))
    assert got == want
