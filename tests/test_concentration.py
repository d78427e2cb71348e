"""Categorical concentration (HHI): hand cases, extremes, DuckDB
oracle."""

import numpy as np


def _ds(rows):
    import ray.data as rd
    return rd.from_items(rows, override_num_blocks=4)


def test_hhi_hand_cases_and_extremes(ray_session):
    from pdf2dom_ray.functions.concentration import \
        categorical_concentration
    rows = ([{"source": "pure", "lang": "en"}] * 10
            + [{"source": "even", "lang": l}
               for l in ("en", "de", "fr", "es") for _ in range(5)]
            + [{"source": "skew", "lang": "en"}] * 9
            + [{"source": "skew", "lang": "de"}])
    got = {r["key"]: (r["n_cats"], r["n_rows"], r["hhi_ppm"])
           for r in categorical_concentration(_ds(rows)).take_all()}
    assert got["pure"] == (1, 10, 1_000_000)
    assert got["even"] == (4, 20, 250_000)     # 4·(5/20)² = 1/4
    assert got["skew"] == (2, 10, 820_000)     # (81+1)/100


def test_hhi_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.concentration import (
        categorical_concentration, concentration_oracle_sql)
    rng = np.random.RandomState(43)
    langs = ["en", "de", "fr"]
    rows = [{"source": f"s{rng.randint(5)}",
             "lang": langs[rng.randint(3)]} for _ in range(200)]
    got = sorted((r["key"], r["n_cats"], r["n_rows"], r["hhi_ppm"])
                 for r in categorical_concentration(
                     _ds(rows)).take_all())
    vals = " UNION ALL ".join(
        f"SELECT '{r['source']}' AS source, '{r['lang']}' AS lang"
        for r in rows)
    want = sorted(map(tuple,
                      duckdb.sql(concentration_oracle_sql(vals))
                      .fetchall()))
    assert got == want


def test_hhi_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.concentration import \
        categorical_concentration
    ds = rd.from_arrow(pa.table({"source": pa.array([], pa.string()),
                                 "lang": pa.array([], pa.string())}))
    assert categorical_concentration(ds).take_all() == []
