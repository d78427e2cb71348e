"""Per-slice percentile rank: brute reference, ties/extremes, n=1
slice, DuckDB window oracle."""

import numpy as np


def _ds(rows):
    import ray.data as rd
    return rd.from_items(rows, override_num_blocks=4)


def _ref(rows):
    out = {}
    by = {}
    for r in rows:
        by.setdefault(r["source"], []).append(r["n_chars"])
    for r in rows:
        vs = by[r["source"]]
        n = len(vs)
        rank1 = sum(1 for x in vs if x < r["n_chars"])  # rank − 1
        out[r["doc_id"]] = (1_000_000 * rank1) // (n - 1) \
            if n > 1 else 0
    return out


def test_prank_matches_reference_with_ties(ray_session):
    from pdf2dom_ray.functions.prank import percentile_rank
    rng = np.random.RandomState(79)
    rows = [{"doc_id": i, "source": f"s{rng.randint(3)}",
             "n_chars": int(rng.randint(0, 15))}   # heavy ties
            for i in range(200)]
    rows.append({"doc_id": 200, "source": "lone", "n_chars": 5})
    got = {r["doc_id"]: r["pr_ppm"]
           for r in percentile_rank(_ds(rows)).take_all()}
    assert got == _ref(rows)
    assert got[200] == 0                  # n = 1 slice


def test_prank_extremes(ray_session):
    from pdf2dom_ray.functions.prank import percentile_rank
    rows = [{"doc_id": i, "source": "a", "n_chars": i * 10}
            for i in range(5)]
    got = {r["doc_id"]: r["pr_ppm"]
           for r in percentile_rank(_ds(rows)).take_all()}
    assert got == {0: 0, 1: 250_000, 2: 500_000, 3: 750_000,
                   4: 1_000_000}


def test_prank_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.prank import (percentile_rank,
                                             percentile_rank_oracle_sql)
    rng = np.random.RandomState(83)
    rows = [{"doc_id": i, "source": f"s{rng.randint(4)}",
             "n_chars": int(rng.randint(0, 50))} for i in range(250)]
    got = sorted((r["doc_id"], r["source"], r["n_chars"], r["pr_ppm"])
                 for r in percentile_rank(_ds(rows)).take_all())
    vals = " UNION ALL ".join(
        f"SELECT {r['doc_id']} AS doc_id, '{r['source']}' AS source,"
        f" {r['n_chars']} AS n_chars" for r in rows)
    want = sorted(map(tuple, duckdb.sql(
        percentile_rank_oracle_sql(vals)).fetchall()))
    assert got == want


def test_prank_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.prank import percentile_rank
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64())}))
    assert percentile_rank(ds).take_all() == []
