"""Greedy max-coverage selection (functions/coverage.py): hand case,
tie-break, early stop, partition invariance, and the unrolled oracle."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pdf2dom_ray.functions.coverage import (coverage_oracle_sql,
                                            coverage_select)


def _docs(rows, nparts=1):
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in rows], override_num_blocks=4)
    return ds.repartition(nparts) if nparts > 1 else ds


def test_hand_case_greedy_order(ray_session):
    # doc 0: shingles {a b c, b c d} ; doc 1 ⊂ doc 2 ; doc 2 adds 3
    rows = [(0, "a b c d"),
            (1, "x y z"),
            (2, "x y z w v")]
    got = coverage_select(_docs(rows), k=3).to_pandas()
    # doc 2 first (3 shingles), then doc 0 (2), doc 1 adds nothing
    assert got["doc_id"].tolist() == [2, 0]
    assert got["gain"].tolist() == [3, 2]
    assert got["rank"].tolist() == [1, 2]


def test_tie_breaks_to_lowest_id(ray_session):
    rows = [(7, "p q r"), (3, "s t u")]
    got = coverage_select(_docs(rows), k=1).to_pandas()
    assert got["doc_id"].tolist() == [3]


def test_partition_invariance(ray_session):
    rows = [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)))
            for i in range(30)]
    a = coverage_select(_docs(rows, 1), k=5).to_pandas()
    b = coverage_select(_docs(rows, 6), k=5).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_matches_sql_oracle(ray_session):
    rows = [(i, " ".join(f"t{(i * 5 + j) % 31}" for j in range(10)))
            for i in range(20)]
    vals = ", ".join(
        f"({d}, '{t}')" for d, t in rows)
    cte = (f"SELECT CAST(col0 AS BIGINT) AS doc_id, col1 AS text "
           f"FROM (VALUES {vals})")
    want = duckdb.connect().execute(
        coverage_oracle_sql(cte, k=4)).df() \
        .sort_values("rank").reset_index(drop=True)
    got = coverage_select(_docs(rows, 3), k=4).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_novelty_hand_case(ray_session):
    from pdf2dom_ray.functions.coverage import shingle_novelty
    rows = [(0, "a b c d"),        # shingles {a b c, b c d} — owns both
            (1, "a b c d"),        # exact dup → 0 novel
            (2, "a b c x")]        # {a b c, b c x} → owns b c x
    got = shingle_novelty(_docs(rows, 2)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_shingles"].tolist() == [2, 2, 2]
    assert got["n_novel"].tolist() == [2, 0, 1]
    assert got["novelty_ppm"].tolist() == [1000000, 0, 500000]


def test_novelty_matches_oracle(ray_session):
    from pdf2dom_ray.functions.coverage import (novelty_oracle_sql,
                                                shingle_novelty)
    rows = [(i, " ".join(f"t{(i * 5 + j) % 31}" for j in range(10)))
            for i in range(20)]
    vals = ", ".join(f"({d}, '{t}')" for d, t in rows)
    cte = (f"SELECT CAST(col0 AS BIGINT) AS doc_id, col1 AS text "
           f"FROM (VALUES {vals})")
    want = duckdb.connect().execute(novelty_oracle_sql(cte)).df() \
        .sort_values("doc_id").reset_index(drop=True)
    got = shingle_novelty(_docs(rows, 3)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
