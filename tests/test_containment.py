"""Broder containment pairs: hand truth, both attach paths, oracle."""

import duckdb
import pandas as pd
import pytest


def _mk_docs():
    base = " ".join(f"w{i}" for i in range(20))          # 16 5-shingles
    contained = " ".join(f"w{i}" for i in range(5, 15))  # 6, all shared
    other = " ".join(f"x{i}" for i in range(12))
    partial = " ".join(f"w{i}" for i in range(3, 9)) + " zz qq"
    return pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [base, contained, other, partial]})


def _want(df, k=5, df_cap=8, min_shared=2):
    con = duckdb.connect()
    con.register("documents", df)
    from pdf2dom_ray.functions.containment import containment_oracle_sql
    sql = containment_oracle_sql(k=k, df_cap=df_cap,
                                 min_shared=min_shared)
    return {(a, b): (s, p)
            for a, b, s, p in con.execute(sql).fetchall()}


@pytest.mark.parametrize("limit", [10_000_000, 0])
def test_containment_matches_oracle_both_paths(ray_session, limit):
    import ray.data as rd
    from pdf2dom_ray.functions.containment import containment_pairs
    df = _mk_docs()
    got = {(r["doc_a"], r["doc_b"]):
           (r["shared_shingles"], r["containment_ppm"])
           for r in containment_pairs(
               rd.from_pandas(df), broadcast_limit=limit)
           .take_all()}
    want = _want(df)
    assert got == want and len(got) >= 1
    # doc 1 (10 tokens -> 6 shingles) fully inside doc 0
    assert got[(0, 1)] == (6, 1_000_000)


def test_containment_df_cap_drops_hot_shingles(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.containment import containment_pairs
    # the same shingle in every doc: df_cap=2 kills all candidates
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b c d e f", "a b c d e g", "a b c d e h"]})
    got = containment_pairs(rd.from_pandas(df), df_cap=2,
                            min_shared=1).take_all()
    assert got == []
    # raising the cap brings the pairs back, matching the oracle
    got2 = {(r["doc_a"], r["doc_b"]):
            (r["shared_shingles"], r["containment_ppm"])
            for r in containment_pairs(rd.from_pandas(df), df_cap=3,
                                       min_shared=1).take_all()}
    assert got2 == _want(df, df_cap=3, min_shared=1)
    assert got2[(0, 1)] == (1, 500_000)     # "a b c d e" of 2 shingles


def test_containment_empty_and_short_docs(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.containment import containment_pairs
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["tiny", ""]})
    assert containment_pairs(rd.from_pandas(df)).take_all() == []
