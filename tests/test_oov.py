"""OOV-rate scoring vs a DuckDB reference and hand truths."""

import duckdb
import pandas as pd


def _want(df, vocab_size):
    from pdf2dom_ray.functions.oov import oov_oracle_sql
    con = duckdb.connect()
    con.register("documents", df)
    sql = oov_oracle_sql(vocab_size=vocab_size)
    return {d: (n, o, p)
            for d, n, o, p in con.execute(sql).fetchall()}


def test_oov_matches_oracle(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.oov import oov_rate
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a a a b b c", "a b rare1 rare2",
                 "c c rare3", ""]})
    got = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_ppm"])
           for r in oov_rate(rd.from_pandas(df),
                             vocab_size=3).take_all()}
    want = _want(df, 3)
    assert got == want
    # vocab is {a, b, c} (top-3 by count); doc 1 has 2 OOV of 4
    assert got[1] == (4, 2, 500_000)
    assert got[0] == (6, 0, 0)
    assert 3 not in got                     # zero-token doc dropped


def test_oov_tie_break_is_lexicographic(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.oov import oov_rate
    # all tokens count 1: vocab_size=2 must pick 'a','b' (token asc)
    df = pd.DataFrame({"doc_id": [0], "text": ["d c b a"]})
    got = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_ppm"])
           for r in oov_rate(rd.from_pandas(df),
                             vocab_size=2).take_all()}
    assert got == _want(df, 2)
    assert got[0] == (4, 2, 500_000)


def test_oov_multirow_whitespace(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.oov import oov_rate
    df = pd.DataFrame({
        "doc_id": list(range(6)),
        "text": ["x  y", " x", "y ", "x y z", "w", "  "]})
    got = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_ppm"])
           for r in oov_rate(rd.from_pandas(df),
                             vocab_size=2).take_all()}
    assert got == _want(df, 2)
    assert 5 not in got                     # whitespace-only dropped
