"""Heaps vocabulary-growth curve: hand case, partition invariance,
empty/messy tokens, monotonicity, and the DuckDB window oracle."""

import pandas as pd
import ray.data as rd


def _run(df, n_buckets, n_blocks=1):
    from pdf2dom_ray.functions.vocabgrowth import vocab_growth
    ds = rd.from_pandas(df).repartition(n_blocks)
    return vocab_growth(ds, n_docs=len(df), n_buckets=n_buckets) \
        .to_pandas().sort_values("bucket").reset_index(drop=True)


def test_hand_case(ray_session):
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b a", "b c", "", "c d  d"],   # doubled space
    })
    got = _run(df, n_buckets=2)
    # bucket 0 = docs 0,1: tokens a b a b c (5, distinct a b c = 3)
    # bucket 1 = docs 2,3: tokens c d d (3, new distinct d = 1)
    assert list(got["bucket"]) == [0, 1]
    assert list(got["n_tokens_cum"]) == [5, 8]
    assert list(got["n_distinct_cum"]) == [3, 4]


def test_partition_invariance_and_monotone(ray_session):
    import hashlib
    rows = []
    for i in range(120):
        h = hashlib.md5(f"vg:{i}".encode()).hexdigest()
        words = [f"w{int(h[j:j+2], 16) % 40}" for j in (0, 2, 4, 6)]
        rows.append((i, " ".join(words)))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    a = _run(df, n_buckets=10, n_blocks=1)
    b = _run(df, n_buckets=10, n_blocks=7)
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_tokens_cum"].diff().dropna() >= 0).all()
    assert (a["n_distinct_cum"].diff().dropna() >= 0).all()
    assert a["n_distinct_cum"].iloc[-1] <= 40
    assert a["n_tokens_cum"].iloc[-1] == 480


def test_oracle_sql_matches(ray_session):
    import duckdb

    from pdf2dom_ray.functions.vocabgrowth import vocab_growth_oracle_sql
    df = pd.DataFrame({
        "doc_id": range(30),
        "text": [f"t{i % 7} t{i % 11} shared" for i in range(30)],
    })
    con = duckdb.connect()
    con.register("documents", df)
    ora = con.execute(vocab_growth_oracle_sql(
        n_docs=30, n_buckets=5)).df()
    got = _run(df, n_buckets=5, n_blocks=3)
    for c in ("bucket", "n_tokens_cum", "n_distinct_cum"):
        assert list(got[c]) == list(ora[c]), c
