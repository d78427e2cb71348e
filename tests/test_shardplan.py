"""Shard planning: hand case, overflow-by-less-than-one-doc bound,
partition invariance, bytes_col path, and the DuckDB window oracle."""

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _run(df, target, n_blocks=1, **kw):
    from pdf2dom_ray.functions.shardplan import shard_plan
    ds = rd.from_pandas(df).repartition(n_blocks)
    return shard_plan(ds, target_bytes=target, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def test_hand_case(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1, 2, 3, 4],
                       "text": ["aaaa", "bbb", "cc", "ddddd", "e"]})
    got = _run(df, target=6)
    # prefix: 0,4,7,9,14 -> shards 0,0,1,1,2
    assert list(got["n_bytes"]) == [4, 3, 2, 5, 1]
    assert list(got["shard_id"]) == [0, 0, 1, 1, 2]
    assert list(got["shard_offset"]) == [0, 4, 1, 3, 2]


def test_partition_invariance_and_overflow_bound(ray_session):
    import hashlib
    rows = []
    for i in range(200):
        n = int(hashlib.md5(f"sp:{i}".encode()).hexdigest()[:2], 16) + 1
        rows.append((i, "x" * n))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    a = _run(df, target=1000, n_blocks=1)
    b = _run(df, target=1000, n_blocks=7)
    pd.testing.assert_frame_equal(a, b)
    # shard ids contiguous from 0; every shard start has offset < target
    sizes = a.groupby("shard_id")["n_bytes"].sum()
    assert list(sizes.index) == list(range(len(sizes)))
    max_doc = a["n_bytes"].max()
    assert (sizes.iloc[:-1] < 1000 + max_doc).all()
    assert (a["shard_offset"] < 1000).all()


def test_bytes_col_and_utf8_bytes(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["ü", "a"],
                       "payload_len": [10, 20]})
    got = _run(df, target=5)
    assert list(got["n_bytes"]) == [2, 1]      # ü = 2 UTF-8 bytes
    got2 = _run(df, target=15, bytes_col="payload_len")
    assert list(got2["n_bytes"]) == [10, 20]
    assert list(got2["shard_id"]) == [0, 0]


def test_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.shardplan import shard_plan_oracle_sql
    df = pd.DataFrame({"doc_id": range(50),
                       "text": [("w" * ((7 * i) % 23 + 1))
                                for i in range(50)]})
    got = _run(df, target=40, n_blocks=4)
    con = duckdb.connect()
    con.register("docs_in", df)
    sql = shard_plan_oracle_sql(
        "SELECT doc_id, strlen(text) AS n_bytes FROM docs_in",
        target_bytes=40)
    ora = con.execute(sql).df().sort_values("doc_id") \
        .reset_index(drop=True)
    for c in ("n_bytes", "shard_id", "shard_offset"):
        assert list(got[c]) == list(ora[c]), c
