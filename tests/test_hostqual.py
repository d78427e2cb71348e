"""Host-level quality gate: per-doc integer signal, host verdicts,
both attach paths, and the DuckDB oracle twin."""

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _docs():
    rows = []
    # prose.test: high alpha density -> kept
    for i in range(4):
        rows.append((i, f"https://Prose.test/d/{i}",
                     "plain readable english prose here"))
    # nums.test: digit dumps -> flagged low quality
    for i in range(4, 7):
        rows.append((i, f"https://nums.test/d/{i}",
                     "1029 3847 5561 998 22 0x4f 77"))
    rows.append((7, "https://empty.test/d/7", ""))
    return pd.DataFrame(rows, columns=["doc_id", "url", "text"])


def _run(**kw):
    from pdf2dom_ray.functions.hostqual import host_quality_gate
    ds = rd.from_pandas(_docs())
    got = host_quality_gate(ds, threshold_ppm=500_000, **kw) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    return got


def test_gate_semantics_broadcast(ray_session):
    got = _run()
    assert list(got["doc_id"]) == list(range(8))
    by_host = got.set_index("doc_id")
    # canonical host is lowercased
    assert by_host.loc[0, "host"] == "prose.test"
    assert all(got.loc[got["host"] == "prose.test", "kept"])
    assert not any(got.loc[got["host"] == "nums.test", "kept"])
    assert not by_host.loc[7, "kept"]          # empty text -> q 0
    assert by_host.loc[7, "q_ppm"] == 0
    # host aggregates are exact sums over member docs
    prose = got[got["host"] == "prose.test"]
    assert (prose["host_n_docs"] == 4).all()
    assert (prose["host_q_sum"] == prose["q_ppm"].sum()).all()


def test_attach_paths_identical(ray_session):
    a = _run()
    b = _run(broadcast_limit=0, num_partitions=3)
    pd.testing.assert_frame_equal(
        a, b.sort_values("doc_id").reset_index(drop=True),
        check_like=True)


def test_oracle_sql_matches(ray_session):
    import duckdb

    from pdf2dom_ray.functions.hostqual import host_quality_oracle_sql
    df = _docs()
    hosts = df["url"].str.extract(r"https://([^/]+)/")[0].str.lower()
    con = duckdb.connect()
    con.register("docs_in", pd.DataFrame({
        "doc_id": df["doc_id"], "host": hosts, "text": df["text"]}))
    sql = host_quality_oracle_sql(
        "SELECT doc_id, host, text FROM docs_in")
    ora = con.execute(sql).df().sort_values("doc_id") \
        .reset_index(drop=True)
    got = _run()
    for col in ("host", "q_ppm", "host_n_docs", "host_q_sum",
                "host_low_quality", "kept"):
        assert list(got[col]) == list(ora[col]), col
