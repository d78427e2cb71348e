"""Front-coding estimate: hand lcp sums, dup collapse, unequal
lengths, DuckDB oracle."""

import numpy as np


def _ds(urls):
    import ray.data as rd
    return rd.from_items([{"url": u} for u in urls], override_num_blocks=4)


def test_frontcoding_hand_case(ray_session):
    from pdf2dom_ray.functions.frontcode import host_frontcoding
    urls = ["https://a.test/aaa", "https://a.test/aab",
            "https://a.test/b", "https://a.test/aaa"]   # dup
    got = {r["host"]: (r["n_urls"], r["raw_bytes"],
                       r["frontcoded_bytes"])
           for r in host_frontcoding(_ds(urls)).take_all()}
    # sorted: /aaa, /aab, /b → lcps 0, 17, 15 (scheme+host+/a, +/)
    raw = len("https://a.test/aaa") * 2 + len("https://a.test/b")
    assert got["a.test"] == (3, raw, raw - 17 - 15)


def test_frontcoding_prefix_free_is_incompressible(ray_session):
    from pdf2dom_ray.functions.frontcode import host_frontcoding
    # same host but no shared path prefixes beyond the host part
    urls = [f"https://x.test/{c}" for c in "abcdef"]
    got = host_frontcoding(_ds(urls)).take_all()[0]
    raw = sum(len(u) for u in urls)
    # every adjacent pair shares exactly "https://x.test/"
    assert got["raw_bytes"] == raw
    assert got["frontcoded_bytes"] == raw - 5 * len("https://x.test/")


def test_frontcoding_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.frontcode import (
        frontcoding_oracle_sql, host_frontcoding)
    rng = np.random.RandomState(163)
    urls = [f"https://h{rng.randint(3)}.test/s{rng.randint(4)}"
            f"/p/{rng.randint(40)}" for _ in range(150)]
    got = sorted((r["host"], r["n_urls"], r["raw_bytes"],
                  r["frontcoded_bytes"])
                 for r in host_frontcoding(_ds(urls)).take_all())
    vals = " UNION ALL ".join(f"SELECT '{u}' AS url" for u in urls)
    want = sorted(map(tuple, duckdb.sql(
        frontcoding_oracle_sql(vals)).fetchall()))
    assert got == want


def test_frontcoding_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.frontcode import host_frontcoding
    ds = rd.from_arrow(pa.table({"url": pa.array([], pa.string())}))
    assert host_frontcoding(ds).take_all() == []
