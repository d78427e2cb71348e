"""Hash sampling / stratified mixing: determinism, rate convergence,
partitioning invariance, and DuckDB predicate equivalence.
"""

import duckdb
import numpy as np
import pytest

from pdf2dom_ray.functions.sampling import (hash_threshold,
                                            sample_sql_predicate)


def test_threshold_bounds():
    assert hash_threshold(0.0) == "00000000"
    assert hash_threshold(0.5) == "80000000"
    assert hash_threshold(1.0) == "g"
    assert hash_threshold(-3) == "00000000"
    assert hash_threshold(7) == "g"


@pytest.mark.parametrize("frac", [0.1, 0.25, 0.5, 0.9])
def test_rate_converges_and_matches_duckdb(frac):
    urls = [f"https://ex.com/{i}" for i in range(4000)]
    import hashlib
    thr = hash_threshold(frac)
    kept = [u for u in urls
            if hashlib.md5(u.encode()).hexdigest()[:8] < thr]
    rate = len(kept) / len(urls)
    assert abs(rate - frac) < 0.03
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    sql_kept = [r[0] for r in con.execute(
        f"SELECT url FROM t WHERE {sample_sql_predicate(frac)}").fetchall()]
    assert sorted(sql_kept) == sorted(kept)


def test_stratified_partitioning_invariance(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.sampling import stratified_sample
    rows = [{"url": f"https://ex.com/{i}", "lang": ["en", "de", "fr"][i % 3]}
            for i in range(900)]
    fr = {"en": 0.5, "de": 0.2}
    a = stratified_sample(rd.from_items(rows, override_num_blocks=1),
                          fr, default=0.9)
    b = stratified_sample(rd.from_items(rows, override_num_blocks=17),
                          fr, default=0.9)
    ua = sorted(r["url"] for r in a.take_all())
    ub = sorted(r["url"] for r in b.take_all())
    assert ua == ub and 0 < len(ua) < len(rows)
    # per-stratum realized rates near targets
    langs = {u: ["en", "de", "fr"][int(u.rsplit("/", 1)[1]) % 3]
             for u in ua}
    counts = {s: sum(1 for v in langs.values() if v == s)
              for s in ("en", "de", "fr")}
    assert abs(counts["en"] / 300 - 0.5) < 0.1
    assert abs(counts["de"] / 300 - 0.2) < 0.1
    assert abs(counts["fr"] / 300 - 0.9) < 0.1


def test_sample_hash_zero_and_one(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.sampling import sample_hash
    ds = rd.from_items([{"url": f"u{i}"} for i in range(50)], override_num_blocks=4)
    assert sample_hash(ds, 0.0).count() == 0
    assert sample_hash(ds, 1.0).count() == 50


def test_weighted_sample_partitioning_invariance_and_bias(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.sampling import weighted_sample
    # weights 1 vs 1000: heavy docs should dominate the per-stratum cut
    rows = [{"doc_id": i, "lang": ["en", "de"][i % 2],
             "text": "x" * (1000 if i < 100 else 1)}
            for i in range(1000)]
    a = weighted_sample(rd.from_items(rows, override_num_blocks=1),
                        k=20).to_pandas()
    b = weighted_sample(rd.from_items(rows, override_num_blocks=13),
                        k=20).to_pandas()
    key = ["lang", "rank", "doc_id", "priority", "weight"]
    assert a.sort_values(key).reset_index(drop=True) \
        .equals(b.sort_values(key).reset_index(drop=True))
    assert len(a) == 40 and set(a["rank"]) == set(range(1, 21))
    # of 100 heavy docs vs 900 light, heavies should take most slots
    assert (a["weight"] > 1).sum() >= 30


def test_weighted_sample_matches_duckdb(ray_session, sf_dir):
    import duckdb as dk
    import ray.data as rd

    from pdf2dom_ray.functions.sampling import (weighted_sample,
                                                weighted_sample_sql)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])
    got = weighted_sample(ds).to_pandas() \
        .sort_values(["lang", "rank"]).reset_index(drop=True)
    con = dk.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'")
    want = con.sql(weighted_sample_sql()).df() \
        .sort_values(["lang", "rank"]).reset_index(drop=True)
    for c in ("doc_id", "lang", "weight", "priority", "rank"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_train_val_test_split_proportions_and_stability(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pdf2dom_ray.functions.sampling import train_val_test_split
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(2000)), pa.int64())}))
    out = train_val_test_split(ds).to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.04
    assert abs(frac["val"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03
    # growth stability: the first 1000 docs keep their assignment
    sub = train_val_test_split(ds.limit(1000)).to_pandas()
    m = out.set_index("doc_id")["split"]
    assert all(m[r.doc_id] == r.split for r in sub.itertuples())


def test_split_sql_case_matches_python(ray_session):
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from pdf2dom_ray.functions.sampling import (split_sql_case,
                                                train_val_test_split)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(300)), pa.int64())}))
    got = train_val_test_split(ds).to_pandas().set_index("doc_id")
    want = duckdb.sql(
        f"SELECT g AS doc_id, {split_sql_case(key_sql='CAST(g AS VARCHAR)')}"
        " AS split FROM generate_series(0, 299) t(g)").df() \
        .set_index("doc_id")
    assert got["split"].to_dict() == want["split"].to_dict()
