"""Fuzzy string self-join (FastSS deletion blocking + banded DP):
completeness vs brute force, k=1 and k=2, short strings q-gram
filters miss, unicode, df_cap, and the DuckDB oracle twin."""

import hashlib

import pandas as pd
import ray.data as rd


def _ray_pairs(values, **kw):
    from pdf2dom_ray.functions.fuzzyjoin import fuzzy_self_join
    df = pd.DataFrame({"s": values})
    got = fuzzy_self_join(rd.from_pandas(df), "s", **kw).to_pandas()
    if got.empty:
        return {}
    return {(r.a, r.b): int(r.dist) for r in got.itertuples()}


def test_banded_levenshtein_exact():
    from pdf2dom_ray.functions.fuzzyjoin import banded_levenshtein
    assert banded_levenshtein("kitten", "sitting", 3) == 3
    assert banded_levenshtein("abc", "abc", 2) == 0
    assert banded_levenshtein("a", "b", 1) == 1
    assert banded_levenshtein("", "ab", 2) == 2
    assert banded_levenshtein("abcd", "dcba", 1) == 2  # capped at k+1
    assert banded_levenshtein("flaw", "lawn", 2) == 2


def test_typo_pairs_k1(ray_session):
    from pdf2dom_ray.functions.fuzzyjoin import fuzzy_pairs_reference
    vals = ["google", "gogle", "googel", "yahoo", "yaho", "bing",
            "google", "amazon"]          # dup collapses
    ref = fuzzy_pairs_reference(vals, 1)
    assert ("gogle", "google") in ref
    assert ("yaho", "yahoo") in ref
    assert _ray_pairs(vals) == ref


def test_short_strings_where_qgram_filters_fail(ray_session):
    # "a" vs "b": ed 1, share NO q-gram — deletion blocking still
    # finds it (both have variant "")
    from pdf2dom_ray.functions.fuzzyjoin import fuzzy_pairs_reference
    vals = ["a", "b", "ab", "ba", "x"]
    ref = fuzzy_pairs_reference(vals, 1)
    assert ("a", "b") in ref
    assert _ray_pairs(vals) == ref


def test_k2_neighborhood(ray_session):
    from pdf2dom_ray.functions.fuzzyjoin import fuzzy_pairs_reference
    vals = ["stream", "steam", "seam", "dream", "cream", "scream"]
    ref1 = fuzzy_pairs_reference(vals, 1)
    ref2 = fuzzy_pairs_reference(vals, 2)
    assert ("steam", "stream") in ref1
    assert ("seam", "stream") in ref2 and ("seam", "stream") not in ref1
    assert _ray_pairs(vals, max_dist=1) == ref1
    assert _ray_pairs(vals, max_dist=2) == ref2


def test_pseudo_random_hosts_match_reference(ray_session):
    from pdf2dom_ray.functions.fuzzyjoin import fuzzy_pairs_reference
    vals = [f"site{int(hashlib.md5(f'fz:{i}'.encode()).hexdigest()[:4], 16) % 300}"
            for i in range(600)]
    ref = fuzzy_pairs_reference(vals, 1)
    assert len(ref) > 50
    assert _ray_pairs(vals) == ref


def test_unicode_strings(ray_session):
    from pdf2dom_ray.functions.fuzzyjoin import fuzzy_pairs_reference
    vals = ["café", "cafe", "naïve", "naive", "über"]
    ref = fuzzy_pairs_reference(vals, 1)
    assert ("cafe", "café") in ref
    assert _ray_pairs(vals) == ref


def test_df_cap_drops_degenerate_variant(ray_session):
    # 5 single-char strings all share variant "" — df_cap=4 drops
    # that group entirely (documented bound)
    vals = ["a", "b", "c", "d", "e"]
    got = _ray_pairs(vals, df_cap=4)
    assert got == {}


def test_empty_and_null_values_ignored(ray_session):
    vals = ["", "abc", "abd"]
    assert _ray_pairs(vals) == {("abc", "abd"): 1}


def test_oracle_sql_matches_duckdb(ray_session):
    import duckdb

    from pdf2dom_ray.functions.fuzzyjoin import fuzzy_join_oracle_sql
    vals = [f"host{i % 40}" for i in range(200)]
    df = pd.DataFrame({"s": vals})
    con = duckdb.connect()
    con.register("vals_in", df)
    ora = con.execute(
        fuzzy_join_oracle_sql("SELECT s FROM vals_in", 1)).df()
    want = {(r.a, r.b): int(r.dist) for r in ora.itertuples()}
    assert _ray_pairs(vals) == want
    assert len(want) > 10
