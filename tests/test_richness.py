"""Good–Turing / Chao1 vocabulary richness (functions/richness.py)."""
import duckdb
import pandas as pd
import pytest
import ray.data as rd

from pdf2dom_ray.functions.richness import (vocab_richness,
                                            vocab_richness_oracle_sql)


def _oracle(sf_dir, ngram):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    return con.execute(vocab_richness_oracle_sql(ngram=ngram)) \
        .fetchdf()


@pytest.mark.parametrize("ngram", [1, 2])
def test_richness_matches_duckdb(ray_session, sf_dir, ngram):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    got = vocab_richness(ds, ngram=ngram).to_pandas()
    want = _oracle(sf_dir, ngram)
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert int(got.n_tokens[0]) > 0


def test_richness_bigrams_nondegenerate(ray_session, sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    got = vocab_richness(ds, ngram=2).to_pandas()
    # the synthetic corpus has singleton bigrams: the estimators
    # actually estimate something
    assert int(got.f1[0]) > 0
    assert int(got.chao1[0]) > int(got.vocab[0])
    assert 0 < int(got.p0_ppm[0]) < 1_000_000


def test_richness_hand_case(ray_session):
    # "a b a" ⇒ unigrams: a×2, b×1 → N=3 V=2 f1=1 f2=1
    ds = rd.from_items([{"text": "a b a"}], override_num_blocks=4)
    got = vocab_richness(ds, ngram=1).to_pandas()
    assert got.values.tolist() == [[3, 2, 1, 1,
                                    (1_000_000 * 1) // 3,
                                    2 + 0]]
    # bigrams: "a b"×1, "b a"×1 → N=2 V=2 f1=2 f2=0 chao1=2+2*1//2=3
    got2 = vocab_richness(ds, ngram=2).to_pandas()
    assert got2.values.tolist() == [[2, 2, 2, 0, 1_000_000, 3]]


def test_richness_empty_and_single_token_docs(ray_session):
    ds = rd.from_items([{"text": ""}, {"text": "x"},
                        {"text": "  "}], override_num_blocks=4)
    got = vocab_richness(ds, ngram=2).to_pandas()
    # no within-doc bigram exists anywhere
    assert int(got.n_tokens[0]) == 0
    assert int(got.chao1[0]) == 0


def _ttr_oracle(sf_dir):
    from pdf2dom_ray.functions.richness import source_ttr_oracle_sql
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    return con.execute(source_ttr_oracle_sql()).fetchdf()


def test_source_ttr_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.functions.richness import source_ttr
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    got = source_ttr(ds).to_pandas()
    want = _ttr_oracle(sf_dir)
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0
    assert (got.ttr_ppm <= 1_000_000).all()


def test_source_ttr_partition_invariance(ray_session, sf_dir):
    from pdf2dom_ray.functions.richness import source_ttr
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    a = source_ttr(ds, num_partitions=2).to_pandas()
    b = source_ttr(ds, num_partitions=7).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_source_ttr_hand_case(ray_session):
    from pdf2dom_ray.functions.richness import source_ttr
    ds = rd.from_items([{"source": "s1", "text": "a b a"},
                        {"source": "s2", "text": "x"}], override_num_blocks=4)
    got = source_ttr(ds).to_pandas()
    assert got.values.tolist() == [
        ["s1", 3, 2, (1_000_000 * 2) // 3],
        ["s2", 1, 1, 1_000_000]]
