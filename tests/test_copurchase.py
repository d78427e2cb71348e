"""Co-purchase pair mining (functions/copurchase.py)."""
import duckdb
import pandas as pd
import ray.data as rd

from pdf2dom_ray.functions.copurchase import (copurchase_pairs,
                                              copurchase_oracle_sql)


def _oracle(sf_dir, limit=20):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf_dir}/lineitem.parquet')")
    return con.execute(copurchase_oracle_sql(limit)).fetchdf()


def test_copurchase_matches_duckdb(ray_session, sf_dir):
    got = copurchase_pairs(sf_dir).to_pandas()
    want = _oracle(sf_dir)
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0
    assert (got.part_a < got.part_b).all()


def test_copurchase_partition_invariance(ray_session, sf_dir):
    a = copurchase_pairs(sf_dir, num_partitions=2).to_pandas()
    b = copurchase_pairs(sf_dir, num_partitions=5).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_copurchase_small_limit(ray_session, sf_dir):
    got = copurchase_pairs(sf_dir, limit=3).to_pandas()
    want = _oracle(sf_dir, limit=3)
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) == 3
