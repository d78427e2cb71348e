"""RFM segmentation (functions/rfm.py)."""
import duckdb
import pandas as pd
import ray.data as rd

from pdf2dom_ray.functions.rfm import rfm_segments, rfm_oracle_sql


def _oracle(sf_dir, **kw):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    return con.execute(rfm_oracle_sql(**kw)).fetchdf()


def test_rfm_matches_duckdb(ray_session, sf_dir):
    got = rfm_segments(sf_dir).to_pandas()
    want = _oracle(sf_dir)
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0
    assert got.r_score.between(1, 5).all()


def test_rfm_k3(ray_session, sf_dir):
    got = rfm_segments(sf_dir, k=3).to_pandas()
    want = _oracle(sf_dir, k=3)
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))


def test_rfm_partition_invariance(ray_session, sf_dir):
    a = rfm_segments(sf_dir, num_partitions=2).to_pandas()
    b = rfm_segments(sf_dir, num_partitions=6).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_rfm_distributed_path_matches_driver_path(ray_session,
                                                  sf_dir):
    a = rfm_segments(sf_dir).to_pandas()                # driver path
    b = rfm_segments(sf_dir, driver_limit=0).to_pandas()  # BSP path
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_rfm_absent_event_type(ray_session, sf_dir):
    got = rfm_segments(sf_dir,
                       event_type="no_such_type").to_pandas()
    assert got.empty
