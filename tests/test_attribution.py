"""Last-touch attribution (functions/attribution.py)."""
import duckdb
import pandas as pd
import ray.data as rd

from pdf2dom_ray.functions.attribution import (last_touch_attribution,
                                               last_touch_oracle_sql)


def _oracle(sf_dir, **kw):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    return con.execute(last_touch_oracle_sql(**kw)).fetchdf()


def test_attribution_matches_duckdb(ray_session, sf_dir):
    got = last_touch_attribution(sf_dir).to_pandas()
    want = _oracle(sf_dir)
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0 and (got.attributed_cents > 0).all()


def test_attribution_other_touch_type(ray_session, sf_dir):
    got = last_touch_attribution(sf_dir,
                                 touch_type="view").to_pandas()
    want = _oracle(sf_dir, touch_type="view")
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))


def test_attribution_partition_invariance(ray_session, sf_dir):
    a = last_touch_attribution(sf_dir, num_partitions=2).to_pandas()
    b = last_touch_attribution(sf_dir, num_partitions=7).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_attribution_no_touches(ray_session, sf_dir):
    got = last_touch_attribution(
        sf_dir, touch_type="no_such_type").to_pandas()
    assert got.empty
