"""Time-decayed user value (functions/decay.py)."""
import duckdb
import pandas as pd
import pytest
import ray.data as rd

from pdf2dom_ray.functions.decay import (decayed_user_value,
                                         decayed_value_oracle_sql)


def _oracle(sf_dir, **kw):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    return con.execute(decayed_value_oracle_sql(**kw)).fetchdf()


def test_decay_matches_duckdb(ray_session, sf_dir):
    got = decayed_user_value(sf_dir).to_pandas()
    want = _oracle(sf_dir)
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0
    assert (got.decayed_cents <= got.raw_cents).all()


def test_decay_short_half_life(ray_session, sf_dir):
    got = decayed_user_value(sf_dir, half_life_days=30).to_pandas()
    want = _oracle(sf_dir, half_life_days=30)
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    long = decayed_user_value(sf_dir,
                              half_life_days=100000).to_pandas()
    # an effectively infinite half-life means no decay at all
    assert (long.decayed_cents == long.raw_cents).all()
    # a shorter half-life never increases the score
    m = got.merge(long, on="user_id")
    assert (m.decayed_cents_x <= m.decayed_cents_y).all()


def test_decay_partition_invariance(ray_session, sf_dir):
    a = decayed_user_value(sf_dir, num_partitions=2).to_pandas()
    b = decayed_user_value(sf_dir, num_partitions=7).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_decay_bad_half_life(ray_session, sf_dir):
    with pytest.raises(ValueError):
        decayed_user_value(sf_dir, half_life_days=0)


def test_decay_absent_type_empty(ray_session, sf_dir):
    got = decayed_user_value(sf_dir,
                             event_type="no_such").to_pandas()
    assert got.empty
