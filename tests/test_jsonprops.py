"""JSON props field histogram (functions/jsonprops.py)."""
import duckdb
import pandas as pd
import pytest
import ray.data as rd

from pdf2dom_ray.functions.jsonprops import (
    props_field_histogram, props_field_histogram_sql)


def test_props_histogram_matches_duckdb(ray_session, sf_dir):
    got = props_field_histogram(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(props_field_histogram_sql()).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0


def test_props_histogram_width_1(ray_session, sf_dir):
    got = props_field_histogram(sf_dir, bucket_width=1).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(
        props_field_histogram_sql(bucket_width=1)).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    # width-1 buckets: sum is value times count
    assert (got.sum_value == got.bucket_lo * got.n_events).all()


def test_props_histogram_absent_field(ray_session, sf_dir):
    got = props_field_histogram(sf_dir,
                                field="nope").to_pandas()
    assert got.empty


def test_props_histogram_bad_width(ray_session, sf_dir):
    with pytest.raises(ValueError):
        props_field_histogram(sf_dir, bucket_width=0)
