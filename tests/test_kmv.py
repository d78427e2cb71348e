"""Bottom-k sampled quantiles (functions/kmv.py)."""
import duckdb
import pandas as pd
import pytest
import ray.data as rd

from pdf2dom_ray.functions.kmv import kmv_quantiles, kmv_oracle_sql


def test_kmv_matches_duckdb(ray_session, sf_dir):
    got = kmv_quantiles(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(kmv_oracle_sql()).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert got.value_cents.is_monotonic_increasing


def test_kmv_small_k(ray_session, sf_dir):
    got = kmv_quantiles(sf_dir, k=16).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(kmv_oracle_sql(k=16)).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))


def test_kmv_sample_tracks_exact(ray_session, sf_dir):
    """On 1000 events with k=256 the sampled median lands within a
    loose band of the exact median."""
    import numpy as np
    got = kmv_quantiles(sf_dir).to_pandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["value"])
    exact = np.floor(ev.value.to_numpy() * 100).astype("int64")
    lo, hi = np.percentile(exact, [30, 70])
    med = int(got.loc[got.pct == 50, "value_cents"].iloc[0])
    assert lo <= med <= hi


def test_kmv_bad_k(ray_session, sf_dir):
    with pytest.raises(ValueError):
        kmv_quantiles(sf_dir, k=0)


def test_grouped_kmv_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.functions.kmv import (grouped_kmv_oracle_sql,
                                           grouped_kmv_quantiles)
    got = grouped_kmv_quantiles(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(grouped_kmv_oracle_sql()).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    # every group has monotone quantiles
    for _, sub in got.groupby("event_type"):
        assert sub.sort_values("pct").value_cents \
            .is_monotonic_increasing
