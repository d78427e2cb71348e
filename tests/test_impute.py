"""Group-median imputation (functions/impute.py)."""
import duckdb
import pandas as pd
import ray.data as rd

from pdf2dom_ray.functions.impute import (impute_group_median,
                                          impute_oracle_sql)


def test_impute_matches_duckdb(ray_session, sf_dir):
    got = impute_group_median(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(impute_oracle_sql()).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0
    assert (got.n_missing > 0).any()      # the mask actually fires
    assert (got.n_missing < got.n_rows).all()


def test_impute_fill_value_is_observed_median(ray_session, sf_dir):
    import hashlib

    import numpy as np
    got = impute_group_median(sf_dir).to_pandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type",
                                  "value"])
    miss = ev["event_id"].map(
        lambda i: hashlib.md5(f"null:{i}".encode()).hexdigest()
        < "2")
    obs = ev[~miss]
    for _, row in got.iterrows():
        vals = np.sort(np.floor(
            obs.loc[obs.event_type == row.event_type, "value"]
            .to_numpy() * 100).astype("int64"))
        k = (len(vals) + 1) // 2
        assert row.fill_cents == vals[k - 1]     # lower median
