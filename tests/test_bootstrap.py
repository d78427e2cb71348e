"""Deterministic Poisson bootstrap (functions/bootstrap.py)."""
import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pdf2dom_ray.functions.bootstrap import (bootstrap_oracle_sql,
                                             bootstrap_totals)


def test_bootstrap_matches_duckdb(ray_session, sf_dir):
    got = bootstrap_totals(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(bootstrap_oracle_sql()).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) == 16


def test_bootstrap_replicates_bracket_truth(ray_session, sf_dir):
    """Poisson(1) weights average to 1: the replicate totals spread
    around the plain total and n_eff around n."""
    got = bootstrap_totals(sf_dir).to_pandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["value"])
    truth = int(np.floor(ev.value.to_numpy() * 100).sum())
    n = len(ev)
    assert got.total_cents.min() <= truth <= got.total_cents.max()
    assert abs(got.n_eff.mean() - n) < 0.2 * n
    # distinct replicates actually differ
    assert got.total_cents.nunique() > 1


def test_bootstrap_bad_replicates(ray_session, sf_dir):
    with pytest.raises(ValueError):
        bootstrap_totals(sf_dir, replicates=0)
