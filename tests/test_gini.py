"""Per-group Gini (functions/gini.py)."""
import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from pdf2dom_ray.functions.gini import gini_oracle_sql, group_gini


def test_gini_matches_duckdb(ray_session, sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "n_chars"])
    got = group_gini(ds).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(gini_oracle_sql(
        "SELECT source, n_chars FROM documents")).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert (got.gini_ppm.between(0, 1_000_000)).all()


def test_gini_hand_cases(ray_session):
    # uniform values -> 0; extreme concentration -> (n-1)/n
    rows = [{"source": "u", "n_chars": 5} for _ in range(4)]
    rows += [{"source": "c", "n_chars": 0} for _ in range(3)]
    rows += [{"source": "c", "n_chars": 100}]
    got = group_gini(rd.from_items(rows, override_num_blocks=4)).to_pandas() \
        .set_index("key")
    assert int(got.loc["u", "gini_ppm"]) == 0
    assert int(got.loc["c", "gini_ppm"]) == 750_000   # (n-1)/n


def test_gini_matches_pairwise_definition(ray_session):
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    rows = [{"source": "x", "n_chars": v} for v in vals]
    got = group_gini(rd.from_items(rows, override_num_blocks=4)).to_pandas()
    x = np.array(vals)
    g = np.abs(x[:, None] - x[None, :]).sum() / (2 * len(x)**2
                                                 * x.mean())
    assert int(got.gini_ppm[0]) == int(1_000_000 * g)
