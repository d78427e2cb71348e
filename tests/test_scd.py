"""SCD2 capture history (functions/scd.py): hand case + DuckDB LEAD
twin over the two-snapshot synth crawl."""

import duckdb
import pandas as pd
import ray.data as rd

from pdf2dom_ray.functions.scd import capture_history


def test_hand_case(ray_session):
    rows = [
        {"url": "a", "warc_ts": pd.Timestamp("2024-01-01"),
         "version": 0},
        {"url": "a", "warc_ts": pd.Timestamp("2024-01-02"),
         "version": 1},
        {"url": "b", "warc_ts": pd.Timestamp("2024-01-05"),
         "version": 0},
    ]
    got = capture_history(rd.from_pandas(pd.DataFrame(rows))) \
        .to_pandas().sort_values(["url", "version"]) \
        .reset_index(drop=True)
    assert got["valid_from"].tolist() == [
        pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02"),
        pd.Timestamp("2024-01-05")]
    assert got["valid_to"].tolist()[0] == pd.Timestamp("2024-01-02")
    assert pd.isna(got["valid_to"].iloc[1])
    assert pd.isna(got["valid_to"].iloc[2])
    assert got["is_current"].tolist() == [False, True, True]


def test_matches_duckdb(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.html_extract import synth_snapshots
    snaps = synth_snapshots(sf_dir)
    base = snaps.select_columns(["url", "warc_ts", "version"]) \
        .to_pandas()
    got = capture_history(synth_snapshots(sf_dir)).to_pandas()
    con = duckdb.connect()
    con.register("snaps", base)
    want = con.execute("""
        SELECT url, version, warc_ts AS valid_from,
               LEAD(warc_ts) OVER w AS valid_to,
               (LEAD(warc_ts) OVER w IS NULL) AS is_current
        FROM snaps
        WINDOW w AS (PARTITION BY url ORDER BY warc_ts, version)
    """).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(["url", "version"]) \
        .reset_index(drop=True)
    b = want[cols].sort_values(["url", "version"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert a["is_current"].sum() == len(a["url"].unique())
