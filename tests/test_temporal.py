"""Temporal joins (functions/temporal.py): as-of join, banded range
join, rolling windows, grouped top-k — partition-count invariance,
tie-breaking, and a pandas reference cross-check on the real tables.
"""

import numpy as np
import pandas as pd
import pytest

from pdf2dom_ray.functions.temporal import (
    asof_join_last_purchase, range_join_event_window,
    rolling_user_totals)
from pdf2dom_ray.functions.topk import grouped_topk


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def _events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["event_id", "user_id", "ts",
                                    "event_type", "value"])


def _ref_asof(ev: pd.DataFrame) -> pd.DataFrame:
    purchases = ev[ev["event_type"] == "purchase"]
    rows = []
    for r in ev.itertuples():
        prior = purchases[(purchases["user_id"] == r.user_id)
                          & (purchases["ts"] < r.ts)]
        if len(prior):
            best = prior.sort_values(["ts", "event_id"]).iloc[-1]
            rows.append((r.event_id, r.user_id, r.ts,
                         best["event_id"], best["ts"]))
    return pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                       "anchor_id", "anchor_ts"])


@pytest.mark.parametrize("parts", [1, 4, 16])
def test_asof_partition_invariant(ray_session, sf_dir, parts):
    got = _sorted(asof_join_last_purchase(
        sf_dir, num_partitions=parts).to_pandas())
    want = _sorted(_ref_asof(_events(sf_dir)))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _ref_range(ev: pd.DataFrame, days=7) -> pd.DataFrame:
    w = pd.Timedelta(days=days)
    anchors = ev[ev["event_type"] == "signup"]
    rows = []
    for a in anchors.itertuples():
        n = ((ev["user_id"] == a.user_id) & (ev["ts"] >= a.ts)
             & (ev["ts"] < a.ts + w)
             & (ev["event_id"] != a.event_id)).sum()
        if n:
            rows.append((a.event_id, int(n)))
    return pd.DataFrame(rows, columns=["anchor_id", "n_events"])


@pytest.mark.parametrize("parts", [1, 5, 16])
def test_range_join_partition_invariant(ray_session, sf_dir, parts):
    got = _sorted(range_join_event_window(
        sf_dir, num_partitions=parts).to_pandas())
    want = _sorted(_ref_range(_events(sf_dir)))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_range_join_window_straddles_buckets(ray_session, sf_dir):
    # windows that cross a bucket boundary must still count events in
    # the following bucket: widen the window so nearly every anchor's
    # window straddles, and cross-check the reference
    got = _sorted(range_join_event_window(
        sf_dir, window_days=11, num_partitions=4).to_pandas())
    want = _sorted(_ref_range(_events(sf_dir), days=11))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rolling_totals(ray_session, sf_dir):
    got = _sorted(rolling_user_totals(sf_dir).to_pandas())
    ev = _events(sf_dir).sort_values(["user_id", "ts", "event_id"])
    ev = ev.assign(
        __cents=np.floor(ev["value"].to_numpy() * 100.0).astype(np.int64))
    g = ev.groupby("user_id", sort=False)
    want = _sorted(pd.DataFrame({
        "event_id": ev["event_id"], "user_id": ev["user_id"],
        "ts": ev["ts"], "cum_n": g.cumcount() + 1,
        "cum_cents": g["__cents"].cumsum()}))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("blocks", [1, 3, 8])
def test_grouped_topk_block_invariant(ray_session, blocks):
    import ray.data as rd
    rows = [{"g": f"g{i % 3}", "v": (i * 7) % 13, "id": i}
            for i in range(30)]
    ds = rd.from_items(rows, override_num_blocks=blocks)
    out = grouped_topk(ds, "g", ["v", "id"], ascending=[False, True],
                       k=2).to_pandas()
    want = (pd.DataFrame(rows)
            .sort_values(["v", "id"], ascending=[False, True])
            .groupby("g", sort=False).head(2))
    want = want.assign(
        rank=want.groupby("g", sort=False).cumcount() + 1)
    pd.testing.assert_frame_equal(
        _sorted(out), _sorted(want), check_dtype=False)


def test_grouped_topk_rank_is_dense_per_group(ray_session, sf_dir):
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "doc_id", "n_chars"])
    out = grouped_topk(ds, "lang", ["n_chars", "doc_id"],
                       ascending=[False, True], k=3).to_pandas()
    for _, g in out.groupby("lang"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
        assert (g.sort_values("rank")["n_chars"].diff().dropna()
                <= 0).all()


def test_event_transitions_matches_pandas_reference(ray_session, sf_dir):
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from pdf2dom_ray.functions.temporal import event_transitions

    df = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "ts",
                                "event_type"]).to_pandas()
    df = df.sort_values(["user_id", "ts", "event_id"])
    nxt = df.groupby("user_id")["event_type"].shift(-1)
    ref = (pd.DataFrame({"from_type": df["event_type"], "to_type": nxt})
           .dropna().groupby(["from_type", "to_type"]).size())

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])
    for blocks in (None, 7):
        d = ds if blocks is None else ds.repartition(blocks)
        got = {(r["from_type"], r["to_type"]): r["n"]
               for r in event_transitions(d, num_partitions=5).take_all()}
        assert got == ref.to_dict(), blocks


def test_event_transitions_tie_break_on_event_id(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pdf2dom_ray.functions.temporal import event_transitions
    # same-ts events order by event_id: a(1) -> b(2) -> c(3)
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([3, 1, 2], pa.int64()),
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "ts": pa.array([1000, 1000, 1000], pa.timestamp("us")),
        "event_type": pa.array(["c", "a", "b"], pa.string())}))
    got = {(r["from_type"], r["to_type"]): r["n"]
           for r in event_transitions(ds).take_all()}
    assert got == {("a", "b"): 1, ("b", "c"): 1}


def test_inter_event_gaps_matches_duckdb(ray_session, sf_dir):
    import duckdb

    from pdf2dom_ray.functions.temporal import inter_event_gaps

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    ref = con.execute("""
        WITH g AS (
          SELECT user_id,
                 date_diff('microsecond', ts,
                           lead(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)) AS gap
          FROM events)
        SELECT user_id, count(gap) AS n_gaps, sum(gap) AS total_gap_us,
               max(gap) AS max_gap_us, min(gap) AS min_gap_us
        FROM g WHERE gap IS NOT NULL GROUP BY user_id
        ORDER BY user_id""").fetchdf()

    got = inter_event_gaps(sf_dir, num_partitions=5).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert got["user_id"].tolist() == ref["user_id"].tolist()
    for c in ("n_gaps", "total_gap_us", "max_gap_us", "min_gap_us"):
        assert got[c].astype("int64").tolist() == \
            ref[c].astype("int64").tolist(), c


def test_inter_event_gaps_single_event_user_dropped(ray_session,
                                                    tmp_path):
    import pandas as pd

    from pdf2dom_ray.functions.temporal import inter_event_gaps

    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "user_id": [10, 20, 20],
        "ts": pd.to_datetime([1_000_000, 5_000_000, 2_000_000],
                             unit="us"),
    })
    df.to_parquet(tmp_path / "events.parquet")
    got = inter_event_gaps(str(tmp_path)).to_pandas()
    # user 10 has one event -> no gaps row; user 20 gap = 3s
    assert got["user_id"].tolist() == [20]
    assert got["n_gaps"].tolist() == [1]
    assert got["total_gap_us"].tolist() == [3_000_000]


def test_session_paths_matches_duckdb(ray_session, sf_dir):
    import duckdb

    from pdf2dom_ray.pipelines.metrics import session_paths

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    ref = con.execute("""
        WITH g AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN ts - lag(ts) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id)
                      > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns
          FROM events),
        s AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                  AS sid FROM g),
        p AS (SELECT user_id, sid,
                     string_agg(event_type, '>'
                                ORDER BY ts, event_id) AS path
              FROM s GROUP BY user_id, sid)
        SELECT path, count(*) AS n FROM p GROUP BY path
        ORDER BY n DESC, path LIMIT 20""").fetchdf()

    got = session_paths(sf_dir).to_pandas()
    assert got["path"].tolist() == ref["path"].tolist()
    assert got["n_sessions"].astype(int).tolist() == \
        ref["n"].astype(int).tolist()


def test_session_paths_gap_boundary(ray_session, tmp_path):
    import pandas as pd

    from pdf2dom_ray.pipelines.metrics import session_paths

    # user 1: a>b in one session, then exactly-30min gap (NOT a new
    # session: rule is strictly greater), then 30min+1us gap -> new
    base = 1_000_000_000
    m30 = 30 * 60 * 1_000_000
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1],
        "event_id": [1, 2, 3, 4],
        "ts": pd.to_datetime([base, base + 1_000_000,
                              base + 1_000_000 + m30,
                              base + 1_000_000 + 2 * m30 + 1],
                             unit="us"),
        "event_type": ["a", "b", "c", "d"],
    })
    df.to_parquet(tmp_path / "events.parquet")
    got = session_paths(str(tmp_path)).to_pandas()
    assert sorted(got["path"].tolist()) == ["a>b>c", "d"]


def test_interval_coverage_matches_duckdb(ray_session, sf_dir):
    import duckdb

    from pdf2dom_ray.functions.temporal import (interval_coverage,
                                                interval_coverage_sql)
    got = interval_coverage(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(interval_coverage_sql()).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    # coverage bounded by n_events*window and >= window per interval
    assert (got.covered_us >= got.n_intervals * 1).all()


def test_interval_coverage_window_monotone(ray_session, sf_dir):
    from pdf2dom_ray.functions.temporal import interval_coverage
    small = interval_coverage(sf_dir, window_s=60).to_pandas()
    big = interval_coverage(sf_dir, window_s=600).to_pandas()
    m = small.merge(big, on="user_id", suffixes=("_s", "_b"))
    assert (m.covered_us_s <= m.covered_us_b).all()
    assert (m.n_intervals_s >= m.n_intervals_b).all()


def test_interval_coverage_partition_invariance(ray_session,
                                                sf_dir):
    from pdf2dom_ray.functions.temporal import interval_coverage
    a = interval_coverage(sf_dir, num_partitions=2).to_pandas()
    b = interval_coverage(sf_dir, num_partitions=7).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_peak_concurrency_matches_duckdb(ray_session, sf_dir):
    import duckdb

    from pdf2dom_ray.functions.temporal import (peak_concurrency,
                                                peak_concurrency_sql)
    got = peak_concurrency(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(peak_concurrency_sql()).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert int(got.peak[0]) >= 1


def test_peak_concurrency_bucket_invariance(ray_session, sf_dir):
    from pdf2dom_ray.functions.temporal import peak_concurrency
    a = peak_concurrency(sf_dir, bucket_s=3600).to_pandas()
    b = peak_concurrency(sf_dir, bucket_s=97).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_peak_concurrency_window_monotone(ray_session, sf_dir):
    from pdf2dom_ray.functions.temporal import peak_concurrency
    small = int(peak_concurrency(sf_dir,
                                 window_s=10).to_pandas().peak[0])
    big = int(peak_concurrency(sf_dir,
                               window_s=3600).to_pandas().peak[0])
    assert small <= big


def test_stream_disorder_matches_duckdb(ray_session, sf_dir):
    import duckdb

    from pdf2dom_ray.functions.temporal import (stream_disorder,
                                                stream_disorder_sql)
    got = stream_disorder(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(stream_disorder_sql()).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))


def test_stream_disorder_bucket_invariance(ray_session, sf_dir):
    from pdf2dom_ray.functions.temporal import stream_disorder
    # tiny buckets maximize cross-bucket carry interaction — the
    # double-count hazard the record-only histogram fix closed
    a = stream_disorder(sf_dir, bucket=4096).to_pandas()
    b = stream_disorder(sf_dir, bucket=5).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
