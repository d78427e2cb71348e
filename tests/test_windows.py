

def test_hopping_distinct_matches_duckdb(ray_session, sf_dir):
    import duckdb

    from pdf2dom_ray.functions.windows import (hopping_distinct_sql,
                                               hopping_distinct_users)
    got = hopping_distinct_users(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute(hopping_distinct_sql()).fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0


def test_hopping_distinct_bounded_by_volume(ray_session, sf_dir):
    from pdf2dom_ray.functions.windows import (hopping_distinct_users,
                                               hopping_window_volume)
    d = hopping_distinct_users(sf_dir).to_pandas()
    v = hopping_window_volume(sf_dir).to_pandas()
    m = d.merge(v, on="window_start")
    assert len(m) == len(d) == len(v)
    # distinct users never exceed raw event count per window
    assert (m.n_users <= m.n).all()


def test_hopping_distinct_partition_invariance(ray_session, sf_dir):
    from pdf2dom_ray.functions.windows import hopping_distinct_users
    a = hopping_distinct_users(sf_dir, num_partitions=2).to_pandas()
    b = hopping_distinct_users(sf_dir, num_partitions=5).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_bounce_rate_matches_duckdb(ray_session, sf_dir):
    import duckdb

    from pdf2dom_ray.pipelines.metrics import bounce_rate
    got = bounce_rate(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = con.execute("""
        WITH g AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS ns
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) sid
              FROM g),
        per AS (SELECT user_id, sid,
                       FIRST(event_type ORDER BY ts, event_id)
                           AS entry_type, COUNT(*) AS n
                FROM s GROUP BY 1, 2)
        SELECT entry_type, CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bounces,
               CAST((1000000 * SUM(CASE WHEN n = 1 THEN 1 ELSE 0
                                   END)) // GREATEST(COUNT(*), 1)
                    AS BIGINT) AS bounce_ppm
        FROM per GROUP BY 1 ORDER BY 1""").fetchdf()
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0


def test_bounce_rate_consistent_with_sessionize(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.metrics import bounce_rate, sessionize
    br = bounce_rate(sf_dir).to_pandas()
    sz = sessionize(sf_dir).to_pandas()
    # total sessions must agree between the two views of one rule
    assert br.n_sessions.sum() == sz.n_sessions.sum()
    assert (br.n_bounces <= br.n_sessions).all()


def test_bounce_rate_partition_invariance(ray_session, sf_dir):
    from pdf2dom_ray.pipelines.metrics import bounce_rate
    a = bounce_rate(sf_dir, num_partitions=2).to_pandas()
    b = bounce_rate(sf_dir, num_partitions=7).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_rolling_weekly_matches_pandas(ray_session, sf_dir):
    import numpy as np
    import pandas as pd
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["rolling_weekly_revenue"](sf_dir).to_pandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    p = ev[ev.event_type == "purchase"].copy()
    p["day"] = p["ts"].dt.floor("D")
    p["cents"] = np.floor(p["value"].to_numpy() * 100).astype(
        "int64")
    daily = p.groupby("day")["cents"].sum() \
        .asfreq("D", fill_value=0)
    roll = daily.rolling(7, min_periods=1).sum().astype("int64")
    m = got.set_index("day")
    assert (m["day_cents"] == daily[daily > 0]).all() or \
        m["day_cents"].equals(daily.loc[m.index].astype("int64"))
    assert m["rolling_7d_cents"].equals(roll.loc[m.index])
    assert (got.rolling_7d_cents >= got.day_cents).all()


def test_session_duration_consistent_with_sessionize(ray_session,
                                                     sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    from pdf2dom_ray.pipelines.metrics import sessionize
    got = E.queries()["session_duration_stats"](sf_dir).to_pandas()
    sz = sessionize(sf_dir).to_pandas()
    assert int(got.n_sessions[0]) == sz.n_sessions.sum()
    assert 0 <= int(got.median_s[0]) <= int(got.p90_s[0])
    # a session is bounded by the 30-min gap times its events
    assert int(got.p90_s[0]) <= 30 * 60 * int(sz.n_events.max())
