"""Grouped OLS trend moments: hand reference, slope recovery, DuckDB
oracle."""

import datetime

import numpy as np


def _ds(rows):
    import ray.data as rd
    return rd.from_items(rows, override_num_blocks=4)


def _ref(rows):
    import collections
    series = collections.Counter()
    for r in rows:
        hour = int(r["ts"].replace(tzinfo=datetime.timezone.utc)
                   .timestamp()) // 3600
        series[(r["event_type"], hour)] += 1
    out = {}
    by_key = collections.defaultdict(list)
    for (k, h), c in series.items():
        by_key[k].append((h, c))
    for k, pts in by_key.items():
        h0 = min(h for h, _ in pts)
        x = np.array([h - h0 for h, _ in pts], dtype=np.int64)
        y = np.array([c for _, c in pts], dtype=np.int64)
        out[k] = (len(x), int(x.sum()), int(y.sum()),
                  int((x * y).sum()), int((x * x).sum()))
    return out


def test_trend_matches_reference(ray_session):
    from pdf2dom_ray.functions.trend import grouped_trend
    rng = np.random.RandomState(67)
    base = datetime.datetime(2024, 3, 1)
    rows = [{"event_type": f"t{rng.randint(3)}",
             "ts": base + datetime.timedelta(
                 hours=int(rng.randint(0, 60)),
                 minutes=int(rng.randint(60)))}
            for _ in range(300)]
    got = {r["key"]: (r["n"], r["sx"], r["sy"], r["sxy"], r["sxx"])
           for r in grouped_trend(_ds(rows)).take_all()}
    assert got == _ref(rows)


def test_trend_recovers_linear_slope(ray_session):
    from pdf2dom_ray.functions.trend import grouped_trend
    base = datetime.datetime(2024, 3, 1)
    # y = 2x + 1 events in hour x → slope exactly 2
    rows = [{"event_type": "up", "ts": base + datetime.timedelta(
        hours=x, minutes=m)} for x in range(10)
        for m in range(2 * x + 1)]
    r = grouped_trend(_ds(rows)).take_all()[0]
    n, sx, sy, sxy, sxx = (r[c] for c in ("n", "sx", "sy", "sxy",
                                          "sxx"))
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    assert num == 2 * den           # exact rational slope = 2
    assert (n, sx) == (10, 45)


def test_trend_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.trend import (grouped_trend,
                                             trend_oracle_sql)
    rng = np.random.RandomState(71)
    base = datetime.datetime(2024, 5, 1)
    rows = [{"event_type": f"t{rng.randint(4)}",
             "ts": base + datetime.timedelta(
                 hours=int(rng.randint(0, 48)),
                 seconds=int(rng.randint(3600)))}
            for _ in range(250)]
    got = sorted(tuple(r[c] for c in ("key", "n", "sx", "sy", "sxy",
                                      "sxx"))
                 for r in grouped_trend(_ds(rows)).take_all())
    vals = " UNION ALL ".join(
        f"SELECT '{r['event_type']}' AS event_type, "
        f"TIMESTAMP '{r['ts']}' AS ts" for r in rows)
    want = sorted(map(tuple, duckdb.sql(trend_oracle_sql(vals))
                      .fetchall()))
    assert got == want


def test_trend_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.trend import grouped_trend
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us"))}))
    assert grouped_trend(ds).take_all() == []
