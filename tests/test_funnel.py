"""Ordered funnel: earliest-completion semantics, strict ordering,
partitioning invariance."""

import pyarrow as pa
import ray.data as rd

from pdf2dom_ray.functions.funnel import funnel_counts


def _events(rows):
    return rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string())}))


def _got(ds):
    return {r["step_name"]: r["n_users"] for r in ds.take_all()}


def test_funnel_basic_order(ray_session):
    rows = [
        (1, 1000, "view"), (1, 2000, "click"), (1, 3000, "purchase"),
        (2, 1000, "view"), (2, 2000, "click"),          # stops at click
        (3, 2000, "click"), (3, 3000, "view"),          # wrong order
        (4, 1000, "purchase"), (4, 2000, "view"),       # purchase first
    ]
    got = _got(funnel_counts(_events(rows),
                             ("view", "click", "purchase")))
    assert got == {"view": 4, "click": 2, "purchase": 1}


def test_funnel_strict_ts_ties_do_not_advance(ray_session):
    rows = [(1, 1000, "view"), (1, 1000, "click"),   # same ts: no click
            (2, 1000, "view"), (2, 1001, "click")]
    got = _got(funnel_counts(_events(rows), ("view", "click")))
    assert got == {"view": 2, "click": 1}


def test_funnel_earliest_completion_binding(ray_session):
    # user views at 1000 and 5000; clicks at 2000. Binding to the
    # EARLIEST view admits the click (later-view binding would not).
    rows = [(1, 1000, "view"), (1, 5000, "view"), (1, 2000, "click")]
    got = _got(funnel_counts(_events(rows), ("view", "click")))
    assert got == {"view": 1, "click": 1}


def test_funnel_partitioning_invariance(ray_session):
    rows = []
    for u in range(60):
        rows.append((u, 1000 + u, "view"))
        if u % 2 == 0:
            rows.append((u, 2000 + u, "click"))
        if u % 6 == 0:
            rows.append((u, 3000 + u, "purchase"))
    want = {"view": 60, "click": 30, "purchase": 10}
    for blocks in (1, 9):
        ds = _events(rows).repartition(blocks)
        assert _got(funnel_counts(
            ds, ("view", "click", "purchase"),
            num_partitions=5)) == want, blocks


def test_funnel_no_qualifying_events(ray_session):
    rows = [(1, 1000, "signup"), (2, 2000, "error")]
    got = _got(funnel_counts(_events(rows), ("view", "click")))
    assert got == {"view": 0, "click": 0}
