"""latest_capture (CDX-style snapshot dedup): argmax semantics,
combiner correctness across block splits, tie-breaking, payload
fidelity, and the synth two-snapshot E2E.
"""

import pandas as pd
import pytest

from pdf2dom_ray.functions.crawl import latest_capture

ROWS = [
    {"url": "a", "warc_ts": 10, "version": 0, "payload": b"a0"},
    {"url": "a", "warc_ts": 30, "version": 2, "payload": b"a2"},
    {"url": "a", "warc_ts": 20, "version": 1, "payload": b"a1"},
    {"url": "b", "warc_ts": 5, "version": 0, "payload": b"b0"},
    {"url": "c", "warc_ts": 7, "version": 0, "payload": b"c0"},
    {"url": "c", "warc_ts": 7, "version": 1, "payload": b"c1"},  # ts tie
]

EXPECT = {"a": (30, 2, b"a2", 3), "b": (5, 0, b"b0", 1),
          "c": (7, 1, b"c1", 2)}


@pytest.mark.parametrize("blocks", [1, 2, 6])
def test_latest_capture_block_invariant(ray_session, blocks):
    import ray.data as rd
    ds = rd.from_items(ROWS, override_num_blocks=blocks)
    out = latest_capture(ds, tiebreak="version").to_pandas()
    got = {r.url: (r.warc_ts, r.version, r.payload, r.n_captures)
           for r in out.itertuples()}
    assert got == EXPECT


def test_latest_capture_synth_e2e(ray_session, sf_dir):
    import pyarrow.parquet as pq

    from pdf2dom_ray.pipelines.html_extract import synth_snapshots
    from pdf2dom_ray.synth.htmlgen import doc_to_html

    out = latest_capture(synth_snapshots(sf_dir),
                         tiebreak="version").to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    assert len(out) == len(docs)
    by_url = {r.url: r for r in out.itertuples()}
    for d, t in zip(docs.doc_id, docs.text):
        r = by_url[f"https://docs.synth.test/{d}"]
        recrawled = d % 3 == 0
        assert r.version == (1 if recrawled else 0)
        assert r.n_captures == (2 if recrawled else 1)
        assert bytes(r.html) == doc_to_html(d, t)



def _snap_ds(rows):
    import pyarrow as pa
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "fp": pa.array([r[1] for r in rows], pa.string())}))


def test_snapshot_diff_all_classes(ray_session):
    from pdf2dom_ray.functions.crawl import snapshot_diff
    old = _snap_ds([("a", "1"), ("b", "2"), ("c", "3")])
    new = _snap_ds([("b", "2"), ("c", "X"), ("d", "4")])
    got = {r["url"]: r["status"]
           for r in snapshot_diff(old, new).take_all()}
    assert got == {"a": "removed", "b": "same",
                   "c": "changed", "d": "added"}


def test_snapshot_diff_empty_sides(ray_session):
    from pdf2dom_ray.functions.crawl import snapshot_diff
    rows = [("a", "1"), ("b", "2")]
    empty = _snap_ds([])
    got_new = {r["url"]: r["status"]
               for r in snapshot_diff(empty, _snap_ds(rows)).take_all()}
    assert got_new == {"a": "added", "b": "added"}
    got_old = {r["url"]: r["status"]
               for r in snapshot_diff(_snap_ds(rows), empty).take_all()}
    assert got_old == {"a": "removed", "b": "removed"}
    assert snapshot_diff(empty, empty).count() == 0


def test_snapshot_diff_partitioning_invariant(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.crawl import snapshot_diff
    old = [(f"u{i}", f"f{i}") for i in range(40)]
    new = [(f"u{i}", f"f{i+1}" if i % 4 == 0 else f"f{i}")
           for i in range(5, 45)]
    want = None
    for blocks in (1, 7):
        o = _snap_ds(old).repartition(blocks)
        n = _snap_ds(new).repartition(blocks)
        got = sorted((r["url"], r["status"])
                     for r in snapshot_diff(o, n).take_all())
        if want is None:
            want = got
        assert got == want, blocks
    assert ("u0", "removed") in want and ("u44", "added") in want
    assert ("u8", "changed") in want and ("u6", "same") in want
