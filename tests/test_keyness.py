"""Source keyness (ppm lift): hand case, both attach paths, DuckDB
oracle, noise floor."""

import pytest

ROWS = [
    {"source": "a", "text": "x y z x jargon jargon jargon"},
    {"source": "a", "text": "x w common common"},
    {"source": "b", "text": "x x y common common spamword spamword"},
    {"source": "c", "text": "q q q common x y"},
]


def _ds(rows):
    import ray.data as rd
    return rd.from_items(rows, override_num_blocks=4)


def _sql(rows, **kw):
    import duckdb
    from pdf2dom_ray.functions.keyness import keyness_oracle_sql
    vals = " UNION ALL ".join(
        f"SELECT '{r['source']}' AS source, '{r['text']}' AS text"
        for r in rows)
    return sorted(map(tuple,
                      duckdb.sql(keyness_oracle_sql(vals, **kw))
                      .fetchall()))


def _got(rows, **kw):
    from pdf2dom_ray.functions.keyness import source_keyness
    return sorted((r["source"], r["token"], r["c"], r["lift_ppm"],
                   r["rank"])
                  for r in source_keyness(_ds(rows), **kw).take_all())


@pytest.mark.parametrize("limit", [2_000_000, 0])
def test_keyness_matches_oracle_both_paths(ray_session, limit):
    got = _got(ROWS, k=3, broadcast_limit=limit)
    assert got == _sql(ROWS, k=3)
    # exclusive jargon dominates source a's keyness
    assert ("a", "jargon", 3, 3545454, 1) in got


def test_keyness_min_count_floor(ray_session):
    got = _got(ROWS, k=5, min_count=3)
    assert got == _sql(ROWS, k=5, min_count=3)
    assert all(c >= 3 for _, _, c, _, _ in got)


def test_keyness_k_bound_and_rank(ray_session):
    got = _got(ROWS, k=1)
    assert got == _sql(ROWS, k=1)
    assert sorted(s for s, *_ in got) == ["a", "b", "c"]
    assert all(r == 1 for *_, r in got)


def test_keyness_empty_input(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.keyness import source_keyness
    ds = rd.from_arrow(pa.table({"source": pa.array([], pa.string()),
                                 "text": pa.array([], pa.string())}))
    assert source_keyness(ds).take_all() == []
