"""Pairwise total-variation divergence: hand reference, zero-pair
grid, DuckDB oracle."""

import collections

import pyarrow as pa

ROWS = [
    {"source": "a", "text": "x y z x"},
    {"source": "a", "text": "x w"},
    {"source": "b", "text": "x x y"},
    {"source": "c", "text": "q q q"},
    {"source": "d", "text": "x y z x x w"},   # same dist as source a
]

SCALE = 1_000_000_000


def _ref(rows, scale=SCALE):
    cnt, tot = collections.defaultdict(collections.Counter), \
        collections.Counter()
    for r in rows:
        for t in r["text"].split(" "):
            cnt[r["source"]][t] += 1
            tot[r["source"]] += 1
    srcs = sorted(cnt)
    out = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            toks = set(cnt[a]) | set(cnt[b])
            s = sum(abs(scale * cnt[a][t] // tot[a]
                        - scale * cnt[b][t] // tot[b]) for t in toks)
            out[(a, b)] = s // 2
    return out


def _ds(rows):
    import ray.data as rd
    return rd.from_items(rows, override_num_blocks=4)


def test_divergence_matches_reference(ray_session):
    from pdf2dom_ray.functions.divergence import source_tv_divergence
    got = {(r["source_a"], r["source_b"]): r["tv_ppb"]
           for r in source_tv_divergence(_ds(ROWS)).take_all()}
    assert got == _ref(ROWS)
    assert got[("a", "d")] == 0          # identical distributions
    assert got[("a", "c")] == SCALE - 1  # disjoint vocab → TV ≈ 1


def test_divergence_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.divergence import (source_tv_divergence,
                                                  source_tv_oracle_sql)
    got = sorted((r["source_a"], r["source_b"], r["tv_ppb"]) for r in
                 source_tv_divergence(_ds(ROWS)).take_all())
    vals = " UNION ALL ".join(
        f"SELECT '{r['source']}' AS source, '{r['text']}' AS text"
        for r in ROWS)
    want = sorted(map(tuple,
                      duckdb.sql(source_tv_oracle_sql(vals))
                      .fetchall()))
    assert got == want


def test_divergence_distributed_path_identical(ray_session):
    from pdf2dom_ray.functions.divergence import source_tv_divergence
    got = {(r["source_a"], r["source_b"]): r["tv_ppb"]
           for r in source_tv_divergence(_ds(ROWS),
                                         driver_limit=0).take_all()}
    assert got == _ref(ROWS)


def test_divergence_single_source_is_empty(ray_session):
    from pdf2dom_ray.functions.divergence import source_tv_divergence
    got = source_tv_divergence(
        _ds([{"source": "only", "text": "x y"}])).take_all()
    assert got == []


def test_divergence_scale_param(ray_session):
    from pdf2dom_ray.functions.divergence import source_tv_divergence
    got = {(r["source_a"], r["source_b"]): r["tv_ppb"]
           for r in source_tv_divergence(_ds(ROWS),
                                         scale=1_000_000).take_all()}
    assert got == _ref(ROWS, scale=1_000_000)
