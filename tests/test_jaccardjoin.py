"""Exact Jaccard self-join: brute all-pairs ground truth (the no-
false-negatives guarantee prefix filtering must uphold), both df
attach paths, threshold sweep, DuckDB oracle."""

import numpy as np
import pytest


def _mk_rows(n_extra=15, seed=59):
    rng = np.random.RandomState(seed)
    words = [f"w{i}" for i in range(120)]

    def mk(n, r):
        return " ".join(words[r.randint(0, 120)] for _ in range(n))

    base = mk(50, np.random.RandomState(1))
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},                         # dup
        {"doc_id": 2, "text": base + " tail extra words added"},
        {"doc_id": 3, "text": " ".join(base.split()[:35])},  # subset
    ]
    rows += [{"doc_id": 4 + i, "text": mk(45, rng)}
             for i in range(n_extra)]
    return rows


def _brute(rows, k, tau_pct):
    def grams(text):
        toks = [w for w in text.split(" ") if w]
        return {" ".join(toks[i:i + k])
                for i in range(len(toks) - k + 1)}

    sets = {r["doc_id"]: grams(r["text"]) for r in rows}
    out = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if 100 * inter >= tau_pct * uni:
                out.append((a, b, inter, uni,
                            1_000_000 * inter // uni))
    return sorted(out)


def _got(rows, **kw):
    import ray.data as rd
    from pdf2dom_ray.functions.jaccardjoin import jaccard_pairs
    return sorted((r["doc_a"], r["doc_b"], r["inter"], r["uni"],
                   r["jaccard_ppm"])
                  for r in jaccard_pairs(rd.from_items(rows, override_num_blocks=4),
                                         **kw).take_all())


@pytest.mark.parametrize("tau", [30, 50, 80])
def test_jaccard_no_false_negatives_vs_brute(ray_session, tau):
    rows = _mk_rows()
    assert _got(rows, tau_pct=tau) == _brute(rows, 5, tau)


def test_jaccard_join_path_identical(ray_session):
    rows = _mk_rows(n_extra=8, seed=61)
    assert _got(rows, tau_pct=50, broadcast_limit=0) == \
        _brute(rows, 5, 50)


def test_jaccard_distributed_verify_path_identical(ray_session):
    rows = _mk_rows(n_extra=8, seed=71)
    assert _got(rows, tau_pct=50, driver_verify_limit=0) == \
        _brute(rows, 5, 50)


def test_jaccard_oracle_sql_matches(ray_session):
    import duckdb
    from pdf2dom_ray.functions.jaccardjoin import jaccard_oracle_sql
    rows = _mk_rows(n_extra=10, seed=67)
    vals = " UNION ALL ".join(
        "SELECT {} AS doc_id, '{}' AS text".format(r["doc_id"],
                                                   r["text"])
        for r in rows)
    want = sorted(map(tuple, duckdb.sql(
        jaccard_oracle_sql(vals, tau_pct=50)).fetchall()))
    assert _got(rows, tau_pct=50) == want


def test_jaccard_short_docs_and_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from pdf2dom_ray.functions.jaccardjoin import jaccard_pairs
    # docs shorter than k produce no shingles → no pairs
    rows = [{"doc_id": 0, "text": "a b"}, {"doc_id": 1, "text": "a b"}]
    assert jaccard_pairs(rd.from_items(rows, override_num_blocks=4)).take_all() == []
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                 "text": pa.array([], pa.string())}))
    assert jaccard_pairs(ds).take_all() == []
