"""Winnowing fingerprints: matching guarantee, rightmost-tie window
minima, short-doc semantics, partition invariance, DuckDB oracle."""

import numpy as np
import pyarrow as pa


def _ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))


def _run(rows, **kw):
    from pdf2dom_ray.functions.winnow import winnow_stats
    out = winnow_stats(_ds(rows), **kw).to_pandas()
    return {int(r.doc_id): (int(r.n_grams), int(r.n_selected),
                            int(r.density_ppm))
            for r in out.itertuples()}


def test_select_count_reference(ray_session):
    """_select_count equals a brute-force winnow over random hashes."""
    from pdf2dom_ray.functions.winnow import _select_count
    rng = np.random.RandomState(7)
    for n in (1, 3, 4, 5, 17, 64):
        for w in (2, 4, 9):
            h = rng.randint(0, 50, size=n).astype(np.int64)
            key = h * (1 << 20) + ((1 << 20) - 1
                                   - np.arange(n, dtype=np.int64))
            want = {min(key[s:min(s + w, n)])
                    for s in range(max(n - w, 0) + 1)}
            assert _select_count(h, w) == len(want), (n, w)


def test_density_and_short_docs(ray_session):
    got = _run([(1, "a b c d e f g h"),      # 6 grams, windowed
                (2, "x y"),                  # < k tokens: 1 gram
                (3, "one two three"),        # exactly k: 1 gram
                (4, "")])                    # empty: nothing
    assert got[2] == (1, 1, 1_000_000)
    assert got[3] == (1, 1, 1_000_000)
    assert got[4] == (0, 0, 0)
    ng, ns, d = got[1]
    assert ng == 6 and 1 <= ns <= 3           # ≤ n-w+1 distinct minima
    assert d == (1_000_000 * ns) // ng


def test_matching_guarantee(ray_session):
    """Docs sharing a ≥ w+k-1 token substring share ≥ 1 fingerprint:
    count via a brute recompute of the selected SETS."""
    import hashlib

    def select_set(text, k=3, w=4):
        ws = [x for x in text.split(" ") if x]
        grams = [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]
        key = [int(hashlib.md5(g.encode()).hexdigest()[:10], 16)
               * (1 << 20) + ((1 << 20) - 1 - i)
               for i, g in enumerate(grams)]
        n = len(key)
        return {min(key[s:min(s + w, n)]) // (1 << 20)
                for s in range(max(n - w, 0) + 1)}

    shared = "alpha beta gamma delta epsilon zeta"   # 6 = w+k-1 tokens
    a = "pre1 pre2 " + shared + " tail1"
    b = "other words here " + shared
    assert select_set(a) & select_set(b)


def test_partition_invariance(ray_session):
    rows = [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(30)))
            for i in range(40)]
    one = _run(rows)
    import ray.data as rd
    from pdf2dom_ray.functions.winnow import winnow_stats
    many = winnow_stats(_ds(rows).repartition(8)).to_pandas()
    got = {int(r.doc_id): (int(r.n_grams), int(r.n_selected),
                           int(r.density_ppm))
           for r in many.itertuples()}
    assert one == got


def test_matches_oracle(ray_session):
    import duckdb
    from pdf2dom_ray.functions.winnow import winnow_oracle_sql
    rows = [(0, "a b c d e f g a b c d e f g"),
            (1, "tie tie tie tie tie tie"),          # identical grams
            (2, "solo"), (3, ""), (4, "x  y   z w v u t")]
    got = sorted(_run(rows).items())
    vals = " UNION ALL ".join(
        f"SELECT {d} AS doc_id, '{t}' AS text" for d, t in rows)
    want = sorted(
        (int(r[0]), (int(r[1]), int(r[2]), int(r[3])))
        for r in duckdb.sql(winnow_oracle_sql(vals)).fetchall())
    assert got == want


def test_candidates_matching_guarantee_and_cap(ray_session):
    """Docs sharing a ≥ w+k−1-token run must pair; a fingerprint
    selected by > df_cap docs is dropped whole."""
    from pdf2dom_ray.functions.winnow import winnow_candidates
    shared = "alpha beta gamma delta epsilon zeta"     # 6 = w+k−1
    rows = [(0, "pre words here " + shared),
            (1, shared + " tail other stuff"),
            (2, "completely unrelated text body here now")]
    # plus 40 docs sharing one boilerplate run > cap
    boiler = "x1 x2 x3 x4 x5 x6"
    rows += [(10 + i, f"unique{i} " + boiler) for i in range(40)]
    got = {(r["doc_a"], r["doc_b"]): r["n_shared"]
           for r in winnow_candidates(
               _ds(rows), df_cap=32).take_all()}
    assert any(p == (0, 1) for p in got)               # guarantee
    assert all(not (a >= 10 and b >= 10) for a, b in got), \
        "boilerplate bucket beyond df_cap must not pair"


def test_candidates_match_oracle(ray_session):
    import duckdb
    from pdf2dom_ray.functions.winnow import (
        winnow_candidates, winnow_candidates_oracle_sql)
    rows = [(0, "a b c d e f g h"), (1, "a b c d e f g X"),
            (2, "q w e r t y u i"), (3, "a b c d e f g h"),
            (4, "")]
    got = sorted(
        ((r["doc_a"], r["doc_b"]), r["n_shared"])
        for r in winnow_candidates(_ds(rows)).take_all())
    vals = " UNION ALL ".join(
        f"SELECT {d} AS doc_id, '{t}' AS text" for d, t in rows)
    want = sorted(((int(a), int(b)), int(n)) for a, b, n in
                  duckdb.sql(winnow_candidates_oracle_sql(vals))
                  .fetchall())
    assert got == want and len(got) > 0
