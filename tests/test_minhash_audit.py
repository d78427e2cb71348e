"""MinHash estimation-error audit: identical docs collide with zero
error, near-dups get plausible estimates, DuckDB oracle replay,
partition invariance."""

import numpy as np
import pyarrow as pa


def _ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))


def _run(rows, **kw):
    from pdf2dom_ray.functions.minhash_audit import minhash_audit
    out = minhash_audit(_ds(rows), **kw).to_pandas()
    return {(int(r.doc_a), int(r.doc_b)):
            (int(r.n_match), int(r.est_ppm), int(r.jac_ppm),
             int(r.err_ppm))
            for r in out.itertuples()}


ROWS = [(0, "a b c d e f g h i j"), (1, "a b c d e f g h i X"),
        (2, "totally different words entirely here now ok fine yes"),
        (3, "a b c d e f g h i j"),
        (4, "")]                                # no shingles: excluded


def test_identical_docs_zero_error(ray_session):
    from pdf2dom_ray.functions.minhash_audit import AUDIT_NUM_PERM
    got = _run(ROWS)
    assert got[(0, 3)] == (AUDIT_NUM_PERM, 1_000_000, 1_000_000, 0)
    assert all(a != 4 and b != 4 for a, b in got)


def test_estimate_tracks_exact(ray_session):
    got = _run(ROWS)
    # docs 0 and 1 share 7 of 9 distinct 3-gram shingles
    if (0, 1) in got:                   # banding may or may not fire
        nm, est, jac, err = got[(0, 1)]
        assert jac == (1_000_000 * 7) // 9
        assert err == abs(est - jac)


def test_matches_oracle(ray_session):
    import duckdb
    from pdf2dom_ray.functions.minhash_audit import \
        minhash_audit_oracle_sql
    got = sorted((k, v) for k, v in _run(ROWS).items())
    vals = " UNION ALL ".join(
        f"SELECT {d} AS doc_id, '{t}' AS text" for d, t in ROWS)
    want = sorted(
        ((int(r[0]), int(r[1])),
         (int(r[2]), int(r[3]), int(r[4]), int(r[5])))
        for r in duckdb.sql(minhash_audit_oracle_sql(vals)).fetchall())
    assert got == want and len(got) > 0


def test_partition_invariance(ray_session):
    rng = np.random.RandomState(5)
    rows = []
    base = ["w%d" % i for i in range(40)]
    for d in range(30):
        toks = list(base[:20])
        for _ in range(rng.randint(0, 3)):      # light mutations →
            toks[rng.randint(20)] = base[rng.randint(40)]  # near-dups
        rows.append((d, " ".join(toks)))
    one = _run(rows)
    import ray.data as rd
    from pdf2dom_ray.functions.minhash_audit import minhash_audit
    many = minhash_audit(_ds(rows).repartition(7)).to_pandas()
    got = {(int(r.doc_a), int(r.doc_b)):
           (int(r.n_match), int(r.est_ppm), int(r.jac_ppm),
            int(r.err_ppm)) for r in many.itertuples()}
    assert one == got and len(one) > 0
