"""OOV-vs-vocab-size curve: hand case with ties, monotonicity,
oracle replay, partition invariance."""

import numpy as np
import pyarrow as pa


def _ds(texts):
    import ray.data as rd
    return rd.from_items([{"doc_id": i, "text": t}
                          for i, t in enumerate(texts)],
                         override_num_blocks=4)


def _run(texts, ladder=(1, 2, 4)):
    from pdf2dom_ray.functions.oovcurve import oov_curve
    out = oov_curve(_ds(texts), ladder=ladder).to_pandas()
    return {int(r.vocab_size): (int(r.n_vocab), int(r.covered),
                                int(r.oov_ppm))
            for r in out.itertuples()}


def test_hand_case_with_ties(ray_session):
    # counts: a=4, b=2, c=2, d=1 (total 9); tie b/c broken b first
    got = _run(["a a b c", "a a b c d"], ladder=(1, 2, 3, 8))
    assert got[1] == (1, 4, (1_000_000 * 5) // 9)
    assert got[2] == (2, 6, (1_000_000 * 3) // 9)
    assert got[3] == (3, 8, (1_000_000 * 1) // 9)
    assert got[8] == (4, 9, 0)


def test_monotone_nonincreasing(ray_session):
    rng = np.random.RandomState(13)
    texts = [" ".join(f"w{rng.randint(50)}" for _ in range(40))
             for _ in range(30)]
    got = _run(texts, ladder=(2, 8, 32, 128))
    ppms = [got[v][2] for v in (2, 8, 32, 128)]
    assert ppms == sorted(ppms, reverse=True)


def test_matches_oracle(ray_session):
    import duckdb
    from pdf2dom_ray.functions.oovcurve import (oov_curve,
                                                oov_curve_oracle_sql)
    texts = ["a a b c", "a a b c d", "x  y", ""]
    got = sorted(_run(texts, ladder=(1, 3, 16)).items())
    vals = " UNION ALL ".join(f"SELECT '{t}' AS text" for t in texts)
    want = sorted(
        (int(r[0]), (int(r[1]), int(r[2]), int(r[3])))
        for r in duckdb.sql(
            oov_curve_oracle_sql(vals, ladder=(1, 3, 16))).fetchall())
    assert got == want


def test_partition_invariance(ray_session):
    rng = np.random.RandomState(17)
    texts = [" ".join(f"t{rng.randint(30)}" for _ in range(25))
             for _ in range(40)]
    a = _run(texts, ladder=(4, 16))
    import ray.data as rd
    from pdf2dom_ray.functions.oovcurve import oov_curve
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(texts)],
                       override_num_blocks=9)
    out = oov_curve(ds, ladder=(4, 16), num_partitions=5).to_pandas()
    b = {int(r.vocab_size): (int(r.n_vocab), int(r.covered),
                             int(r.oov_ppm)) for r in out.itertuples()}
    assert a == b
