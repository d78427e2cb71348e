"""Interpolated bigram Kneser-Ney: exact-rational reference equality,
interpolation + unseen-history semantics, short docs, DuckDB twin."""

from fractions import Fraction

import pandas as pd
import ray.data as rd

TRAIN_MOD = 2


def _kn_reference(docs, train_mod=TRAIN_MOD):
    """Independent fractions-based implementation of Chen & Goodman
    eq. 4.25 at D=3/4, floored to ppm exactly like the operator."""
    c12 = {}
    for d, text in docs:
        if d % train_mod != 0:
            continue
        toks = [w for w in text.split(" ") if w]
        for p in zip(toks, toks[1:]):
            c12[p] = c12.get(p, 0) + 1
    c1, n1f, n1b = {}, {}, {}
    for (w1, w2), n in c12.items():
        c1[w1] = c1.get(w1, 0) + n
        n1f[w1] = n1f.get(w1, 0) + 1
        n1b[w2] = n1b.get(w2, 0) + 1
    nb = len(c12)
    D = Fraction(3, 4)
    out = {}
    for d, text in docs:
        toks = [w for w in text.split(" ") if w]
        pairs = list(zip(toks, toks[1:]))
        total = 0
        for w1, w2 in pairs:
            if not nb:
                continue
            if c1.get(w1):
                p = (Fraction(max(Fraction(c12.get((w1, w2), 0)) - D,
                                  0), 1) / c1[w1]
                     + D * n1f[w1] / c1[w1]
                     * Fraction(n1b.get(w2, 0), nb))
                total += int(1_000_000 * p)
            else:
                total += 1_000_000 * n1b.get(w2, 0) // nb
        out[d] = total // len(pairs) if pairs else 0
    return out


def _docs():
    return [
        (0, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (4, "a cat and a dog"),
        (1, "the cat sat on the rug today"),   # held out of training
        (3, "zz unseen words entirely"),       # unseen history
        (5, ""),                               # no bigrams
        (7, "one"),                            # single token
    ]


def _run(docs):
    from pdf2dom_ray.functions.lmscore import kneser_ney_scores
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    got = kneser_ney_scores(rd.from_pandas(df)).to_pandas()
    return dict(zip(got["doc_id"], got["score_ppm"].astype(int)))


def test_matches_fraction_reference(ray_session):
    docs = _docs()
    assert _run(docs) == _kn_reference(docs)


def test_interpolation_semantics(ray_session):
    docs = _docs()
    got = _run(docs)
    ref = _kn_reference(docs)
    # seen-in-training doc scores higher than the held-out variant
    assert got[0] > got[1] > 0
    # fully unseen vocabulary scores 0 (no continuation mass)
    assert got[3] == 0
    # degenerate docs score 0
    assert got[5] == 0 and got[7] == 0
    assert got == ref


def test_unseen_pair_gets_continuation_mass(ray_session):
    # 'rug' follows 'the' only outside training; with seen history
    # 'the', the unseen pair must still earn continuation probability
    docs = [(0, "the cat the dog a rug b rug"),
            (1, "the rug")]
    got = _run(docs)
    assert got[1] > 0


def test_oracle_sql_matches(ray_session):
    import duckdb
    docs = _docs()
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", df)
    import __ray_entry__ as E
    sql = E.oracle_sql()["kneser_ney"]
    ora = con.execute(sql).df()
    want = dict(zip(ora["doc_id"], ora["score_ppm"].astype(int)))
    assert want == _run(docs)
