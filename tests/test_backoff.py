"""Trigram stupid-backoff LM scoring: all three backoff levels vs a
single-process reference, held-out training slice, short docs."""

import pandas as pd
import ray.data as rd


def _reference(rows, train_mod=2):
    c123, c12, c23, c2, c3 = {}, {}, {}, {}, {}
    for d, text in rows:
        if d % train_mod != 0:
            continue
        toks = [w for w in text.split(" ") if w]
        for t in zip(toks, toks[1:], toks[2:]):
            c123[t] = c123.get(t, 0) + 1
            c12[t[:2]] = c12.get(t[:2], 0) + 1
        for b in zip(toks, toks[1:]):
            c23[b] = c23.get(b, 0) + 1
            c2[b[0]] = c2.get(b[0], 0) + 1
        for w in toks:
            c3[w] = c3.get(w, 0) + 1
    n_tok = sum(c3.values())
    out = {}
    for d, text in rows:
        toks = [w for w in text.split(" ") if w]
        tris = list(zip(toks, toks[1:], toks[2:]))
        total = 0
        for t in tris:
            if t in c123:
                total += (1_000_000 * c123[t]) // c12[t[:2]]
            elif t[1:] in c23:
                total += (2 * ((1_000_000 * c23[t[1:]]) // c2[t[1]])) // 5
            elif t[2] in c3 and n_tok:
                total += (4 * ((1_000_000 * c3[t[2]]) // n_tok)) // 25
        out[d] = total // len(tris) if tris else 0
    return out


def _ray_scores(rows, **kw):
    from pdf2dom_ray.functions.lmscore import trigram_backoff_scores
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = trigram_backoff_scores(rd.from_pandas(df), **kw).to_pandas()
    return dict(zip(got["doc_id"], got["score_ppm"].astype(int)))


def test_all_three_backoff_levels(ray_session):
    rows = [
        (0, "the cat sat on the mat"),        # trains
        (2, "the dog sat on the mat"),        # trains
        (1, "the cat sat on the mat"),        # all trigrams seen
        (3, "a cat sat by the mat"),          # "a cat sat": unseen tri,
                                              # "cat sat" bigram seen
        (5, "xx yy the"),                     # tri+bi unseen, "the" uni
        (7, "zz qq ww"),                      # nothing seen -> 0
    ]
    ref = _reference(rows)
    got = _ray_scores(rows)
    assert got == ref
    assert got[7] == 0
    assert got[1] > got[3] > got[5] > 0      # backoff discounts bite


def test_short_docs_score_zero(ray_session):
    rows = [(0, "a b c d"), (1, "a b"), (3, ""), (5, "one")]
    got = _ray_scores(rows)
    assert got[1] == 0 and got[3] == 0 and got[5] == 0


def test_train_mod_changes_model(ray_session):
    rows = [(i, "w1 w2 w3 w4 w5") for i in range(6)] + \
           [(7, "a b c d e"), (9, "a b c d e")]
    all_train = _ray_scores(rows, train_mod=1)
    half_train = _ray_scores(rows, train_mod=2)
    assert all_train == _reference(rows, 1)
    assert half_train == _reference(rows, 2)
    # doc 7's trigrams train only under train_mod=1
    assert all_train[7] > half_train[7]
