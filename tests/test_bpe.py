"""BPE vocabulary learning (functions/bpe.py): distributed merge
learning locked exactly against the single-process classic reference,
partitioning invariance, merge-rewrite edge cases, pair counts, and
the encode stage.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pdf2dom_ray.functions.bpe import (apply_bpe, initial_pair_counts,
                                       learn_bpe, learn_bpe_reference,
                                       word_counts)

TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a hat and a bat and a rat",
    "the hatter chatted",
    "low lower lowest slow slowly",
    "new newer newest knew news",
]


def _docs(texts=TEXTS, nparts=None):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    ds = rd.from_arrow(t)
    if nparts:
        ds = ds.repartition(nparts)
    return ds


def test_word_counts_match_regex_reference():
    import re

    from pdf2dom_ray.functions.text_stats import BPE_SPLIT_PATTERN
    rx = re.compile(BPE_SPLIT_PATTERN)
    exp: dict[str, int] = {}
    for t in TEXTS:
        for m in rx.findall(t):
            if m.strip():
                exp[m] = exp.get(m, 0) + 1
    got = {r["word"]: r["n"] for r in word_counts(_docs()).take_all()}
    assert got == exp


def test_learn_bpe_matches_reference_exactly():
    ref = learn_bpe_reference(TEXTS, num_merges=25, min_count=2)
    got = learn_bpe(_docs(), num_merges=25, min_count=2)
    rows = list(zip(got.column("rank").to_pylist(),
                    got.column("lhs").to_pylist(),
                    got.column("rhs").to_pylist(),
                    got.column("pair_count").to_pylist()))
    assert rows == ref
    assert len(rows) > 5          # the corpus supports many merges


def test_learn_bpe_partitioning_invariant():
    a = learn_bpe(_docs(nparts=1), num_merges=12)
    b = learn_bpe(_docs(nparts=5), num_merges=12)
    assert a.equals(b)


def test_learn_bpe_multichar_symbols_emerge():
    got = learn_bpe(_docs(), num_merges=25, min_count=2)
    merged = [l + r for l, r in zip(got.column("lhs").to_pylist(),
                                    got.column("rhs").to_pylist())]
    assert any(len(m) >= 3 for m in merged)


def test_merge_overlapping_run_is_greedy_left():
    # "aaaa" with merge (a,a): left-greedy → ("aa","aa"), so round 2
    # merges ("aa","aa"); the reference implements the same rule
    texts = ["aaaa aaaa aaaa"]
    ref = learn_bpe_reference(texts, num_merges=3, min_count=1)
    got = learn_bpe(_docs(texts), num_merges=3, min_count=1)
    rows = list(zip(got.column("rank").to_pylist(),
                    got.column("lhs").to_pylist(),
                    got.column("rhs").to_pylist(),
                    got.column("pair_count").to_pylist()))
    assert rows == ref
    assert rows[0][1:3] == ("a", "a")
    assert rows[1][1:3] == ("aa", "aa")


def test_min_count_stops_early():
    got = learn_bpe(_docs(["xy"]), num_merges=10, min_count=2)
    assert got.num_rows == 0
    got1 = learn_bpe(_docs(["xy"]), num_merges=10, min_count=1)
    assert got1.num_rows >= 1


def test_initial_pair_counts_top_ordering():
    rows = initial_pair_counts(_docs(), top=10).take_all()
    assert len(rows) == 10
    keys = [(-r["pair_count"], r["lhs"], r["rhs"]) for r in rows]
    assert keys == sorted(keys)
    # 'th' appears in every "the"/"hatter" etc. — must rank near top
    ref = learn_bpe_reference(TEXTS, num_merges=1)
    assert (rows[0]["lhs"], rows[0]["rhs"]) == (ref[0][1], ref[0][2])
    assert rows[0]["pair_count"] == ref[0][3]


def test_apply_bpe_counts():
    merges = learn_bpe(_docs(), num_merges=25, min_count=2)
    out = {r["doc_id"]: r["n_tokens"]
           for r in apply_bpe(_docs(), merges, concurrency=2).take_all()}

    # reference encode: lowest-rank-first substitution per pre-token
    import re

    from pdf2dom_ray.functions.text_stats import BPE_SPLIT_PATTERN
    rx = re.compile(BPE_SPLIT_PATTERN)
    rank_of = {(l, r): i for i, (l, r) in
               enumerate(zip(merges.column("lhs").to_pylist(),
                             merges.column("rhs").to_pylist()))}

    def enc_len(word):
        syms = list(word)
        while len(syms) > 1:
            ranked = [(rank_of[(syms[i], syms[i + 1])], i)
                      for i in range(len(syms) - 1)
                      if (syms[i], syms[i + 1]) in rank_of]
            if not ranked:
                break
            _, i = min(ranked)
            syms[i:i + 2] = [syms[i] + syms[i + 1]]
        return len(syms)

    for d, txt in enumerate(TEXTS):
        exp = sum(enc_len(m) for m in rx.findall(txt) if m.strip())
        assert out[d] == exp
        assert out[d] <= sum(len(m) for m in rx.findall(txt) if m.strip())


def test_apply_bpe_no_merges_is_char_count():
    empty = pa.table({"rank": pa.array([], pa.int64()),
                      "lhs": pa.array([], pa.string()),
                      "rhs": pa.array([], pa.string()),
                      "pair_count": pa.array([], pa.int64())})
    out = {r["doc_id"]: r["n_tokens"]
           for r in apply_bpe(_docs(["ab cd"]), empty,
                              concurrency=2).take_all()}
    assert out[0] == len("ab") + len(" cd")


def test_learn_bpe_on_corpus_sample():
    # smoke over the real synthetic corpus text column
    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"]).limit(50)
    t = learn_bpe(ds.materialize(), num_merges=5, min_count=2)
    assert t.num_rows == 5
    assert all(c > 0 for c in t.column("pair_count").to_pylist())
