"""Tests for the round-2 sketch/selection operators: hopping windows,
bloom-filter semi-join, count-min sketch, DSIR importance weights."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# -- hopping window ----------------------------------------------------------

def test_hopping_window_hand_case(ray_session, tmp_path):
    from pdf2dom_ray.functions.windows import hopping_window_volume

    # two events 10 min apart inside one hop bucket, one far away
    ts = pa.array([1_000_000_000_000_000,      # epoch us
                   1_000_000_600_000_000,
                   2_000_000_000_000_000], pa.timestamp("us"))
    vals = pa.array([1.5, 2.25, 4.0], pa.float64())
    pq.write_table(pa.table({"ts": ts, "value": vals}),
                   str(tmp_path / "events.parquet"))

    out = hopping_window_volume(str(tmp_path)).to_pandas()
    # every event lands in exactly width/hop = 4 windows
    assert out["n"].sum() == 3 * 4
    # micros are floor(value * 1e6)
    assert out["sum_micros"].sum() == 4 * (1_500_000 + 2_250_000
                                           + 4_000_000)
    # the two near events share their 15-min-grid window starts
    hop_us = 900 * 1_000_000
    base0 = 1_000_000_000_000_000 // hop_us * hop_us
    both = out[out["n"] == 2]
    assert len(both) == 4
    assert set(both["window_start"].astype("int64")) == {
        base0 - k * hop_us for k in range(4)}


# -- bloom filter ------------------------------------------------------------

def test_bloom_no_false_negatives_bounded_fp():
    from pdf2dom_ray.functions.bloom import bloom_bits, bloom_probe_mask

    m, k = 8192, 4
    members = [f"key{i}" for i in range(300)]
    bitmap = np.zeros(m, dtype=bool)
    bitmap[bloom_bits(members, m=m, k=k)] = True

    assert bloom_probe_mask(members, bitmap, k=k).all()
    others = [f"other{i}" for i in range(2000)]
    fp = bloom_probe_mask(others, bitmap, k=k).mean()
    # ~(1-e^(-kn/m))^k ≈ 0.03% at this load; allow generous slack
    assert fp < 0.02


def test_bloom_semijoin_flags_semantics(ray_session, sf_dir):
    from pdf2dom_ray.functions.bloom import bloom_semijoin_flags

    out = bloom_semijoin_flags(sf_dir).to_pandas()
    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey"]).to_pandas()
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey"]).to_pandas()
    has_order = set(orders["o_custkey"])
    assert len(out) == len(cust)
    flagged = set(out.loc[out["in_bloom"] == 1, "c_custkey"])
    # no false negatives: every customer with an order is admitted
    assert has_order & set(cust["c_custkey"]) <= flagged


# -- count-min sketch --------------------------------------------------------

def test_cms_overestimates_never_under():
    from pdf2dom_ray.functions.cms import _sketch_tokens, cms_estimate

    rng = np.random.default_rng(7)
    toks = [f"w{i}" for i in rng.integers(0, 500, size=5000)]
    vc = pd.Series(toks).value_counts()
    cms = _sketch_tokens(list(vc.index), vc.to_numpy(np.int64),
                         d=4, w=4096)
    est = cms_estimate(cms, list(vc.index))
    true = vc.to_numpy(np.int64)
    assert (est >= true).all()
    # at load 500/4096 the min over 4 rows is almost always exact
    assert (est == true).mean() > 0.9
    # a narrow sketch still never under-estimates
    narrow = _sketch_tokens(list(vc.index), vc.to_numpy(np.int64),
                            d=4, w=64)
    assert (cms_estimate(narrow, list(vc.index)) >= true).all()


def test_cms_merge_invariance():
    from pdf2dom_ray.functions.cms import _sketch_tokens, cms_estimate

    a = ["x"] * 10 + ["y"] * 3
    b = ["x"] * 5 + ["z"] * 2
    whole = _sketch_tokens(["x", "y", "z"],
                           np.array([15, 3, 2], np.int64), d=4, w=64)
    parts = (_sketch_tokens(["x", "y"], np.array([10, 3], np.int64),
                            d=4, w=64)
             + _sketch_tokens(["x", "z"], np.array([5, 2], np.int64),
                              d=4, w=64))
    assert (whole == parts).all()
    assert list(cms_estimate(parts, ["x", "y", "z"])) == \
        list(cms_estimate(whole, ["x", "y", "z"]))
    del a, b


def test_cms_token_counts_e2e(ray_session, sf_dir):
    from pdf2dom_ray.functions.cms import cms_token_counts

    out = cms_token_counts(sf_dir).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["text"]).to_pandas()
    true = pd.Series(
        " ".join(docs["text"]).split(" ")).value_counts()
    # probe tokens all exist and estimates are valid over-estimates
    assert len(out) > 0
    for tok, est in zip(out["token"], out["est"]):
        assert est >= int(true.get(tok, 0))
        assert est > 0


# -- DSIR importance weights -------------------------------------------------

def _dsir_reference(docs: pd.DataFrame, dim: int,
                    target_lang: str) -> pd.Series:
    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % dim

    raw = np.zeros(dim, dtype=np.int64)
    tgt = np.zeros(dim, dtype=np.int64)
    per_doc_buckets = []
    for _, r in docs.iterrows():
        bs = [bucket(w) for w in r["text"].split(" ")]
        per_doc_buckets.append(bs)
        for b in bs:
            raw[b] += 1
            if r["lang"] == target_lang:
                tgt[b] += 1
    rt, tt = int(raw.sum()), int(tgt.sum())
    ppm = [(1_000_000 * (int(tgt[b]) + 1) * (rt + dim))
           // ((int(raw[b]) + 1) * (tt + dim)) for b in range(dim)]
    return pd.Series(
        [sum(ppm[b] for b in bs) for bs in per_doc_buckets],
        index=docs["doc_id"].to_numpy())


def test_dsir_weights_match_reference_and_favor_target(ray_session,
                                                       sf_dir):
    from pdf2dom_ray.functions.dsir import dsir_weights

    out = dsir_weights(sf_dir).to_pandas().set_index("doc_id")
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"]).to_pandas()
    ref = _dsir_reference(docs, dim=64, target_lang="en")
    assert len(out) == len(ref)
    assert (out.loc[ref.index, "weight_ppm"].to_numpy()
            == ref.to_numpy()).all()
    # importance weights should rank target-language docs higher
    en = docs["lang"] == "en"
    if en.any() and (~en).any():
        ntok = docs["text"].str.split(" ").str.len()
        per_tok = ref.to_numpy() / ntok.to_numpy()
        assert per_tok[en.to_numpy()].mean() > \
            per_tok[(~en).to_numpy()].mean()
