"""Unit + small-Ray tests for the training-data operators:
dedup (exact / minhash / simhash), ANN, text stats, multimodal."""

import numpy as np
import pyarrow as pa
import pytest


# -- pure kernels ------------------------------------------------------------

def test_shingles_and_jaccard():
    from pdf2dom_ray.functions.dedup import jaccard, shingles
    a = shingles("the quick brown fox jumps", k=3)
    b = shingles("the quick brown fox leaps", k=3)
    assert 0 < jaccard(a, b) < 1
    assert jaccard(a, a) == 1.0


def test_minhash_estimates_jaccard():
    from pdf2dom_ray.functions.dedup import MinHasher, jaccard, shingles
    mh = MinHasher(num_perm=128)
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely different words in this sentence here now"
    s0, s1, s2 = (mh.signature(t) for t in (base, near, far))
    true_near = jaccard(shingles(base), shingles(near))
    assert (s0 == s1).mean() == pytest.approx(true_near, abs=0.15)
    assert (s0 == s2).mean() < 0.2
    assert (s0 == s0).mean() == 1.0


def test_simhash_batch_near_vs_far():
    from pdf2dom_ray.functions.dedup import _simhash_batch
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["alpha beta gamma delta epsilon zeta eta theta",
                 "alpha beta gamma delta epsilon zeta eta iota",
                 "unrelated totally different content entirely"],
    })
    out = _simhash_batch(t)
    sigs = out.column("simhash").to_pylist()
    def hamming(a, b):
        return bin(a ^ b).count("1")
    assert hamming(sigs[0], sigs[1]) < hamming(sigs[0], sigs[2])


def test_text_quality_batch():
    from pdf2dom_ray.functions.text_stats import text_quality_batch
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": ["the cat sat on a mat"]})
    out = text_quality_batch(t).to_pydict()
    assert out["n_tokens"] == [6]
    assert out["n_chars"] == [20]
    assert out["stop_ratio"] == [pytest.approx(2 / 6, abs=1e-6)]


def test_lang_id_heuristic():
    from pdf2dom_ray.functions.text_stats import LangId
    li = LangId()
    assert li._predict("the cat and the dog in the house") == "en"
    assert li._predict("der hund und die katze ist hier") == "de"
    assert li._predict("日本語のテキストです" * 10) == "zh"


def test_png_roundtrip_and_resize():
    from pdf2dom_ray.engine.png import encode_png
    from pdf2dom_ray.functions.multimodal import (decode_engine_png,
                                                  resize_nearest)
    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    assert (decode_engine_png(encode_png(img)) == img).all()
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    with pytest.raises(NotImplementedError):
        decode_engine_png(b"\xff\xd8\xff\xe0 not a png")


# -- Ray-level ---------------------------------------------------------------

def test_exact_dedup_min_doc_id(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.dedup import exact_dedup
    ds = rd.from_items([
        {"doc_id": 5, "text": "aaaa identical prefix here plus tail one"},
        {"doc_id": 2, "text": "aaaa identical prefix here plus tail two"},
        {"doc_id": 9, "text": "bbbb other prefix entirely different xxx"},
    ], override_num_blocks=4)
    out = exact_dedup(ds, key_prefix_chars=20).to_pandas()
    m = dict(zip(out.k, out.doc_id))
    assert m["aaaa identical prefi"] == 2
    assert m["bbbb other prefix en"] == 9


def test_minhash_cluster_groups_duplicates(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.dedup import minhash_cluster
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    ds = rd.from_items([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},                      # exact dup
        {"doc_id": 3, "text": base.replace("dog", "cat")},  # near dup
        {"doc_id": 4, "text": "totally different content with other words "
                              "nothing shared at all here whatsoever okay"},
    ], override_num_blocks=4)
    out = minhash_cluster(ds).to_pandas().set_index("doc_id").cluster_id
    assert out[2] == out[1] == 1
    assert out[4] == 4


def _near_dup_corpus():
    # 40 distinct tokens: a one-word edit moves ~3 of ~38 shingles, so
    # Jaccard ≈ 0.93 and SimHash Hamming ≈ 2 — inside both operators'
    # near-dup regions (minhash J>~0.5 banding, simhash radius 12).
    base = " ".join(f"tok{i} word{i * 7 % 13} filler{i % 5}"
                    for i in range(40))
    return [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},                          # exact dup
        {"doc_id": 3, "text": base.replace("tok7", "cat")},   # near dup
        {"doc_id": 4, "text": "totally different content with other words "
                              "nothing shared at all here whatsoever okay"},
        {"doc_id": 5, "text": base.replace("tok31", "slow")},  # chains to 1
    ]


def test_minhash_cluster_distributed_cc_matches_driver(ray_session):
    """driver_edge_limit=0 forces the distributed hash-min label
    propagation; labels must equal the driver union-find exactly."""
    import ray.data as rd
    from pdf2dom_ray.functions.dedup import minhash_cluster
    ds = rd.from_items(_near_dup_corpus(), override_num_blocks=4)
    drv = minhash_cluster(ds).to_pandas().set_index("doc_id").cluster_id
    dist = minhash_cluster(ds, driver_edge_limit=0) \
        .to_pandas().set_index("doc_id").cluster_id
    assert dict(drv) == dict(dist)
    assert drv[1] == drv[2] == drv[3] == drv[5] == 1
    assert drv[4] == 4


def test_simhash_cluster_groups_near_dups_both_paths(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.dedup import simhash_cluster
    ds = rd.from_items(_near_dup_corpus(), override_num_blocks=4)
    for lim in (5_000_000, 0):
        out = simhash_cluster(ds, driver_edge_limit=lim) \
            .to_pandas().set_index("doc_id").cluster_id
        assert out[1] == out[2] == out[3] == out[5] == 1
        assert out[4] == 4


def test_simhash_banding_pigeonhole():
    """Pairs within the Hamming radius must share ≥1 band bucket."""
    import numpy as np
    from pdf2dom_ray.functions.dedup import _SimHashBands
    bander = _SimHashBands(bands=13)
    rng = np.random.default_rng(3)
    sig = int(rng.integers(0, 1 << 63))
    flipped = sig
    for bit in rng.choice(64, size=12, replace=False):
        flipped ^= 1 << int(bit)

    def band_vals(s):
        return [(s >> int(st)) & m
                for st, m in zip(bander.starts, bander.masks)]

    a, b = band_vals(sig), band_vals(flipped)
    assert any(x == y for x, y in zip(a, b))


def test_embedding_near_dup_pairs_lsh(ray_session):
    """LSH-bucketed pairs are a subset of exact pairs with identical
    sims for the pairs they return."""
    import ray.data as rd
    from pdf2dom_ray.functions.ann import (embedding_near_dup_pairs,
                                           embedding_near_dup_pairs_lsh)
    rng = np.random.default_rng(4)
    base = rng.standard_normal(16)
    rows = [{"vec_id": i, "embedding": (base + rng.standard_normal(16) * 0.03)
             .tolist()} for i in range(6)]
    rows += [{"vec_id": 10 + i,
              "embedding": rng.standard_normal(16).tolist()}
             for i in range(6)]
    ds = rd.from_items(rows, override_num_blocks=4)
    exact = embedding_near_dup_pairs(ds, threshold=0.9).to_pandas()
    lsh = embedding_near_dup_pairs_lsh(ds, threshold=0.9, dim=16).to_pandas()
    exact_pairs = dict(((a, b), s) for a, b, s in
                       zip(exact.id_a, exact.id_b, exact.sim))
    assert len(lsh) > 0
    for a, b, s in zip(lsh.id_a, lsh.id_b, lsh.sim):
        assert exact_pairs[(a, b)] == s


def test_brute_topk_matches_numpy(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.ann import brute_topk
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((100, 16)).astype(np.float32)
    q = emb[0].astype(np.float64)
    ds = rd.from_items([{"vec_id": i, "embedding": emb[i].tolist()}
                        for i in range(100)], override_num_blocks=4)
    out = brute_topk(ds, q, k=5).to_pandas()
    sims = emb.astype(np.float64) @ q / (
        np.linalg.norm(emb.astype(np.float64), axis=1) * np.linalg.norm(q))
    expect = np.argsort(-sims)[:5]
    assert list(out.vec_id) == list(expect)
    assert out.sim.iloc[0] == pytest.approx(1.0, abs=1e-4)


def test_pq_codebooks_shape_and_determinism(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.ann import pq_train_codebooks
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((200, 16))
    emb /= np.linalg.norm(emb, axis=1)[:, None]
    ds = rd.from_items([{"vec_id": i, "embedding": emb[i].tolist()}
                        for i in range(200)], override_num_blocks=4)
    b1 = pq_train_codebooks(ds, n_sub=4, n_codes=8)
    b2 = pq_train_codebooks(ds, n_sub=4, n_codes=8)
    assert b1.shape == (4, 8, 4)
    assert np.array_equal(b1, b2)          # deterministic training
    # codebook reconstruction beats the zero predictor by far
    sub = emb.reshape(200, 4, 4)
    err = 0.0
    for m in range(4):
        d2 = ((sub[:, m, None, :] - b1[m][None]) ** 2).sum(axis=2)
        err += d2.min(axis=1).sum()
    assert err < 0.5 * (emb ** 2).sum()


def test_pq_topk_equals_brute_on_clustered_corpus(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.ann import brute_topk, pq_topk
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((10, 16))
    emb = np.concatenate([c + 0.05 * rng.standard_normal((30, 16))
                          for c in centers])
    emb /= np.linalg.norm(emb, axis=1)[:, None]
    ds = rd.from_items([{"vec_id": i, "embedding": emb[i].tolist()}
                        for i in range(len(emb))], override_num_blocks=4)
    q = emb[5].copy()
    want = brute_topk(ds, q, k=10).to_pandas()
    got = pq_topk(ds, q, k=10, n_sub=4, n_codes=16,
                  candidates=60).to_pandas()
    assert list(got.vec_id) == list(want.vec_id)
    assert list(got.sim) == list(want.sim)


def test_pq_driver_settings_cover_true_topk(ray_session, sf_dir):
    # the ann_pq_topk oracle is the brute SQL — valid only while the
    # 16x32/200 candidate set covers the true top-10 on this corpus
    import ray.data as rd
    from pdf2dom_ray.functions.ann import pq_topk

    import pyarrow.parquet as pq_
    t = pq_.read_table(f"{sf_dir}/embeddings.parquet")
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    ids = np.array(t.column("vec_id").to_pylist())
    emb /= np.linalg.norm(emb, axis=1)[:, None]
    q = emb[ids == 0][0]
    true10 = ids[np.argsort(-(emb @ q))[:10]]

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    got = pq_topk(ds, q, k=10, n_sub=16, n_codes=32,
                  candidates=200).to_pandas()
    assert set(got.vec_id) == set(true10.tolist())


def test_image_decoder_stage(ray_session):
    import ray.data as rd
    from pdf2dom_ray.engine.png import encode_png
    from pdf2dom_ray.functions.multimodal import decode_images
    img = np.full((6, 4, 3), 100, np.uint8)
    ds = rd.from_items([
        {"url": "a", "image": encode_png(img)},
        {"url": "b", "image": b"not a png"},
    ], override_num_blocks=4)
    out = decode_images(ds).to_pandas().set_index("url")
    assert out.loc["a", "width"] == 4
    assert out.loc["a", "height"] == 6
    assert out.loc["a", "mean_r"] == pytest.approx(100.0)
    assert out.loc["a", "error"] is None or np.isnan(out.loc["a", "error"])
    assert out.loc["b", "error"] is not None


def test_thumbnail_pooler_stage(ray_session):
    import ray.data as rd
    from pdf2dom_ray.engine.png import encode_png
    from pdf2dom_ray.functions.multimodal import (pool_block_mean,
                                                  thumbnail_images)
    # known 4x4 → 2x2 floor pooling: blocks sum to 10,18,42,50 → //4
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    img3 = np.stack([img] * 3, axis=-1)
    th = pool_block_mean(img3, 2)
    assert th[..., 0].tolist() == [[2, 4], [10, 12]]
    ds = rd.from_items([
        {"url": "a", "image": encode_png(img3)},
        {"url": "b", "image": b"junk"},
    ], override_num_blocks=4)
    out = thumbnail_images(ds).to_pandas().set_index("url")
    assert out.loc["a", "width"] == 2 and out.loc["a", "height"] == 2
    assert out.loc["a", "sum_r"] == 2 + 4 + 10 + 12
    assert out.loc["b", "error"] is not None


def test_thumbnail_matches_synth_rule(ray_session):
    from pdf2dom_ray.functions.multimodal import pool_block_mean
    from pdf2dom_ray.synth.corpus import synth_image
    for d in (3, 10, 500, 2024):
        th = pool_block_mean(synth_image(d), 2).astype(np.int64)
        assert int(th[..., 0].sum()) == 16 * (d % 251)
        assert int(th[..., 1].sum()) == 1504
        assert int(th[..., 2].sum()) == 16 * ((d * 7) % 251)


def test_embedding_near_dup_pairs(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.ann import embedding_near_dup_pairs
    rng = np.random.default_rng(1)
    base = rng.standard_normal(16)
    near = base + rng.standard_normal(16) * 0.05
    far = rng.standard_normal(16)
    ds = rd.from_items([
        {"vec_id": 1, "embedding": base.tolist()},
        {"vec_id": 2, "embedding": near.tolist()},
        {"vec_id": 3, "embedding": far.tolist()},
    ], override_num_blocks=4)
    out = embedding_near_dup_pairs(ds, threshold=0.9).to_pandas()
    assert set(zip(out.id_a, out.id_b)) == {(1, 2)}
    assert out.sim.iloc[0] > 0.99


def test_ivf_topk_finds_query(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.ann import ivf_topk
    rng = np.random.default_rng(2)
    emb = rng.standard_normal((200, 16))
    ds = rd.from_items([{"vec_id": i, "embedding": emb[i].tolist()}
                        for i in range(200)], override_num_blocks=4)
    out = ivf_topk(ds, emb[17], k=5, n_cells=8, nprobe=3).to_pandas()
    # the query vector itself lives in the probed cell → rank 1
    assert out.vec_id.iloc[0] == 17
    assert out.sim.iloc[0] > 0.999


def test_wav_decode_roundtrip():
    from pdf2dom_ray.functions.multimodal import decode_wav, synth_wav
    rate, x = decode_wav(synth_wav(2))
    assert rate == 8000
    assert len(x) / rate == pytest.approx(0.75)
    assert np.abs(x).max() <= 0.51          # 0.5-amplitude sine
    with pytest.raises(NotImplementedError):
        decode_wav(b"RIFFfake not a wave")


def test_video_frame_sampler_real_decode(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.multimodal import (VideoFrameSampler,
                                                  synth_avi_mjpeg)
    ds = rd.from_items([{"url": "v1", "video": synth_avi_mjpeg(3)},
                        {"url": "bad", "video": b"fakepayload"}], override_num_blocks=4)
    out = ds.map_batches(VideoFrameSampler, batch_format="pyarrow",
                         concurrency=1).to_pandas().set_index(
        ["url", "frame_idx"]).sort_index()
    assert list(out.loc["v1"].index) == [0, 1]
    assert (out.loc["v1"].width == 16).all()
    # planted R channel survives the JPEG roundtrip (first frame: 33)
    img = np.frombuffer(out.loc[("v1", 0)].frame_rgb,
                        np.uint8).reshape(4, 4, 3)
    assert abs(int(img[..., 0].mean()) - 33) < 8
    assert out.loc[("bad", -1)].error is not None


def test_audio_features_real_decode(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.multimodal import AudioFeatures, synth_wav
    ds = rd.from_items([{"url": "a1", "audio": synth_wav(1)},
                        {"url": "bad", "audio": b"RIFFfake"}], override_num_blocks=4)
    out = ds.map_batches(AudioFeatures, batch_format="pyarrow",
                         concurrency=1).to_pandas().set_index("url")
    assert out.loc["a1"].duration_s == pytest.approx(0.5)
    assert out.loc["a1"].sample_rate == 8000
    assert sum(out.loc["a1"].band_energy) > 0
    assert out.loc["bad"].error is not None
    assert list(out.columns) == ["duration_s", "sample_rate",
                                 "band_energy", "error"]


def test_bpe_token_count_batch():
    from pdf2dom_ray.functions.text_stats import bpe_token_count_batch
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["it's a test-case, No.42!", "", "plain words"]})
    out = bpe_token_count_batch(t).to_pydict()
    # it|'s| a| test|-|case|,| No|.|42|! = 11
    assert out["n_bpe_tokens"] == [11, 0, 2]


def test_gopher_quality_batch_rules():
    from pdf2dom_ray.functions.text_stats import gopher_quality_batch
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": [
                      "the quick brown fox jumps over a lazy dog",  # passes
                      "xx yy",                      # too few words
                      "0 1 2 3 4 5 6 7 8 9",        # no alpha, no stopword
                      "supercalifragilisticexpialidocious " * 5 + "the",
                  ]})
    out = gopher_quality_batch(t).to_pydict()
    assert out["passes"] == [True, False, False, False]
    assert out["has_stopword"] == [True, False, False, True]
    assert out["n_words"][0] == 9


def test_unigram_logprob(ray_session):
    import math
    import ray.data as rd
    from pdf2dom_ray.functions.text_stats import unigram_logprob
    ds = rd.from_items([
        {"doc_id": 1, "text": "a a b"},
        {"doc_id": 2, "text": "b c"},
    ], override_num_blocks=4)
    out = unigram_logprob(ds).to_pandas().set_index("doc_id")
    # corpus: a=2, b=2, c=1, total=5
    exp1 = (2 * math.log(2 / 5) + math.log(2 / 5)) / 3
    exp2 = (math.log(2 / 5) + math.log(1 / 5)) / 2
    assert out.loc[1, "mean_logprob"] == pytest.approx(exp1, abs=1e-6)
    assert out.loc[2, "mean_logprob"] == pytest.approx(exp2, abs=1e-6)


def test_connected_components_random_graphs_match_union_find(ray_session):
    """Distributed hash-min label propagation must equal driver
    union-find on arbitrary random graphs (chains, cliques, isolates)."""
    import ray.data as rd
    from pdf2dom_ray.functions.dedup import (_union_find_roots,
                                             connected_component_labels)
    rng = np.random.default_rng(11)
    # one larger random graph: each distributed run is BSP fixed cost,
    # so one 80-edge trial covers the same class as two small ones
    for trial in range(1):
        n_nodes = int(rng.integers(6, 40))
        n_edges = int(rng.integers(40, 80))
        a = rng.integers(0, n_nodes, n_edges).astype("int64")
        b = rng.integers(0, n_nodes, n_edges).astype("int64")
        keep = a != b
        a, b = a[keep], b[keep]
        if not len(a):
            continue
        edges = rd.from_items([{"a": int(x), "b": int(y)}
                               for x, y in zip(a, b)], override_num_blocks=4)
        dist = dict(connected_component_labels(edges, driver_edge_limit=0)
                    .to_pandas().itertuples(index=False, name=None))
        roots = _union_find_roots(a, b)
        # union-find map only covers touched nodes; normalize both
        expect = {n: roots.get(n, n) for n in set(a) | set(b)}
        got = {n: dist.get(n, n) for n in set(a) | set(b)}
        assert got == expect, (trial, got, expect)


def test_exact_percentiles_vs_numpy(ray_session):
    import numpy as np
    import ray.data as rd

    from pdf2dom_ray.functions.percentiles import exact_percentiles
    rng = np.random.RandomState(7)
    vals = rng.randint(0, 50, size=2000)
    ds = rd.from_items([{"x": int(v)} for v in vals],
                       override_num_blocks=9)
    out = exact_percentiles(ds, "x", qs=(0.1, 0.5, 0.9, 1.0))
    s = np.sort(vals)
    for q, v in zip(out.column("q").to_pylist(),
                    out.column("value").to_pylist()):
        import math
        assert v == int(s[max(1, math.ceil(q * len(s))) - 1]), q


def test_normalize_batch_unit():
    import pyarrow as pa

    from pdf2dom_ray.functions.textnorm import normalize_batch
    t = pa.table({"text": ["Café  \x07\ttext \x00here ",
                           "plain", "", "åb"]})
    out = normalize_batch(t)
    assert out.column("clean_text").to_pylist() == \
        ["Café text here", "plain", "", "åb"]
    assert out.column("n_chars_in").to_pylist() == [20, 5, 0, 3]
    assert out.column("n_chars_out").to_pylist() == [14, 5, 0, 2]


def test_hll_accuracy_and_reference():
    from pdf2dom_ray.functions.hll import hll_estimate, hll_sketch_batch
    keys = [f"https://h{i % 7}.com/p{i}" for i in range(20000)]
    est = hll_estimate(hll_sketch_batch(keys, p=12))
    assert abs(est - 20000) / 20000 < 0.05
    # duplicates change nothing: sketch of the SET
    est2 = hll_estimate(hll_sketch_batch(keys * 3, p=12))
    assert est2 == est


def test_hll_small_range_linear_counting():
    from pdf2dom_ray.functions.hll import hll_estimate, hll_sketch_batch
    keys = [f"k{i}" for i in range(100)]
    est = hll_estimate(hll_sketch_batch(keys, p=12))
    assert abs(est - 100) <= 3


def test_hll_merge_equals_single_pass():
    import numpy as np

    from pdf2dom_ray.functions.hll import hll_merge, hll_sketch_batch
    keys = [f"x{i}" for i in range(5000)]
    whole = hll_sketch_batch(keys, p=12)
    merged = np.zeros(1 << 12, dtype=np.uint8)
    for i in range(0, len(keys), 611):
        merged = hll_merge(merged, hll_sketch_batch(keys[i:i + 611], 12))
    assert np.array_equal(whole, merged)


def test_hll_distributed_block_invariance(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.hll import (hll_distinct, hll_estimate,
                                           hll_sketch_batch)
    keys = [f"https://ex.com/{i % 3000}" for i in range(9000)]
    exp = hll_estimate(hll_sketch_batch(sorted(set(keys)), p=12))
    for blocks in (1, 5, 23):
        ds = rd.from_items([{"url": k} for k in keys],
                           override_num_blocks=blocks)
        assert hll_distinct(ds, "url") == exp, blocks


def test_hll_distinct_by_group_accuracy_and_invariance(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.hll import (hll_distinct_by, hll_estimate,
                                           hll_sketch_batch)
    # group g has 400*(g+1) distinct users, each seen 3 times
    rows = []
    for g in range(4):
        for i in range(400 * (g + 1)):
            rows.extend({"grp": f"g{g}", "user": f"u{g}-{i}"}
                        for _ in range(3))
    exp = {f"g{g}": hll_estimate(hll_sketch_batch(
        sorted({f"u{g}-{i}" for i in range(400 * (g + 1))}), p=12))
        for g in range(4)}
    for blocks in (1, 9):
        ds = rd.from_items(rows, override_num_blocks=blocks)
        got = {r["grp"]: r["distinct_est"]
               for r in hll_distinct_by(ds, "user", "grp").take_all()}
        assert got == exp, blocks          # partitioning-invariant
    for g in range(4):
        true = 400 * (g + 1)
        assert abs(exp[f"g{g}"] - true) / true < 0.06


def test_inverted_index_block_invariant_and_hot_key(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.index import inverted_index
    rows = [{"doc_id": i,
             "text": "the quick fox" + (" rare" if i == 41 else "")}
            for i in range(60)]
    expect_the = (60, ",".join(str(i) for i in range(20)))
    for blocks in (1, 7):
        ds = rd.from_items(rows, override_num_blocks=blocks)
        out = {r["token"]: (r["n_docs"], r["postings"])
               for r in inverted_index(ds, k=20).take_all()}
        assert out["the"] == expect_the, blocks      # hot key capped
        assert out["rare"] == (1, "41")
        assert out["quick"][0] == 60


def test_bigram_stats_block_invariant(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.ngrams import bigram_stats
    rows = [{"text": "a b a b c"}, {"text": "b c"}, {"text": "a"}]
    # unigrams: a=3 b=3 c=2; bigrams: (a,b)=2 (b,a)=1 (b,c)=2
    exp = {("a", "b"): (2, 3, 3, 2 * 10**6 // 9),
           ("b", "a"): (1, 3, 3, 10**6 // 9),
           ("b", "c"): (2, 3, 2, 2 * 10**6 // 6)}
    for blocks in (1, 3):
        ds = rd.from_items(rows, override_num_blocks=blocks)
        got = {(r["w1"], r["w2"]): (r["c12"], r["c1"], r["c2"],
                                    r["assoc_ppm"])
               for r in bigram_stats(ds).take_all()}
        assert got == exp, blocks


def test_json_field_agg_malformed_rows(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.jsonprops import json_field_agg
    rows = [
        {"event_type": "a", "props": '{"k": 3}'},
        {"event_type": "a", "props": '{"k": 4}'},
        {"event_type": "a", "props": 'not json'},
        {"event_type": "b", "props": '{"x": 1}'},        # missing field
        {"event_type": "b", "props": '{"k": "s"}'},      # wrong type
        {"event_type": "b", "props": '{"k": true}'},     # bool is not int
    ]
    for blocks in (1, 3):
        ds = rd.from_items(rows, override_num_blocks=blocks)
        got = {r["event_type"]: (r["n_events"], r["sum_k"], r["n_bad"])
               for r in json_field_agg(ds).take_all()}
        assert got == {"a": (3, 7, 1), "b": (3, 0, 3)}, blocks


def test_exact_percentiles_by_group(ray_session):
    import math

    import numpy as np
    import ray.data as rd

    from pdf2dom_ray.functions.percentiles import exact_percentiles_by
    rng = np.random.RandomState(3)
    rows = [{"g": ["x", "y"][i % 2], "v": int(rng.randint(0, 40))}
            for i in range(1000)]
    out = exact_percentiles_by(
        rd.from_items(rows, override_num_blocks=7), "v", "g",
        qs=(0.5, 0.9))
    for g in ("x", "y"):
        s = np.sort([r["v"] for r in rows if r["g"] == g])
        for q in (0.5, 0.9):
            got = [r["value"] for r in out.to_pylist()
                   if r["g"] == g and r["q"] == q]
            assert got == [int(s[max(1, math.ceil(q * len(s))) - 1])]


def test_chunk_documents_semantics(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.chunking import chunk_documents
    rows = [{"doc_id": 1, "text": "a b c d e"},
            {"doc_id": 2, "text": "x"},
            {"doc_id": 3, "text": ""}]
    out = chunk_documents(rd.from_items(rows, override_num_blocks=4), seq_len=2).take_all()
    got = {(r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
           for r in out}
    assert got == {(1, 1): (2, "a b"), (1, 2): (2, "c d"),
                   (1, 3): (1, "e"), (2, 1): (1, "x"),
                   (3, 1): (1, "")}


def test_pack_sequences_hand_case(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.chunking import pack_sequences
    # doc 1: 5 toks (offsets 0-4), doc 2: 1 tok (5), doc 3: "" = 1 tok
    # (6), doc 4: 4 toks (7-10).  seq_len=4 cuts at 4 and 8.
    rows = [{"doc_id": 1, "text": "a b c d e"},
            {"doc_id": 2, "text": "x"},
            {"doc_id": 3, "text": ""},
            {"doc_id": 4, "text": "p q r s"}]
    out = pack_sequences(rd.from_items(rows, override_num_blocks=4), seq_len=4).take_all()
    got = sorted((r["doc_id"], r["seq_id"], r["tok_start"], r["n_toks"])
                 for r in out)
    assert got == [(1, 0, 0, 4), (1, 1, 4, 1), (2, 1, 0, 1),
                   (3, 1, 0, 1), (4, 1, 0, 1), (4, 2, 1, 3)]


def test_pack_sequences_partition_invariance(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.chunking import pack_sequences
    rows = [{"doc_id": i, "text": " ".join(["w"] * (1 + i * 7 % 13))}
            for i in range(40)]
    a = pack_sequences(rd.from_items(rows, override_num_blocks=4), seq_len=8).take_all()
    b = pack_sequences(rd.from_items(rows, override_num_blocks=4).repartition(7),
                       seq_len=8).take_all()
    key = lambda r: (r["doc_id"], r["seq_id"])
    assert sorted(map(dict.items, a)) == sorted(map(dict.items, b))
    # span rows per doc tile the doc exactly
    tot = {}
    for r in a:
        tot[r["doc_id"]] = tot.get(r["doc_id"], 0) + r["n_toks"]
    assert tot == {i: 1 + i * 7 % 13 for i in range(40)}


def test_hashed_features_hand_case(ray_session):
    import hashlib

    import ray.data as rd

    from pdf2dom_ray.functions.hashfeat import hashed_features
    rows = [{"doc_id": 0, "text": "x x y"}, {"doc_id": 1, "text": "y"}]
    bx = int(hashlib.md5(b"x").hexdigest()[:8], 16) % 16
    by = int(hashlib.md5(b"y").hexdigest()[:8], 16) % 16
    out = sorted((r["doc_id"], r["dim"], r["cnt"]) for r in
                 hashed_features(rd.from_items(rows, override_num_blocks=4),
                                 dim=16).take_all())
    assert out == sorted([(0, bx, 2), (0, by, 1), (1, by, 1)])


def test_heavy_hitters_exact_regime(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.heavyhitters import top_tokens_sketch
    rows = [{"text": "a a a b b c"}, {"text": "a b d"}]
    out = top_tokens_sketch(rd.from_items(rows, override_num_blocks=4), k=3,
                            capacity=100).to_pylist()
    assert [(r["token"], r["count_min"], r["count_max"])
            for r in out] == [("a", 4, 4), ("b", 3, 3), ("c", 1, 1)]


def test_heavy_hitters_lossy_bounds(ray_session):
    from collections import Counter

    import ray.data as rd

    from pdf2dom_ray.functions.heavyhitters import top_tokens_sketch
    # skewed stream: t0 (500 of n=2270) clears the MG survival bound
    # n/(capacity+1) ~ 253; vocab 60 >> capacity 8
    toks = []
    for i in range(60):
        toks.extend([f"t{i}"] * (500 if i == 0 else 60 - i))
    rows = [{"text": " ".join(toks[i:i + 37])}
            for i in range(0, len(toks), 37)]
    true = Counter(toks)
    out = top_tokens_sketch(rd.from_items(rows, override_num_blocks=4), k=8,
                            capacity=8).to_pylist()
    tokens = [r["token"] for r in out]
    # the guaranteed heavy hitter (count > n/capacity) must survive
    assert "t0" in tokens
    for r in out:   # MG bound: count_min <= true <= count_max
        assert r["count_min"] <= true[r["token"]] <= r["count_max"]
    # bounds hold under any partitioning of the same stream
    out2 = top_tokens_sketch(rd.from_items(rows, override_num_blocks=4).repartition(5),
                             k=8, capacity=8).to_pylist()
    for r in out2:
        assert r["count_min"] <= true[r["token"]] <= r["count_max"]


def test_cohort_retention_hand_case(ray_session):
    from datetime import datetime as dt

    import ray.data as rd

    from pdf2dom_ray.functions.cohort import cohort_retention
    rows = [
        # u1 first seen day 0, active days 0 and 2 (two events day 2
        # must count once); u2 first seen day 1, active day 1 only
        {"user_id": 1, "ts": dt(2024, 1, 1, 5)},
        {"user_id": 1, "ts": dt(2024, 1, 3, 1)},
        {"user_id": 1, "ts": dt(2024, 1, 3, 9)},
        {"user_id": 2, "ts": dt(2024, 1, 2, 12)},
    ]
    for lim in (5_000_000, 0):   # broadcast arm, then join arm
        out = sorted((str(r["cohort_day"]), r["day_offset"],
                      r["n_users"]) for r in cohort_retention(
                        rd.from_items(rows, override_num_blocks=4),
                        broadcast_limit=lim).take_all())
        assert out == [("2024-01-01 00:00:00", 0, 1),
                       ("2024-01-01 00:00:00", 2, 1),
                       ("2024-01-02 00:00:00", 0, 1)]


def test_stale_urls_anti_join(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.crawl import stale_urls
    rows = [
        {"url": "a", "warc_ts": 10, "version": 0},
        {"url": "a", "warc_ts": 5, "version": 0},   # max old ts wins
        {"url": "b", "warc_ts": 20, "version": 0},
        {"url": "b", "warc_ts": 30, "version": 1},  # recaptured
        {"url": "c", "warc_ts": 7, "version": 0},
    ]
    out = sorted((r["url"], r["last_ts"]) for r in
                 stale_urls(rd.from_items(rows, override_num_blocks=4)).take_all())
    assert out == [("a", 10), ("c", 7)]
    # the distributed left_anti path (broadcast disabled) is identical
    out_join = sorted((r["url"], r["last_ts"]) for r in
                      stale_urls(rd.from_items(rows, override_num_blocks=4),
                                 broadcast_limit=0).take_all())
    assert out_join == out


def test_source_overlap_hand_case(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.decontam import source_overlap
    # 2-grams: s0 has {a b, b c}; s1 has {b c, c d}; s2 has {x y}.
    # s0∩s1 = {b c} -> 1 shared; no other pair overlaps. The repeated
    # "b c" inside doc 3 must not double-count (distinct per source).
    rows = [{"doc_id": 0, "source": "s0", "text": "a b c"},
            {"doc_id": 1, "source": "s1", "text": "b c d"},
            {"doc_id": 2, "source": "s2", "text": "x y"},
            {"doc_id": 3, "source": "s1", "text": "b c"}]
    out = source_overlap(rd.from_items(rows, override_num_blocks=4), n=2).take_all()
    assert [(r["src_a"], r["src_b"], r["shared_ngrams"])
            for r in out] == [("s0", "s1", 1)]


def test_group_quota_caps_each_group(ray_session):
    import hashlib

    import ray.data as rd

    from pdf2dom_ray.functions.sampling import group_quota
    rows = [{"doc_id": i, "source": f"s{i % 3}"} for i in range(30)]
    out = group_quota(rd.from_items(rows, override_num_blocks=4), group_col="source",
                      cap=4, seed="cap").take_all()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == {"s0", "s1", "s2"}
    for src, got in by_src.items():
        ids = [i for i in range(30) if f"s{i % 3}" == src]
        exp = sorted(ids, key=lambda d: (
            hashlib.md5(f"cap:{d}".encode()).hexdigest(), d))[:4]
        got.sort(key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == exp
        assert [r["rank"] for r in got] == [1, 2, 3, 4]


def test_repetition_stats_hand_case(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.text_stats import repetition_stats
    rows = [
        # 6 toks, 3 distinct (a,b,c); top tok a=3; top bigram (a,a)=2
        {"doc_id": 0, "text": "a a a b c b"},
        # no repetition at all
        {"doc_id": 1, "text": "u v w x"},
        # single token: bigram mass 0, top token 100%
        {"doc_id": 2, "text": "solo"},
    ]
    out = {r["doc_id"]: r for r in
           repetition_stats(rd.from_items(rows, override_num_blocks=4)).take_all()}
    assert out[0]["dup_token_ppm"] == 1_000_000 * 3 // 6
    assert out[0]["top_token_ppm"] == 1_000_000 * 3 // 6
    assert out[0]["top_bigram_ppm"] == 1_000_000 * 2 * 2 // 6
    assert out[0]["repetitive"] == 1
    # every bigram unique -> no duplicated-bigram mass, not flagged
    assert out[1]["dup_token_ppm"] == 0
    assert out[1]["top_bigram_ppm"] == 0
    assert out[1]["repetitive"] == 0
    assert out[2] == {"doc_id": 2, "dup_token_ppm": 0,
                      "top_token_ppm": 1_000_000, "top_bigram_ppm": 0,
                      "repetitive": 0}


def test_seeded_shuffle_reproducible_permutation(ray_session):
    import hashlib

    import ray.data as rd

    from pdf2dom_ray.functions.shuffle import seeded_shuffle
    rows = [{"doc_id": i} for i in range(50)]
    out = seeded_shuffle(rd.from_items(rows, override_num_blocks=4), seed="s1",
                         n_shards=4).take_all()
    # ranks form an exact permutation; order matches the md5 key sort
    got = sorted((r["rank"], r["doc_id"], r["shard"]) for r in out)
    assert [r[0] for r in got] == list(range(50))
    exp_order = sorted(range(50), key=lambda d: (
        hashlib.md5(f"s1:{d}".encode()).hexdigest(), d))
    assert [r[1] for r in got] == exp_order
    assert all(r[2] == r[0] % 4 for r in got)
    # partition invariance
    out2 = seeded_shuffle(rd.from_items(rows, override_num_blocks=4).repartition(7),
                          seed="s1", n_shards=4).take_all()
    assert sorted(map(dict.items, out)) == sorted(map(dict.items, out2))
    # a different seed gives a different permutation
    out3 = seeded_shuffle(rd.from_items(rows, override_num_blocks=4), seed="s2",
                          n_shards=4).take_all()
    order3 = [d for _, d in sorted((r["rank"], r["doc_id"])
                                   for r in out3)]
    assert order3 != exp_order


def test_classifier_score_hand_case(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.classifier import classifier_score
    # 'good' only in en docs, 'bad' only in non-en; 'mid' in both.
    rows = [{"doc_id": 0, "text": "good good mid", "lang": "en"},
            {"doc_id": 1, "text": "good mid", "lang": "en"},
            {"doc_id": 2, "text": "bad bad mid", "lang": "fr"},
            {"doc_id": 3, "text": "bad mid", "lang": "de"}]
    out = {r["doc_id"]: r for r in
           classifier_score(rd.from_items(rows, override_num_blocks=4)).take_all()}
    # counts: good (3,0) bad (0,3) mid (2,2); T_pos=5 T_neg=5 V=3
    w = {"good": 1_000_000 * 4 * 8 // (1 * 8),
         "bad": 1_000_000 * 1 * 8 // (4 * 8),
         "mid": 1_000_000 * 3 * 8 // (3 * 8)}
    assert out[0]["score_ppm"] == (2 * w["good"] + w["mid"]) // 3
    assert out[2]["score_ppm"] == (2 * w["bad"] + w["mid"]) // 3
    assert [out[i]["pred"] for i in range(4)] == [1, 1, 0, 0]


def test_classifier_max_vocab_oov_neutral(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.classifier import (NEUTRAL_PPM,
                                                  classifier_score)
    # cap vocab at 1: only the most frequent word ('mid', 4 occurrences)
    # keeps a weight; every other token scores the neutral 1e6
    rows = [{"doc_id": 0, "text": "good mid mid", "lang": "en"},
            {"doc_id": 1, "text": "bad mid mid", "lang": "fr"}]
    out = {r["doc_id"]: r for r in classifier_score(
        rd.from_items(rows, override_num_blocks=4), max_vocab=1).take_all()}
    # mid: (2,2), capped totals T_pos=T_neg=2, V=1 -> ratio exactly 1
    assert out[0]["score_ppm"] == NEUTRAL_PPM
    assert out[1]["score_ppm"] == NEUTRAL_PPM


def test_tfidf_topk_hand_case_and_strategy_equivalence(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.tfidf import tfidf_topk
    # N=4 docs (one empty still counts in N).  df: the=3, fox=2,
    # rare=1, dog=1.  idf_ppm = (1e6*4)//df.
    rows = [{"doc_id": 0, "text": "the fox the fox rare"},
            {"doc_id": 1, "text": "the fox"},
            {"doc_id": 2, "text": "the dog"},
            {"doc_id": 3, "text": ""}]
    idf = {"the": 4_000_000 // 3, "fox": 2_000_000,
           "rare": 4_000_000, "dog": 4_000_000}
    exp0 = [("fox", 2 * idf["fox"], 1), ("rare", idf["rare"], 2),
            ("the", 2 * idf["the"], 3)]
    for strategy in ("broadcast", "join"):
        for blocks in (1, 3):
            ds = rd.from_items(rows, override_num_blocks=blocks)
            out = tfidf_topk(ds, k=5, strategy=strategy).take_all()
            got0 = [(r["token"], r["score_ppm"], r["rnk"])
                    for r in sorted(out, key=lambda r: r["rnk"])
                    if r["doc_id"] == 0]
            assert got0 == exp0, (strategy, blocks)
            assert not any(r["doc_id"] == 3 for r in out)
            d2 = {r["token"]: (r["tf"], r["df"]) for r in out
                  if r["doc_id"] == 2}
            assert d2 == {"dog": (1, 1), "the": (1, 3)}, strategy


def test_tfidf_topk_k_cap_and_tie_break(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.tfidf import tfidf_topk
    # every token unique within the doc and df=1 → all scores equal →
    # rank order is token-ascending; k=2 caps the output
    ds = rd.from_items([{"doc_id": 7, "text": "zeta alpha mid"}], override_num_blocks=4)
    out = sorted(tfidf_topk(ds, k=2, strategy="broadcast").take_all(),
                 key=lambda r: r["rnk"])
    assert [(r["token"], r["rnk"]) for r in out] == [("alpha", 1),
                                                     ("mid", 2)]


def test_bm25_topk_formula_and_strategy_equivalence(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.tfidf import _bm25_ppm, bm25_topk
    # N=4 (empty doc counts in N, contributes 0 to L).  L = 5+2+2 = 9.
    rows = [{"doc_id": 0, "text": "the fox the fox rare"},
            {"doc_id": 1, "text": "the fox"},
            {"doc_id": 2, "text": "the dog"},
            {"doc_id": 3, "text": ""}]
    n, l = 4, 9
    df = {"the": 3, "fox": 2, "rare": 1, "dog": 1}
    # local reference: per-doc scores via the same exact-rational core
    exp0 = sorted(
        [(_bm25_ppm(tf, df[tok], 5, n, l), tok, tf)
         for tok, tf in (("the", 2), ("fox", 2), ("rare", 1))],
        key=lambda s: (-s[0], s[1]))
    # hand-check one score end-to-end: rare, tf=1, df=1, dl=5
    #   idf_ppm = (1e6 * (8-2+1)) // 3 = 2_333_333
    #   tfn_ppm = (22*1*9*1e6) // (10*9*1 + 3*9 + 9*5*4) = 198e6//297
    assert _bm25_ppm(1, 1, 5, n, l) == \
        (2_333_333 * (198_000_000 // 297)) // 1_000_000
    for strategy in ("broadcast", "join"):
        for blocks in (1, 3):
            ds = rd.from_items(rows, override_num_blocks=blocks)
            out = bm25_topk(ds, k=5, strategy=strategy).take_all()
            got0 = [(r["score_ppm"], r["token"], r["tf"])
                    for r in sorted(out, key=lambda r: r["rnk"])
                    if r["doc_id"] == 0]
            assert got0 == exp0, (strategy, blocks)
            assert not any(r["doc_id"] == 3 for r in out)
            assert all(r["dl"] == 2 for r in out if r["doc_id"] == 1)


def test_bm25_topk_rare_term_beats_stopword(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.tfidf import bm25_topk
    # 'common' is in every doc (df=N -> idf floor); 'needle' df=1.
    ds = rd.from_items(
        [{"doc_id": i, "text": "common needle" if i == 0 else
          "common filler"} for i in range(6)], override_num_blocks=4)
    top = {r["doc_id"]: r["token"]
           for r in bm25_topk(ds, k=1).take_all()}
    assert top[0] == "needle"


def test_contamination_flags_hand_case(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.decontam import contamination_flags
    # n=3 windows; bench doc shares 'b c d' with doc 1 only
    docs = [{"doc_id": 1, "text": "a b c d e"},
            {"doc_id": 2, "text": "x y z w"},
            {"doc_id": 3, "text": "a b"}]          # shorter than n
    bench = [{"doc_id": 9, "text": "q b c d"}]
    for blocks in (1, 2):
        out = {r["doc_id"]: r for r in contamination_flags(
            rd.from_items(docs, override_num_blocks=blocks),
            rd.from_items(bench, override_num_blocks=4), n=3).take_all()}
        assert (out[1]["n_ngrams"], out[1]["n_overlap"],
                out[1]["contaminated"]) == (3, 1, True)
        assert (out[2]["n_overlap"], out[2]["contaminated"]) == \
            (0, False)
        assert (out[3]["n_ngrams"], out[3]["contaminated"]) == \
            (0, False)


def test_contamination_distinct_gram_counting(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.decontam import contamination_flags
    # 'a b a b a b' has windows {a b a, b a b} -> 2 DISTINCT 3-grams,
    # both in bench -> overlap 2 even though 4 window positions exist
    out = contamination_flags(
        rd.from_items([{"doc_id": 1, "text": "a b a b a b"}], override_num_blocks=4),
        rd.from_items([{"doc_id": 9, "text": "a b a b"}], override_num_blocks=4),
        n=3).take_all()
    assert (out[0]["n_ngrams"], out[0]["n_overlap"]) == (2, 2)


def test_duplicate_spans_hand_case(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.decontam import duplicate_spans
    # w=3: 'a b c' occurs twice in doc 1 and once in doc 2; every
    # other window is single-doc and must not appear
    docs = [{"doc_id": 1, "text": "a b c q a b c"},
            {"doc_id": 2, "text": "z a b c"},
            {"doc_id": 3, "text": "unrelated words entirely here"}]
    for blocks in (1, 3):
        out = duplicate_spans(
            rd.from_items(docs, override_num_blocks=blocks),
            w=3).take_all()
        assert [(r["gram"], r["n_docs"], r["n_occ"])
                for r in out] == [("a b c", 2, 3)], blocks


def test_bigram_lm_buckets_hand_case(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.lmscore import bigram_lm_buckets
    # corpus bigrams: (a,a)x2, (a,b)x1 -> c1[a]=3
    #   d1 "a a a": ((1e6*2)//3)*2 // 2 = 666666
    #   d2 "a b":   (1e6*1)//3      = 333333
    #   d3 "":      no pairs        = 0
    # terciles over [0, 333333, 666666]: t33 = rank 1 = 0,
    # t66 = rank 2 = 333333 -> head / middle / tail
    docs = [{"doc_id": 1, "text": "a a a"},
            {"doc_id": 2, "text": "a b"},
            {"doc_id": 3, "text": ""}]
    for blocks in (1, 3):
        out = {r["doc_id"]: (r["score_ppm"], r["bucket"])
               for r in bigram_lm_buckets(
                   rd.from_items(docs,
                                 override_num_blocks=blocks)).take_all()}
        assert out == {1: (666666, "head"), 2: (333333, "middle"),
                       3: (0, "tail")}, blocks


def test_bigram_lm_scores_self_trained_no_oov(ray_session):
    import ray.data as rd

    from pdf2dom_ray.functions.lmscore import bigram_lm_scores
    # every bigram the scorer sees is in the self-trained model, so a
    # one-doc corpus of a repeated pair scores the full 1e6 ppm
    out = bigram_lm_scores(rd.from_items(
        [{"doc_id": 5, "text": "x y x y"}], override_num_blocks=4)).take_all()
    # bigrams: (x,y)x2, (y,x)x1; c1[x]=2, c1[y]=1
    # pairs: (x,y)->1e6*2//2=1e6, (y,x)->1e6, (x,y)->1e6 -> mean 1e6
    assert out[0]["score_ppm"] == 1_000_000


def test_table_profile_mixed_types_and_nulls(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pdf2dom_ray.functions.profile import table_profile
    t = pa.table({
        "i": pa.array([3, None, 7, 1], pa.int64()),
        "s": pa.array(["b", "a", None, "c"], pa.string()),
        "f": pa.array([1.5, -2.0, 0.0, None], pa.float64()),
        "ts": pa.array([1000, 2000, None, 500], pa.timestamp("us")),
    })
    for blocks in (1, 4):
        ds = rd.from_arrow(t).repartition(blocks)
        got = {r["column"]: r for r in table_profile(ds).take_all()}
        assert got["i"]["n"] == 4 and got["i"]["n_nulls"] == 1
        assert got["i"]["min_num"] == 1.0 and got["i"]["max_num"] == 7.0
        assert got["s"]["min_str"] == "a" and got["s"]["max_str"] == "c"
        assert got["s"]["min_num"] is None
        assert got["f"]["min_num"] == -2.0
        assert got["ts"]["min_num"] == 500.0
        assert got["ts"]["max_num"] == 2000.0


def test_ntile_buckets_matches_pandas_and_invariance(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pdf2dom_ray.functions.ntile import ntile_buckets
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 40, size=237)   # heavy ties, n % k != 0
    df = pd.DataFrame({"doc_id": np.arange(237), "n_chars": vals})
    order = df.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    n, k = len(order), 7
    q, r = divmod(n, k)
    rank0 = np.arange(n)
    big = r * (q + 1)
    want_bucket = np.where(rank0 < big, rank0 // (q + 1) + 1,
                           r + (rank0 - big) // q + 1)
    want = dict(zip(order["doc_id"], want_bucket))
    t = pa.table({"doc_id": pa.array(df.doc_id, pa.int64()),
                  "n_chars": pa.array(df.n_chars, pa.int64())})
    for blocks in (1, 9):
        ds = rd.from_arrow(t).repartition(blocks)
        got = {r_["doc_id"]: r_["bucket"]
               for r_ in ntile_buckets(ds, value_col="n_chars",
                                       id_col="doc_id", k=7,
                                       num_partitions=5).take_all()}
        assert got == want, blocks


def test_ntile_more_buckets_than_rows(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pdf2dom_ray.functions.ntile import ntile_buckets
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([5, 3, 9], pa.int64()),
        "n_chars": pa.array([10, 10, 2], pa.int64())}))
    got = {r["doc_id"]: r["bucket"]
           for r in ntile_buckets(ds, value_col="n_chars",
                                  id_col="doc_id", k=10).take_all()}
    assert got == {9: 1, 3: 2, 5: 3}   # rank order: (2,9),(10,3),(10,5)


def test_knn_join_matches_numpy_reference(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pdf2dom_ray.functions.ann import knn_join
    rng = np.random.default_rng(7)
    emb = rng.standard_normal((80, 16))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(80), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in emb]),
    })).repartition(5)
    qsel = np.arange(0, 80, 20)
    got = knn_join(ds, emb[qsel], qsel, k=3).take_all()
    sims = np.round(
        (emb @ emb[qsel].T)
        / np.outer(np.linalg.norm(emb, axis=1),
                   np.linalg.norm(emb[qsel], axis=1)), 4)
    for ci, qid in enumerate(qsel):
        order = sorted(range(80), key=lambda i: (-sims[i, ci], i))[:3]
        rows = sorted((r for r in got if r["qid"] == qid),
                      key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == order
        assert rows[0]["vec_id"] == qid and rows[0]["sim"] == 1.0


def test_dedup_cluster_sizes_census(ray_session, sf_dir):
    """Cluster-size histogram conserves documents and matches the
    cluster labels it derives from."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    sizes = E.queries()["dedup_cluster_sizes"](sf_dir).to_pandas()
    labels = E.queries()["dedup_minhash"](sf_dir).to_pandas()
    assert sizes["n_docs"].sum() == len(labels)
    want = labels.groupby("cluster_id").size().value_counts()
    got = dict(zip(sizes["size"], sizes["n_clusters"]))
    assert got == {int(k): int(v) for k, v in want.items()}


def test_compression_ratio_signal(ray_session):
    import ray.data as rd
    from pdf2dom_ray.functions.text_stats import compression_ratio
    rows = [
        {"doc_id": 0, "text": "spam spam spam " * 50},      # templated
        {"doc_id": 1, "text": " ".join(
            f"w{i * 7919 % 104729}" for i in range(150))},  # high-entropy
        {"doc_id": 2, "text": ""},
    ]
    ds = rd.from_items(rows, override_num_blocks=3)
    out = compression_ratio(ds).to_pandas().set_index("doc_id")
    # repetitive text compresses far better than high-entropy text
    assert out.loc[0, "ratio_ppm"] < out.loc[1, "ratio_ppm"] // 3
    assert out.loc[2, "n_bytes"] == 0 and out.loc[2, "ratio_ppm"] >= 0
    # deterministic across a second run
    out2 = compression_ratio(
        rd.from_items(rows, override_num_blocks=1)).to_pandas() \
        .set_index("doc_id")
    assert out.equals(out2)


def test_hll_registers_oracle_replay(ray_session):
    """Every register of the md5 HLL sketch must equal the DuckDB
    hex-nibble replay (and re-derive the same estimate)."""
    import duckdb
    import ray.data as rd
    from pdf2dom_ray.functions.hll import (hll_estimate,
                                           hll_registers,
                                           hll_registers_oracle_sql)
    keys = [f"user{i * 13 % 977}" for i in range(400)]
    ds = rd.from_items([{"k": k} for k in keys], override_num_blocks=5)
    got = hll_registers(ds, "k").to_pandas()
    vals = " UNION ALL ".join(f"SELECT '{k}' AS k" for k in set(keys))
    want = duckdb.sql(hll_registers_oracle_sql(vals)).df() \
        .sort_values("bucket").reset_index(drop=True)
    assert got.sort_values("bucket").reset_index(drop=True) \
        .astype("int64").equals(want.astype("int64"))
    est = hll_estimate(got.sort_values("bucket")["register"]
                       .to_numpy("uint8"))
    true = len(set(keys))
    assert abs(est - true) / true < 0.1
