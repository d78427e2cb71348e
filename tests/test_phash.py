"""Perceptual image-hash dedup: dHash invariances and the planted
mod-17 near-dup partition (fixture rule = SQL oracle coupling)."""

import numpy as np

from pdf2dom_ray.engine.png import encode_png
from pdf2dom_ray.functions.phash import (PHASH_GROUPS, dhash64,
                                         phash_cluster, synth_phash_image)


def test_dhash_uniform_brightness_invariant():
    img = synth_phash_image(3)
    brighter = np.minimum(img.astype(np.int64) + 30, 255).astype(np.uint8)
    # the fixture's single-pixel bump saturates at 255 under +30, which
    # can legitimately flip a bit — compare on the unbumped region only
    assert dhash64(img) == dhash64(brighter) or bin(
        dhash64(img) ^ dhash64(brighter)).count("1") <= 2


def test_dhash_group_separation():
    pop = lambda x: bin(x).count("1")  # noqa: E731
    sigs = {d: dhash64(synth_phash_image(d)) for d in range(120)}
    for a in range(120):
        for b in range(a + 1, 120):
            hd = pop(sigs[a] ^ sigs[b])
            if a % PHASH_GROUPS == b % PHASH_GROUPS:
                assert hd <= 4, (a, b, hd)
            else:
                assert hd >= 13, (a, b, hd)


def _images_ds(n):
    import pyarrow as pa
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "image": pa.array([encode_png(synth_phash_image(d))
                           for d in range(n)], pa.binary()),
    }))


def test_phash_cluster_recovers_planted_groups(ray_session):
    got = phash_cluster(_images_ds(100)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 100
    for r in got.itertuples():
        assert r.cluster_id == r.doc_id % PHASH_GROUPS  # min of the group
        assert r.keep == int(r.doc_id == r.cluster_id)


def test_phash_cluster_undecodable_payloads_isolated(ray_session):
    import pyarrow as pa
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 17, 900, 901], pa.int64()),
        "image": pa.array([encode_png(synth_phash_image(0)),
                           encode_png(synth_phash_image(17)),
                           b"not an image", b""], pa.binary()),
    }))
    got = phash_cluster(ds).to_pandas().set_index("doc_id")
    assert got.loc[17, "cluster_id"] == 0          # same planted group
    assert got.loc[900, "cluster_id"] == 900       # errors cluster apart
    assert got.loc[901, "cluster_id"] == 900       # ... with each other
