"""Perceptual image-hash near-duplicate detection (dHash).

dHash — the difference hash (Krawetz, "Kind of Like That", 2013;
the standard pHash-family baseline): grayscale → 8×9 thumbnail →
64 bits, bit i = pixel brighter than its right neighbour. Gradient
comparisons make the hash invariant to uniform brightness shifts and
robust to small local edits — near-duplicate images land within a few
bits in Hamming space.

Distributed shape (identical to the text SimHash path in
``dedup.py`` — the payload never enters a shuffle):

1. decode + hash in an actor-pool ``map_batches`` stage (payload rows,
   small batches) → narrow ``(doc_id, sig)`` rows;
2. band the 64-bit signature into ``bands`` contiguous bit-bands —
   with ``bands > hamming_thresh`` every qualifying pair shares at
   least one untouched band (pigeonhole), so candidate recall is
   perfect;
3. ONE hash-partition shuffle on (band_id, band_val), exact Hamming
   verification inside buckets (vectorized XOR + popcount);
4. exact connected components over the verified edges
   (driver union-find small-N fast path, distributed hash-min label
   propagation beyond ``driver_edge_limit``).

The reference (radkovo/Pdf2Dom) extracts images but never compares
them (ImageResource identity is object-equality only,
``PDFDomTree.java`` image handling); perceptual dedup is part of this
repo's training-data surface.

Fixture coupling (CLAUDE.md invariant): ``synth_phash_image`` IS the
SQL oracle for the ``image_phash_dedup`` driver query — the planted
rule is "same ``doc_id % PHASH_GROUPS`` ⇒ same base pattern (near-dup
within ≤4 bits), different group ⇒ ≥13 bits apart". Changing the
pattern, ``PHASH_GROUPS``, or the hash requires updating the oracle in
``__ray_entry__.py`` together.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..stages.pool import default_pool
from .dedup import _label_all_docs, _simhash_edges
from .multimodal import ImageDecoder, resize_nearest

__all__ = ["dhash64", "PHashStage", "phash_signatures", "phash_cluster",
           "synth_phash_image", "PHASH_GROUPS"]

PHASH_GROUPS = 17


def dhash64(img: np.ndarray) -> int:
    """64-bit dHash: integer BT.601 luma, 8×9 nearest thumbnail,
    horizontal gradient sign bits. Pure integer — bit-reproducible."""
    g = (299 * img[..., 0].astype(np.int64)
         + 587 * img[..., 1].astype(np.int64)
         + 114 * img[..., 2].astype(np.int64)) // 1000
    t = resize_nearest(g, 8, 9)
    bits = (t[:, 1:] > t[:, :-1]).astype(np.uint64).reshape(64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


class PHashStage:
    """Actor-pool decode + dHash stage.

    Input batch: (doc_id, image: binary PNG/JPEG). Output: narrow
    (doc_id, sig) rows; undecodable payloads hash to sig = -1 (their
    own singleton cluster downstream). Payload bytes dominate block
    size — keep ``batch_size`` small.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = []
        for blob in batch.column("image").to_pylist():
            try:
                img = ImageDecoder._decode(blob or b"")
                if img.ndim == 2:
                    img = np.stack([img] * 3, axis=-1)
                sigs.append(np.int64(np.uint64(dhash64(img))))
            except Exception:  # noqa: BLE001 — error rows, never raise
                sigs.append(np.int64(-1))
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "sig": pa.array(sigs, pa.int64()),
        })


def phash_signatures(images: rd.Dataset, *, batch_size: int = 64,
                     concurrency=None) -> rd.Dataset:
    """(doc_id, image) → (doc_id, sig): the payload-dropping stage."""
    return images.map_batches(
        PHashStage(), batch_format="pyarrow", batch_size=batch_size)


def _sig_band_fn(bands: int):
    """(doc_id, sig) → (doc_id, sig, band_id, band_val) band rows for
    a PRE-COMPUTED 64-bit signature column (the text SimHash bander
    recomputes signatures from text; images already paid the decode).
    Stateless closure → task-based map_batches, no actor pool."""
    width = 64 // bands
    extras = 64 - width * bands
    widths = [width + (1 if i < extras else 0) for i in range(bands)]
    starts = np.cumsum([0] + widths[:-1])
    masks = [(1 << w) - 1 for w in widths]

    def expand(batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        sigs = np.asarray(batch.column("sig"), dtype=np.int64) \
            .view(np.uint64)
        n = len(doc_ids)
        vals = np.empty((n, bands), dtype=np.int64)
        for i, (s, m) in enumerate(zip(starts, masks)):
            vals[:, i] = ((sigs >> np.uint64(s))
                          & np.uint64(m)).view(np.int64)
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_ids, bands), pa.int64()),
            "sig": pa.array(np.repeat(sigs.view(np.int64), bands),
                            pa.int64()),
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32),
                                        n), pa.int32()),
            "band_val": pa.array(vals.reshape(-1), pa.int64()),
        })

    return expand


def phash_cluster(images: rd.Dataset, *, hamming_thresh: int = 6,
                  bands: int = 7, batch_size: int = 64, concurrency=None,
                  driver_edge_limit: int = 5_000_000) -> rd.Dataset:
    """(doc_id, cluster_id, keep): connected components over image
    pairs with dHash Hamming distance ≤ ``hamming_thresh``;
    cluster_id = min doc_id of the component, keep = 1 on the kept
    representative.

    Recall guarantee: ``bands > hamming_thresh`` contiguous bit-bands
    ⇒ every qualifying pair shares one untouched band (pigeonhole).
    Decode failures (sig = -1) band like any value; exact verification
    keeps -1 rows only with other -1 rows, so they cluster among
    themselves rather than poisoning real components.
    """
    if bands <= hamming_thresh:
        raise ValueError("need bands > hamming_thresh for the pigeonhole "
                         "recall guarantee")
    sigs = phash_signatures(images, batch_size=batch_size,
                            concurrency=concurrency).materialize()
    # materialized: feeds both the band shuffle and the label join —
    # without it the decode stage would re-execute (shared lineage)
    band_rows = sigs.map_batches(_sig_band_fn(bands),
                                 batch_format="pyarrow")
    edges = _simhash_edges(band_rows, hamming_thresh)
    labels = _label_all_docs(sigs, edges,
                             driver_edge_limit=driver_edge_limit,
                             concurrency=concurrency)

    def finish(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").cast(pa.int64())
        c = t.column("cluster_id").cast(pa.int64())
        import pyarrow.compute as pc
        return pa.table({"doc_id": d, "cluster_id": c,
                         "keep": pc.cast(pc.equal(d, c), pa.int64())})

    return labels.map_batches(finish, batch_format="pyarrow")


def synth_phash_image(doc_id: int, groups: int = PHASH_GROUPS,
                      size: int = 32) -> np.ndarray:
    """Deterministic near-dup image fixture — the rule IS the oracle.

    Same ``doc_id % groups`` ⇒ same strong-gradient base pattern;
    per-doc uniform brightness offset (dHash-invariant by
    construction) plus a single-pixel bump (flips ≤2 gradient bits).
    Measured separation: within-group pairwise ≤4 bits, cross-group
    ≥13 bits — cleanly split by ``hamming_thresh`` 5..12.
    """
    g = doc_id % groups
    y, x = np.mgrid[0:size, 0:size]
    base = ((x * (3 + g) + y * (5 + 2 * g)) * 17) % 200
    img = np.stack([base,
                    (base + 31 * (g + 1)) % 200,
                    (base * 2 + 7 * g) % 200], axis=-1).astype(np.int64)
    img += doc_id % 40
    r, c = (doc_id * 7) % size, (doc_id * 13) % size
    img[r, c] = np.minimum(img[r, c] + 120, 255)
    return img.astype(np.uint8)
