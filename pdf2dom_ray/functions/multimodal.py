"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
typed metadata; decode / feature-extract stages are actor-pool
``map_batches`` stages with small batch sizes (payload-heavy rows).

Real vs stubbed (per build instructions — no image/audio libs in this
container):
* PNG produced by this engine (filter-0, 8-bit RGB/RGBA, zlib) is
  decoded for real by ``decode_engine_png`` (numpy + zlib).
* Other codecs (JPEG/audio/video frame sampling) raise
  ``NotImplementedError`` inside the stage, which converts them to
  ``error`` rows — the Ray-side plumbing (schema, batch size, actor
  signature, output layout) is real and tested.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..stages.pool import default_pool

__all__ = ["decode_engine_png", "ImageDecoder", "decode_images",
           "resize_nearest"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_engine_png(data: bytes) -> np.ndarray:
    """Decode a PNG written by engine.png (filter 0 only). Real decode."""
    if data[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG payload")
    pos = 8
    w = h = None
    color_type = None
    idat = b""
    while pos + 8 <= len(data):
        length, tag = struct.unpack(">I4s", data[pos:pos + 8])
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, bits, color_type = struct.unpack(">IIBB", payload[:10])
            if bits != 8:
                raise NotImplementedError("only 8-bit PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or color_type not in (2, 6):
        raise NotImplementedError("unsupported PNG layout")
    ch = 3 if color_type == 2 else 4
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    rows = raw.reshape(h, w * ch + 1)
    if np.any(rows[:, 0] != 0):
        raise NotImplementedError("only filter-0 scanlines supported")
    return rows[:, 1:].reshape(h, w, ch)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize (pure numpy; deterministic)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[yi][:, xi]


class ImageDecoder:
    """Actor-pool decode + feature stage.

    Input batch: (url, image: binary). Output: (url, width, height,
    mean_r, mean_g, mean_b, error). Small batch_size recommended —
    payload bytes dominate block size.
    """

    def __init__(self, thumb: int | None = None):
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        blobs = batch.column("image").to_pylist()
        width, height = [], []
        mr, mg, mb, err = [], [], [], []
        for blob in blobs:
            try:
                img = decode_engine_png(blob or b"")
                if self.thumb:
                    img = resize_nearest(img, self.thumb, self.thumb)
                height.append(img.shape[0])
                width.append(img.shape[1])
                means = img[..., :3].reshape(-1, 3).mean(axis=0)
                mr.append(float(means[0]))
                mg.append(float(means[1]))
                mb.append(float(means[2]))
                err.append(None)
            except (NotImplementedError, Exception) as e:  # noqa: BLE001
                width.append(0)
                height.append(0)
                mr.append(0.0)
                mg.append(0.0)
                mb.append(0.0)
                err.append(f"{type(e).__name__}: {e}")
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "width": pa.array(width, pa.int64()),
            "height": pa.array(height, pa.int64()),
            "mean_r": pa.array(mr, pa.float64()),
            "mean_g": pa.array(mg, pa.float64()),
            "mean_b": pa.array(mb, pa.float64()),
            "error": pa.array(err, pa.string()),
        })


def decode_images(ds: rd.Dataset, *, batch_size: int = 32,
                  concurrency=None) -> rd.Dataset:
    return ds.map_batches(ImageDecoder, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency or default_pool(),
                          num_cpus=1)


class AudioFeatureStub:
    """Audio feature-extraction stage: REAL Ray plumbing (schema, actor
    signature, small batches), STUBBED decode — no audio codec exists in
    this container, so every payload yields an ``error`` row with the
    stable output schema. Swap ``_decode`` for a real decoder on a
    cluster image that ships one.
    """

    OUTPUT = pa.schema([("url", pa.string()),
                        ("duration_s", pa.float64()),
                        ("sample_rate", pa.int64()),
                        ("mfcc", pa.list_(pa.float64())),
                        ("error", pa.string())])

    def _decode(self, blob: bytes):
        raise NotImplementedError("no audio codec in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        out_err = []
        for blob in batch.column("audio").to_pylist():
            try:
                self._decode(blob or b"")
                out_err.append(None)
            except NotImplementedError as e:
                out_err.append(str(e))
        n = len(urls)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "duration_s": pa.array([0.0] * n, pa.float64()),
            "sample_rate": pa.array([0] * n, pa.int64()),
            "mfcc": pa.array([[]] * n, pa.list_(pa.float64())),
            "error": pa.array(out_err, pa.string()),
        })


class VideoFrameSampleStub:
    """Video frame-sampling stage: same contract as AudioFeatureStub —
    deterministic fake frames (so downstream plumbing is testable)
    plus an ``error`` marking the decode as stubbed."""

    def __init__(self, frames_per_doc: int = 2, thumb: int = 4):
        self.frames_per_doc = frames_per_doc
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = []
        frame_idx = []
        frames = []
        errs = []
        for url, blob in zip(batch.column("url").to_pylist(),
                             batch.column("video").to_pylist()):
            for i in range(self.frames_per_doc):
                urls.append(url)
                frame_idx.append(i)
                # deterministic fake frame derived from payload bytes
                seed = (zlib.crc32(blob or b"") + i) % 256
                frames.append(bytes([seed]) * (self.thumb * self.thumb * 3))
                errs.append("stub: no video codec in this environment")
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "frame_rgb": pa.array(frames, pa.binary()),
            "error": pa.array(errs, pa.string()),
        })
