"""Minimal deterministic PNG encoder (zlib, filter 0).

Replaces Java's ``ImageIO.write(image, "PNG", ...)``
(`/root/reference/src/main/java/org/fit/pdfdom/resource/ImageResource.java:38-43`).
Output is a valid PNG; the exact compressed bytes differ from ImageIO
(different deflate implementation) but are deterministic for this
engine, which is the byte-identity contract the pipeline enforces.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_png", "decode_png_size"]

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) RGB or (H, W, 4) RGBA uint8 array as PNG."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w, ch = arr.shape
    if ch == 3:
        color_type = 2
    elif ch == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, w * ch + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png_size(data: bytes) -> tuple[int, int]:
    """Read (width, height) from a PNG header (for tests/metadata)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", data[16:24])
    return w, h
