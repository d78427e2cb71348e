"""sfnt (TTF/OTF) normalization — FontVerter-equivalent re-serialize.

The reference runs every embedded TrueType program through
``FontVerter.readFont`` + ``tryNormalizeFVFont``
(`/root/reference/src/main/java/org/fit/pdfdom/FontTable.java:172-191`),
which re-emits the font with a rebuilt table directory so browsers
accept subset fonts whose checksums/search fields are wrong (common in
PDF-embedded subsets). This module does the same re-serialization:

* canonical table order (sorted by tag — FontVerter's normalizer),
* recomputed per-table checksums, offsets and 4-byte padding,
* correct searchRange / entrySelector / rangeShift,
* recomputed ``head.checkSumAdjustment`` (0xB1B0AFBA − file sum).

Anything that does not parse as an sfnt container is returned
unchanged — the reference logs "Normalisation will be skipped" and
passes the original bytes through on FontVerter failure.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["normalize_ttf"]

_SFNT_VERSIONS = (b"\x00\x01\x00\x00", b"true", b"OTTO", b"ttcf")


def _checksum(data: bytes) -> int:
    pad = (-len(data)) % 4
    arr = np.frombuffer(data + b"\x00" * pad, dtype=">u4")
    return int(arr.sum(dtype=np.uint64) & np.uint64(0xFFFFFFFF))


def normalize_ttf(data: bytes) -> bytes:
    """Re-serialize an sfnt font; passthrough on any parse failure."""
    try:
        return _normalize(data)
    except Exception:
        return data


def _normalize(data: bytes) -> bytes:
    if len(data) < 12:
        return data
    ver = data[:4]
    if ver not in _SFNT_VERSIONS or ver == b"ttcf":
        return data
    num = struct.unpack(">H", data[4:6])[0]
    if num == 0 or 12 + 16 * num > len(data):
        return data
    tables: dict[bytes, bytes] = {}
    for i in range(num):
        off = 12 + 16 * i
        tag = data[off:off + 4]
        toff, tlen = struct.unpack(">II", data[off + 8:off + 16])
        if toff + tlen > len(data) or toff < 12:
            return data
        tables[tag] = data[toff:toff + tlen]
    if b"head" in tables and len(tables[b"head"]) >= 12:
        # zero checkSumAdjustment before any checksumming
        h = bytearray(tables[b"head"])
        h[8:12] = b"\x00\x00\x00\x00"
        tables[b"head"] = bytes(h)

    tags = sorted(tables)
    n = len(tags)
    # searchRange fields per the sfnt spec
    max_pow = 1
    entry_sel = 0
    while max_pow * 2 <= n:
        max_pow *= 2
        entry_sel += 1
    search_range = max_pow * 16
    range_shift = n * 16 - search_range

    header = bytearray()
    header += ver + struct.pack(">HHHH", n, search_range, entry_sel,
                                range_shift)
    body = bytearray()
    offset = 12 + 16 * n
    entries = []
    for tag in tags:
        t = tables[tag]
        entries.append((tag, _checksum(t), offset, len(t)))
        body += t
        pad = (-len(t)) % 4
        body += b"\x00" * pad
        offset += len(t) + pad
    for tag, csum, toff, tlen in entries:
        header += tag + struct.pack(">III", csum, toff, tlen)

    font = bytes(header) + bytes(body)
    if b"head" in tables:
        adj = (0xB1B0AFBA - _checksum(font)) & 0xFFFFFFFF
        head_off = next(toff for tag, _, toff, _ in entries
                        if tag == b"head")
        font = font[:head_off + 8] + struct.pack(">I", adj) + \
            font[head_off + 12:]
    return font
