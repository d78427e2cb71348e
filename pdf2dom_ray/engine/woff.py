"""Bare-CFF → OpenType wrap → WOFF1 container.

The reference converts bare-CFF font programs (FontFile3 /Type1C) to
browser-usable WOFF via FontVerter
(`/root/reference/src/main/java/org/fit/pdfdom/FontTable.java:220-238`).
This module re-implements the conversion from the public format specs:

* CFF (Adobe TN #5176): header + Name/TopDICT INDEX parsing, enough to
  recover the PostScript name and the glyph count (CharStrings INDEX).
* OpenType (ISO/IEC 14496-22): the bare CFF becomes the ``CFF `` table
  of an ``OTTO`` sfnt with minimal required tables (head, hhea, hmtx,
  maxp v0.5, cmap format-4 stub, name, OS/2, post v3).
* WOFF 1.0 (W3C): zlib-compressed table container.

The output parses as WOFF (>1 tables — the reference's own acceptance
bar, `TestFonts.java:40-53`); rendering fidelity for exotic CFFs is a
non-goal, matching the reference's "html still usable without" stance.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["CffError", "cff_info", "cff_to_otf", "otf_to_woff",
           "cff_to_woff", "parse_woff_header"]


class CffError(Exception):
    pass


def _read_index(data: bytes, pos: int):
    """Parse a CFF INDEX; returns (items, end_pos)."""
    if pos + 2 > len(data):
        raise CffError("truncated INDEX")
    count = struct.unpack(">H", data[pos:pos + 2])[0]
    pos += 2
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    if not 1 <= off_size <= 4:
        raise CffError(f"bad offSize {off_size}")
    offs = []
    for i in range(count + 1):
        chunk = data[pos + i * off_size:pos + (i + 1) * off_size]
        if len(chunk) < off_size:
            raise CffError("truncated INDEX offsets")
        offs.append(int.from_bytes(chunk, "big"))
    pos += (count + 1) * off_size
    base = pos - 1
    items = []
    for i in range(count):
        items.append(data[base + offs[i]:base + offs[i + 1]])
    return items, base + offs[-1]


def _parse_dict(data: bytes) -> dict[int, list]:
    """CFF DICT: operands then 1- or 2-byte operators."""
    out: dict[int, list] = {}
    operands: list[float] = []
    i = 0
    while i < len(data):
        b0 = data[i]
        if b0 <= 21:  # operator
            op = b0
            i += 1
            if b0 == 12:
                op = 1200 + data[i]
                i += 1
            out[op] = operands
            operands = []
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        elif b0 == 28:
            operands.append(struct.unpack(">h", data[i + 1:i + 3])[0])
            i += 3
        elif b0 == 29:
            operands.append(struct.unpack(">i", data[i + 1:i + 5])[0])
            i += 5
        elif b0 == 30:  # real number (BCD)
            i += 1
            s = ""
            done = False
            while i < len(data) and not done:
                byte = data[i]
                i += 1
                for nib in (byte >> 4, byte & 0xF):
                    if nib <= 9:
                        s += str(nib)
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "E"
                    elif nib == 0xC:
                        s += "E-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib == 0xF:
                        done = True
                        break
            try:
                operands.append(float(s) if s else 0.0)
            except ValueError:
                operands.append(0.0)
        else:
            raise CffError(f"bad DICT byte {b0}")
    return out


def cff_info(cff: bytes) -> tuple[str, int]:
    """(postscript_name, num_glyphs) from a bare CFF program."""
    if len(cff) < 4:
        raise CffError("too short")
    hdr_size = cff[2]
    names, pos = _read_index(cff, hdr_size)
    top_dicts, pos = _read_index(cff, pos)
    if not top_dicts:
        raise CffError("no TopDICT")
    name = names[0].decode("latin-1", "replace") if names else "Unknown"
    top = _parse_dict(top_dicts[0])
    cs_off = top.get(17)
    if not cs_off:
        raise CffError("no CharStrings")
    charstrings, _ = _read_index(cff, int(cs_off[0]))
    return name, len(charstrings)


def _sfnt(tables: list[tuple[bytes, bytes]], flavor: bytes) -> bytes:
    n = len(tables)
    entry_sel = (n).bit_length() - 1
    search_range = 16 * (1 << entry_sel)
    out = struct.pack(">4sHHHH", flavor, n, search_range, entry_sel,
                      16 * n - search_range)
    offset = 12 + 16 * n
    directory = b""
    payload = b""
    for tag, data in sorted(tables):
        pad = (-len(data)) % 4
        csum = sum(struct.unpack(f">{(len(data) + pad) // 4}I",
                                 data + b"\0" * pad)) & 0xFFFFFFFF
        directory += struct.pack(">4sIII", tag, csum, offset, len(data))
        payload += data + b"\0" * pad
        offset += len(data) + pad
    return out + directory + payload


def cff_to_otf(cff: bytes) -> bytes:
    """Wrap a bare CFF program in a minimal OTTO sfnt."""
    ps_name, num_glyphs = cff_info(cff)
    num_glyphs = max(1, min(num_glyphs, 0xFFFF))

    # head: version, fontRevision, checkSumAdjustment, magicNumber,
    # flags, unitsPerEm, created, modified, xMin..yMax, macStyle,
    # lowestRecPPEM, fontDirectionHint, indexToLocFormat, glyphDataFormat
    head = struct.pack(">IIIIHHQQhhhhHHhhh", 0x00010000, 0, 0,
                       0x5F0F3CF5, 0, 1000, 0, 0, -200, -100, 1000, 900,
                       0, 8, 2, 0, 0)
    hhea = struct.pack(">IhhhHhhhhhhhhhhhH", 0x00010000, 800, -200, 90,
                       1000, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, num_glyphs)
    maxp = struct.pack(">IH", 0x00005000, num_glyphs)
    hmtx = struct.pack(">Hh", 500, 0) * num_glyphs
    # cmap: format 4, one segment mapping nothing (0xFFFF terminator)
    sub4 = struct.pack(">HHHHHHH", 4, 24, 0, 2, 2, 0, 0) + \
        struct.pack(">HHHhH", 0xFFFF, 0, 0xFFFF, 1, 0)
    cmap = struct.pack(">HHHHI", 0, 1, 3, 1, 12) + sub4
    # name: family + postscript name records (platform 3/1, UTF-16BE)
    strings = [(1, ps_name), (4, ps_name), (6, ps_name)]
    name_data = b""
    recs = b""
    for name_id, s in strings:
        enc = s.encode("utf-16-be")
        recs += struct.pack(">HHHHHH", 3, 1, 0x409, name_id, len(enc),
                            len(name_data))
        name_data += enc
    name = struct.pack(">HHH", 0, len(strings),
                       6 + 12 * len(strings)) + recs + name_data
    os2 = struct.pack(">Hhhhh", 1, 500, 5, 0, 0) + b"\0" * 68
    post = struct.pack(">IIhhIIIII", 0x00030000, 0, 0, 0, 0, 0, 0, 0, 0)

    return _sfnt([(b"CFF ", cff), (b"head", head), (b"hhea", hhea),
                  (b"hmtx", hmtx), (b"maxp", maxp), (b"cmap", cmap),
                  (b"name", name), (b"OS/2", os2), (b"post", post)],
                 b"OTTO")


def otf_to_woff(otf: bytes) -> bytes:
    """WOFF 1.0 container around an sfnt."""
    flavor, num_tables = struct.unpack(">4sH", otf[:6])
    entries = []
    for i in range(num_tables):
        tag, csum, off, length = struct.unpack(
            ">4sIII", otf[12 + 16 * i:12 + 16 * (i + 1)])
        entries.append((tag, csum, otf[off:off + length]))
    header_size = 44
    dir_size = 20 * num_tables
    offset = header_size + dir_size
    directory = b""
    payload = b""
    for tag, csum, data in entries:
        comp = zlib.compress(data, 9)
        if len(comp) >= len(data):
            comp = data
        pad = (-len(comp)) % 4
        directory += struct.pack(">4sIIII", tag, offset, len(comp),
                                 len(data), csum)
        payload += comp + b"\0" * pad
        offset += len(comp) + pad
    total = header_size + dir_size + len(payload)
    header = struct.pack(">I4sIHHIHHIIIII", 0x774F4646, flavor, total,
                         num_tables, 0, len(otf), 1, 0, 0, 0, 0, 0, 0)
    return header + directory + payload


def cff_to_woff(cff: bytes) -> bytes:
    return otf_to_woff(cff_to_otf(cff))


def parse_woff_header(data: bytes) -> tuple[int, list[bytes]]:
    """(num_tables, tags) — test/validation helper."""
    if data[:4] != b"wOFF":
        raise ValueError("not WOFF")
    num_tables = struct.unpack(">H", data[12:14])[0]
    tags = []
    for i in range(num_tables):
        tags.append(data[44 + 20 * i:44 + 20 * i + 4])
    return num_tables, tags
