"""JBIG2 (embedded-stream) decoder — MMR and arithmetic generic regions.

Covers the ``JBIG2Decode`` filter for pages built from generic region
segments: the segment-header framing is implemented in full (so any
embedded stream parses); MMR region decoding reuses the engine's
T.6/G4 codec (``engine/ccitt.py``) — JBIG2's MMR mode *is* T.6 coding
(ITU-T T.88 §6.2.6) — and arithmetic-coded generic regions (templates
0-3, generalized AT pixels, TPGDON typical prediction, T.88 §6.2.5)
decode through the engine MQ coder (``engine/mq.py``). Symbol
dictionaries and text regions (T.88 §6.5/§6.4 — the dominant real-
world JBIG2 mode for scanned text) decode via the Annex-A integer
arithmetic procedures (IADH/IADW/IAEX/IADT/IAFS/IADS/IAIT/IAID), all
four reference corners, transposed placement, SBSTRIPS strips and
shared per-dictionary generic contexts. Halftone regions decode in
full (T.88 §6.6/§6.7 pattern dictionaries, Annex C.5 gray-coded
bitplanes through one shared decoder/context, fixed-point §6.6.5.1
grid placement, all combination operators). The §6.3 refinement
procedure (both templates, TPGRON typical prediction) backs
refinement region segments (types 40/42/43, against the page-so-far
per §6.3.2), per-instance SBREFINE symbol refinement in text regions
(§6.4.11) and REFAGG symbol dictionaries — single-instance
refinements of imported symbols and multi-instance aggregates
decoded as embedded text regions with dictionary-retained contexts
(§6.5.8.2). Huffman-coded symbol dictionaries
(SDHUFF, §6.5.9) decode height-class collective bitmaps (uncompressed
and MMR) with the standard integer tables B.1-B.5 and stream-carried
custom table segments (type 53, Annex B.2) — the canonical prefix
assignment is Annex B.3. SBHUFF text regions decode with the standard
tables B.6-B.15 (Annex B.5, transcribed in spec line order) and the
stream-carried symbol-ID runcode table (§7.4.4.1.7), including
per-instance refinement in Huffman mode (§6.4.11: RI as one raw bit,
RDW/RDH/RDX/RDY via the selected B.14/B.15/custom tables, BMSIZE via
B.1, then a byte-aligned FRESH arithmetic decoder over exactly BMSIZE
bytes of refinement data). Malformed streams raise ``Jbig2Error``
with the specific reason and degrade upstream to the honest
``UnsupportedImageError`` → ``<img src="">`` path, mirroring how the
reference surfaces undecodable images (``ImageUtils.java:11-54``
returns null → empty image resource).

The embedded (PDF) segment layout (T.88 Annex / PDF 32000 §7.4.7):
no file header; a sequence of segments, each
``number(4) | flags(1) | referred-to block | page assoc (1|4) |
data length(4) | data``. Region data starts with the region segment
info field ``w(4) h(4) x(4) y(4) comb(1)`` followed by the generic
region flags byte (bit0 = MMR).

``encode_jbig2_mmr`` writes the same subset (page info + one
immediate lossless generic region) for fixtures — decode(encode(x))
== x is the codec test, exactly like the engine's JPEG pair.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["Jbig2Error", "decode_jbig2", "encode_jbig2_mmr",
           "encode_jbig2_arith", "encode_jbig2_text_page",
           "encode_jbig2_halftone", "encode_jbig2_refinement",
           "encode_jbig2_refagg_page", "encode_jbig2_huffman_text_page"]


class Jbig2Error(Exception):
    pass


# segment types (T.88 §7.3)
_PAGE_INFO = 48
_END_PAGE = 49
_END_STRIPE = 50
_END_FILE = 51
_GENERIC = (36, 38, 39)          # intermediate / immediate / imm. lossless
_TEXT = (4, 6, 7)
_HALFTONE = (20, 22, 23)


def _parse_segment_headers(data: bytes, offset: int = 0):
    """Yield (seg_num, seg_type, refs, page, payload) per segment."""
    n = len(data)
    pos = offset
    while pos < n:
        if n - pos < 11:
            raise Jbig2Error(f"truncated segment header at {pos}")
        seg_num, flags = struct.unpack_from(">IB", data, pos)
        pos += 5
        seg_type = flags & 0x3F
        page_assoc_4 = bool(flags & 0x40)

        ref_byte = data[pos]
        count = ref_byte >> 5
        if count == 7:
            count = struct.unpack_from(">I", data, pos)[0] & 0x1FFFFFFF
            pos += 4 + (count + 8) // 8          # long form + retain bits
        else:
            pos += 1
        ref_size = 1 if seg_num <= 256 else (2 if seg_num <= 65536 else 4)
        refs = []
        for i in range(count):
            if ref_size == 1:
                refs.append(data[pos + i])
            elif ref_size == 2:
                refs.append(struct.unpack_from(">H", data, pos + 2 * i)[0])
            else:
                refs.append(struct.unpack_from(">I", data, pos + 4 * i)[0])
        pos += count * ref_size

        if page_assoc_4:
            page = struct.unpack_from(">I", data, pos)[0]
            pos += 4
        else:
            page = data[pos]
            pos += 1
        (length,) = struct.unpack_from(">I", data, pos)
        pos += 4
        if length == 0xFFFFFFFF:
            raise Jbig2Error("unknown segment data length")
        if pos + length > n:
            raise Jbig2Error(f"segment {seg_num} data overruns stream")
        yield seg_num, seg_type, refs, page, data[pos:pos + length]
        pos += length


# fixed generic-region template pixels, (dx, dy), EXCLUDING the
# adaptive AT pixels (T.88 figures 4-7; nominal AT positions below)
_TEMPLATES = {
    0: [(-1, -2), (0, -2), (1, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
        (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
    1: [(-1, -2), (0, -2), (1, -2), (2, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
        (-3, 0), (-2, 0), (-1, 0)],
    2: [(-1, -2), (0, -2), (1, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1),
        (-2, 0), (-1, 0)],
    3: [(-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1),
        (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
}
_NOMINAL_AT = {
    0: [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    1: [(3, -1)],
    2: [(2, -1)],
    3: [(2, -1)],
}
# SLTP pseudo-pixel contexts for TPGDON (T.88 §6.2.5.7)
_TPGDON_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}


def _template_pixels(template: int, at: list[tuple[int, int]]):
    """Full ordered context pixel list: fixed + AT, sorted by (y, x)
    with the first pixel contributing the context MSB (the sorted
    layout reproduces the spec's per-template context figures for
    nominal AT positions)."""
    pix = list(_TEMPLATES[template]) + list(at)
    pix.sort(key=lambda p: (p[1], p[0]))
    return pix


def _decode_generic_arith(data: bytes, w: int, h: int, template: int,
                          at: list[tuple[int, int]],
                          tpgdon: bool, *, dec=None,
                          cx: list[int] | None = None) -> np.ndarray:
    """Arithmetic generic region decoding procedure (T.88 §6.2.5.7).

    ``dec``/``cx`` let a symbol dictionary share ONE arithmetic
    decoder and generic context across all its symbols (§6.5.8.1).
    """
    from .mq import MQDecoder
    pix = _template_pixels(template, at)
    nbits = len(pix)
    if dec is None:
        dec = MQDecoder(data)
    if cx is None:
        cx = [0] * (1 << nbits)
    ltp = 0
    sltp_ctx = _TPGDON_CTX[template]
    rows = [[0] * w for _ in range(h)]   # python lists for the hot loop
    decode = dec.decode
    for y in range(h):
        if tpgdon:
            ltp ^= decode(cx, sltp_ctx)
            if ltp:
                if y > 0:
                    rows[y] = list(rows[y - 1])
                continue
        row = rows[y]
        for x in range(w):
            ctx = 0
            for dx, dy in pix:
                xx = x + dx
                yy = y + dy
                # same causal-neighbor rule as the encoder: in-bounds
                # reads only touch already-decoded pixels
                if 0 <= xx < w and yy >= 0:
                    ctx = (ctx << 1) | rows[yy][xx]
                else:
                    ctx <<= 1
            row[x] = decode(cx, ctx)
    return np.asarray(rows, dtype=np.uint8)


def _decode_generic_region(payload: bytes) -> tuple[int, int, int, int,
                                                    int, np.ndarray]:
    """Region payload → (x, y, w, h, comb_op, bitmap 1=black)."""
    if len(payload) < 18:
        raise Jbig2Error("truncated region segment info")
    w, h, x, y = struct.unpack_from(">IIII", payload, 0)
    comb = payload[16] & 0x07
    gflags = payload[17]
    mmr = gflags & 0x01
    template = (gflags >> 1) & 0x03
    tpgdon = bool((gflags >> 3) & 0x01)
    ext_template = bool((gflags >> 4) & 0x01)
    if w == 0 or h == 0 or w * h > 64_000_000:
        raise Jbig2Error(f"bad region dims {w}x{h}")
    if not mmr:
        if ext_template:
            raise Jbig2Error("EXTTEMPLATE generic region unsupported")
        n_at = 4 if template == 0 else 1
        if len(payload) < 18 + 2 * n_at:
            raise Jbig2Error("truncated AT pixel list")
        at = []
        for i in range(n_at):
            ax = struct.unpack_from(">b", payload, 18 + 2 * i)[0]
            ay = struct.unpack_from(">b", payload, 19 + 2 * i)[0]
            if ay > 0 or (ay == 0 and ax >= 0):
                raise Jbig2Error(f"non-causal AT pixel ({ax},{ay})")
            at.append((ax, ay))
        bitmap = _decode_generic_arith(payload[18 + 2 * n_at:], w, h,
                                       template, at, tpgdon)
        return x, y, w, h, comb, bitmap
    if tpgdon:
        raise Jbig2Error("TPGDON with MMR is invalid")
    from .ccitt import CcittError, decode_g4
    try:
        bitmap = decode_g4(payload[18:], w, h)
    except CcittError as e:
        raise Jbig2Error(f"MMR region decode failed: {e}") from e
    return x, y, w, h, comb, bitmap


# ------------------------------------------------- Annex A integer coding

_OOB = None  # out-of-band marker


def _int_ranges():
    return ((0, 2, 0), (2, 4, 4), (6, 6, 20), (14, 8, 84),
            (30, 12, 340), (31, 32, 4436))


def _decode_int(dec, cx: list[int]):
    """IAx integer arithmetic decoding (T.88 Annex A.2) → int or OOB
    (None). ``cx`` is the procedure's 512-state context array."""
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = dec.decode(cx, prev)
        prev = ((prev << 1) | b) if prev < 256 else \
            ((((prev << 1) | b) & 511) | 256)
        return b

    s = bit()
    if not bit():
        n, off = 2, 0
    elif not bit():
        n, off = 4, 4
    elif not bit():
        n, off = 6, 20
    elif not bit():
        n, off = 8, 84
    elif not bit():
        n, off = 12, 340
    else:
        n, off = 32, 4436
    v = 0
    for _ in range(n):
        v = (v << 1) | bit()
    v += off
    if s and v == 0:
        return _OOB
    return -v if s else v


def _encode_int(enc, cx: list[int], value) -> None:
    """Inverse of ``_decode_int`` (bit-exact context chain)."""
    prev = 1

    def bit(b: int) -> None:
        nonlocal prev
        enc.encode(cx, prev, b)
        prev = ((prev << 1) | b) if prev < 256 else \
            ((((prev << 1) | b) & 511) | 256)

    if value is _OOB:
        s, v = 1, 0
    else:
        s, v = (1, -value) if value < 0 else (0, value)
    bit(s)
    if v < 4:
        prefix, n, off = [0], 2, 0
    elif v < 20:
        prefix, n, off = [1, 0], 4, 4
    elif v < 84:
        prefix, n, off = [1, 1, 0], 6, 20
    elif v < 340:
        prefix, n, off = [1, 1, 1, 0], 8, 84
    elif v < 4436:
        prefix, n, off = [1, 1, 1, 1, 0], 12, 340
    else:
        prefix, n, off = [1, 1, 1, 1, 1], 32, 4436
    for b in prefix:
        bit(b)
    rem = v - off
    for i in range(n - 1, -1, -1):
        bit((rem >> i) & 1)


def _decode_iaid(dec, cx: list[int], symcodelen: int) -> int:
    """IAID decoding (T.88 A.3): fixed-length symbol-ID tree."""
    prev = 1
    for _ in range(symcodelen):
        prev = (prev << 1) | dec.decode(cx, prev)
    return prev - (1 << symcodelen)


def _encode_iaid(enc, cx: list[int], symcodelen: int, value: int) -> None:
    prev = 1
    for i in range(symcodelen - 1, -1, -1):
        b = (value >> i) & 1
        enc.encode(cx, prev, b)
        prev = (prev << 1) | b


def _symcodelen(n_syms: int) -> int:
    return max(1, (max(n_syms, 2) - 1).bit_length()) if n_syms > 1 else 0


# ------------------------------------------------- Huffman tables (B.2/B.3)

class _BitReader:
    """MSB-first bit reader for Huffman-coded segment data (no 0xFF
    unstuffing — that is an MQ-coder concern)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def get(self) -> int:
        if self.pos >= len(self.data):
            raise Jbig2Error("Huffman data overruns stream")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def get_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get()
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _HuffTable:
    """Huffman-coded integer table (T.88 Annex B). ``lines`` are
    (preflen, rangelen, rangelow, kind) with kind one of ``""``
    (normal), ``"lower"`` (32-bit downward range), ``"oob"``.
    Prefix codes are assigned canonically per B.3 in line order."""

    def __init__(self, lines):
        self.lines = [ln for ln in lines if ln[0] > 0]
        maxlen = max((ln[0] for ln in self.lines), default=0)
        count = [0] * (maxlen + 1)
        for ln in self.lines:
            count[ln[0]] += 1
        firstcode = [0] * (maxlen + 2)
        curcode = [0] * (maxlen + 1)
        for ln in range(1, maxlen + 1):
            firstcode[ln] = (firstcode[ln - 1] + count[ln - 1]) * 2
            curcode[ln] = firstcode[ln]
        self.codes = {}                        # (len, code) -> line
        self.encode_map = {}                   # id(line-tuple index)
        for i, ln in enumerate(self.lines):
            code = curcode[ln[0]]
            curcode[ln[0]] += 1
            self.codes[(ln[0], code)] = ln
            self.encode_map[i] = (ln[0], code)

    def decode(self, rdr: _BitReader):
        """→ int value or ``_OOB``."""
        ln = 0
        code = 0
        while True:
            code = (code << 1) | rdr.get()
            ln += 1
            line = self.codes.get((ln, code))
            if line is not None:
                break
            if ln > 32:
                raise Jbig2Error("bad Huffman prefix")
        preflen, rangelen, rangelow, kind = line
        if kind == "oob":
            return _OOB
        off = rdr.get_bits(rangelen)
        if kind == "lower":
            return rangelow - off
        return rangelow + off

    def encode(self, out: list[int], value) -> None:
        """Append bits for ``value`` (fixture encoders)."""
        if value is _OOB:
            cand = [i for i, ln in enumerate(self.lines)
                    if ln[3] == "oob"]
        else:
            cand = []
            for i, ln in enumerate(self.lines):
                preflen, rangelen, rangelow, kind = ln
                if kind == "lower" and value <= rangelow:
                    cand.append(i)
                elif kind == "" and rangelow <= value \
                        and (rangelen >= 32
                             or value < rangelow + (1 << rangelen)):
                    cand.append(i)
            # prefer the tightest normal line (table order breaks ties)
            cand.sort(key=lambda i: self.lines[i][1])
        if not cand:
            raise Jbig2Error(f"value {value} not representable")
        i = cand[0]
        preflen, rangelen, rangelow, kind = self.lines[i]
        plen, code = self.encode_map[i]
        for k in range(plen - 1, -1, -1):
            out.append((code >> k) & 1)
        if kind == "oob":
            return
        off = (rangelow - value) if kind == "lower" else (value - rangelow)
        for k in range(rangelen - 1, -1, -1):
            out.append((off >> k) & 1)


# standard tables B.1-B.5 (T.88 Annex B.5) — the symbol-dictionary set
_STD_TABLES = {
    1: _HuffTable([(1, 4, 0, ""), (2, 8, 16, ""), (3, 16, 272, ""),
                   (3, 32, 65808, "")]),
    2: _HuffTable([(1, 0, 0, ""), (2, 0, 1, ""), (3, 0, 2, ""),
                   (4, 3, 3, ""), (5, 6, 11, ""), (6, 32, 75, ""),
                   (6, 0, 0, "oob")]),
    3: _HuffTable([(8, 8, -256, ""), (1, 0, 0, ""), (2, 0, 1, ""),
                   (3, 0, 2, ""), (4, 3, 3, ""), (5, 6, 11, ""),
                   (8, 32, -257, "lower"), (7, 32, 75, ""),
                   (6, 0, 0, "oob")]),
    4: _HuffTable([(1, 0, 1, ""), (2, 0, 2, ""), (3, 0, 3, ""),
                   (4, 3, 4, ""), (5, 6, 12, ""), (5, 32, 76, "")]),
    5: _HuffTable([(7, 8, -255, ""), (1, 0, 1, ""), (2, 0, 2, ""),
                   (3, 0, 3, ""), (4, 3, 4, ""), (5, 6, 12, ""),
                   (7, 32, -256, "lower"), (6, 32, 76, "")]),
    # text-region set (B.6-B.15): FS (B.6/B.7), DS (B.8-B.10),
    # DT (B.11-B.13), refinement deltas (B.14/B.15) — transcribed from
    # ITU-T T.88 Annex B.5 in spec line order (order fixes the B.3
    # canonical prefix assignment)
    6: _HuffTable([(5, 10, -2048, ""), (4, 9, -1024, ""),
                   (4, 8, -512, ""), (4, 7, -256, ""), (5, 6, -128, ""),
                   (5, 5, -64, ""), (4, 5, -32, ""), (2, 7, 0, ""),
                   (3, 7, 128, ""), (3, 8, 256, ""), (4, 9, 512, ""),
                   (4, 10, 1024, ""), (6, 32, -2049, "lower"),
                   (6, 32, 2048, "")]),
    7: _HuffTable([(4, 9, -1024, ""), (3, 8, -512, ""),
                   (4, 7, -256, ""), (5, 6, -128, ""), (5, 5, -64, ""),
                   (4, 5, -32, ""), (4, 9, 0, ""), (5, 10, 512, ""),
                   (3, 32, -1025, "lower"), (3, 32, 1536, "")]),
    8: _HuffTable([(8, 3, -15, ""), (9, 1, -7, ""), (8, 1, -5, ""),
                   (9, 0, -3, ""), (7, 0, -2, ""), (4, 0, -1, ""),
                   (2, 1, 0, ""), (5, 0, 2, ""), (6, 0, 3, ""),
                   (3, 4, 4, ""), (6, 1, 20, ""), (4, 4, 22, ""),
                   (4, 5, 38, ""), (5, 6, 70, ""), (5, 7, 134, ""),
                   (6, 7, 262, ""), (7, 8, 390, ""), (6, 10, 646, ""),
                   (9, 32, -16, "lower"), (9, 32, 1670, ""),
                   (2, 0, 0, "oob")]),
    9: _HuffTable([(8, 4, -31, ""), (9, 2, -15, ""), (8, 2, -11, ""),
                   (9, 1, -7, ""), (7, 1, -5, ""), (4, 1, -3, ""),
                   (3, 1, -1, ""), (3, 1, 1, ""), (5, 1, 3, ""),
                   (6, 1, 5, ""), (3, 5, 7, ""), (6, 2, 39, ""),
                   (4, 5, 43, ""), (4, 6, 75, ""), (5, 7, 139, ""),
                   (5, 8, 267, ""), (6, 8, 523, ""), (7, 9, 779, ""),
                   (6, 11, 1291, ""), (9, 32, -32, "lower"),
                   (9, 32, 3339, ""), (2, 0, 0, "oob")]),
    10: _HuffTable([(7, 4, -21, ""), (8, 0, -5, ""), (7, 0, -4, ""),
                    (5, 0, -3, ""), (2, 2, -2, ""), (5, 0, 2, ""),
                    (6, 0, 3, ""), (7, 0, 4, ""), (8, 0, 5, ""),
                    (2, 6, 6, ""), (5, 5, 70, ""), (6, 5, 102, ""),
                    (7, 6, 134, ""), (8, 7, 198, ""), (8, 8, 326, ""),
                    (8, 9, 582, ""), (8, 10, 1094, ""),
                    (7, 11, 2118, ""), (8, 32, -22, "lower"),
                    (8, 32, 4166, ""), (2, 0, 0, "oob")]),
    11: _HuffTable([(1, 0, 1, ""), (2, 1, 2, ""), (4, 0, 4, ""),
                    (4, 1, 5, ""), (5, 1, 7, ""), (5, 2, 9, ""),
                    (6, 2, 13, ""), (7, 2, 17, ""), (7, 3, 21, ""),
                    (7, 4, 29, ""), (7, 5, 45, ""), (7, 6, 77, ""),
                    (7, 32, 141, "")]),
    12: _HuffTable([(1, 0, 1, ""), (2, 0, 2, ""), (3, 1, 3, ""),
                    (5, 0, 5, ""), (5, 1, 6, ""), (6, 1, 8, ""),
                    (7, 0, 10, ""), (7, 1, 11, ""), (7, 2, 13, ""),
                    (7, 3, 17, ""), (7, 4, 25, ""), (8, 5, 41, ""),
                    (8, 32, 73, "")]),
    13: _HuffTable([(1, 0, 1, ""), (3, 0, 2, ""), (4, 0, 3, ""),
                    (5, 0, 4, ""), (4, 1, 5, ""), (3, 3, 7, ""),
                    (6, 1, 15, ""), (6, 2, 17, ""), (6, 3, 21, ""),
                    (6, 4, 29, ""), (6, 5, 45, ""), (7, 6, 77, ""),
                    (7, 32, 141, "")]),
    14: _HuffTable([(3, 0, -2, ""), (3, 0, -1, ""), (1, 0, 0, ""),
                    (3, 0, 1, ""), (3, 0, 2, "")]),
    15: _HuffTable([(7, 4, -24, ""), (6, 2, -8, ""), (5, 1, -4, ""),
                    (4, 0, -2, ""), (3, 0, -1, ""), (1, 0, 0, ""),
                    (3, 0, 1, ""), (4, 0, 2, ""), (5, 1, 3, ""),
                    (6, 2, 5, ""), (7, 4, 9, ""),
                    (7, 32, -25, "lower"), (7, 32, 25, "")]),
}


def _decode_symid_table(rdr: _BitReader, n_syms: int) -> _HuffTable | None:
    """Symbol-ID Huffman code table for SBHUFF text regions (T.88
    §7.4.4.1.7): 35 four-bit runcode lengths build a runcode table;
    runcodes then emit one code length per symbol (32 = repeat the
    previous length 3+2bits times, 33 = 3+3bits zeros, 34 = 11+7bits
    zeros); the per-symbol lengths build the ID table canonically.
    Byte-aligns the reader afterwards (spec step 4). Returns ``None``
    when every length is zero (single-symbol degenerate code — the
    caller reads no ID bits)."""
    runlens = [rdr.get_bits(4) for _ in range(35)]
    runtab = _HuffTable([(l, 0, i, "") for i, l in enumerate(runlens)])
    lens: list[int] = []
    prev = 0
    while len(lens) < n_syms:
        c = runtab.decode(rdr)
        if c is _OOB or c > 34:
            raise Jbig2Error("bad symbol-ID runcode")
        if c < 32:
            lens.append(c)
            prev = c
        elif c == 32:
            lens.extend([prev] * (3 + rdr.get_bits(2)))
        elif c == 33:
            lens.extend([0] * (3 + rdr.get_bits(3)))
        else:
            lens.extend([0] * (11 + rdr.get_bits(7)))
    if len(lens) != n_syms:
        raise Jbig2Error("symbol-ID code length overrun")
    rdr.align()
    if not any(lens):
        if n_syms != 1:
            raise Jbig2Error("empty symbol-ID code for several symbols")
        return None
    return _HuffTable([(l, 0, i, "") for i, l in enumerate(lens)])


def _decode_table_segment(payload: bytes) -> _HuffTable:
    """Custom Huffman table segment (type 53, B.2.3): the line set is
    carried in the stream, no standard-table constants involved."""
    if len(payload) < 9:
        raise Jbig2Error("truncated table segment")
    flags = payload[0]
    htoob = flags & 1
    htps = ((flags >> 1) & 7) + 1
    htrs = ((flags >> 4) & 7) + 1
    htlow, hthigh = struct.unpack_from(">ii", payload, 1)
    if hthigh <= htlow:
        raise Jbig2Error("bad table range")
    rdr = _BitReader(payload, 9)
    lines = []
    cur = htlow
    while cur < hthigh:
        preflen = rdr.get_bits(htps)
        rangelen = rdr.get_bits(htrs)
        lines.append((preflen, rangelen, cur, ""))
        if rangelen >= 32:
            break
        cur += 1 << rangelen
    lines.append((rdr.get_bits(htps), 32, htlow - 1, "lower"))
    lines.append((rdr.get_bits(htps), 32, hthigh, ""))
    if htoob:
        lines.append((rdr.get_bits(htps), 0, 0, "oob"))
    return _HuffTable(lines)


# --------------------------------------------- symbol dict / text region

def _huff_symbol_dict(payload: bytes, flags: int,
                      in_syms: list[np.ndarray],
                      tables: list[_HuffTable]) -> list[np.ndarray]:
    """SDHUFF=1 symbol dictionary (§6.5.9): height classes of
    collective bitmaps, uncompressed (BMSIZE=0) or MMR-coded, with
    DH/DW/BMSIZE tables chosen from B.4/B.5, B.2/B.3, B.1 or the
    referred custom table segments."""
    if (flags >> 1) & 1:
        raise Jbig2Error("Huffman refinement/aggregate dictionary "
                         "unsupported")
    it = iter(tables)

    def pick(sel: int, std: dict[int, int]) -> _HuffTable:
        if sel in std:
            return _STD_TABLES[std[sel]]
        if sel == 3:
            try:
                return next(it)
            except StopIteration:
                raise Jbig2Error("missing custom Huffman table") from None
        raise Jbig2Error(f"bad Huffman table selection {sel}")

    dh_tab = pick((flags >> 2) & 3, {0: 4, 1: 5})
    dw_tab = pick((flags >> 4) & 3, {0: 2, 1: 3})
    bm_tab = pick((flags >> 6) & 1, {0: 1})
    pick((flags >> 7) & 1, {0: 1})             # AGGINST (unused, REFAGG=0)
    if len(payload) < 10:
        raise Jbig2Error("truncated symbol dictionary")
    n_ex, n_new = struct.unpack_from(">II", payload, 2)
    if n_new > 100_000 or n_ex > 100_000:
        raise Jbig2Error("implausible symbol counts")
    rdr = _BitReader(payload, 10)
    new_syms: list[np.ndarray] = []
    hcheight = 0
    while len(new_syms) < n_new:
        dh = dh_tab.decode(rdr)
        if dh is _OOB:
            raise Jbig2Error("OOB height-class delta")
        hcheight += dh
        if hcheight <= 0 or hcheight > 10_000:
            raise Jbig2Error(f"bad symbol height {hcheight}")
        symwidth = 0
        widths: list[int] = []
        totwidth = 0
        while True:
            dw = dw_tab.decode(rdr)
            if dw is _OOB:
                break
            symwidth += dw
            if symwidth <= 0 or symwidth > 10_000:
                raise Jbig2Error(f"bad symbol width {symwidth}")
            if len(new_syms) + len(widths) >= n_new:
                raise Jbig2Error("symbol count overrun")
            widths.append(symwidth)
            totwidth += symwidth
        if not widths:
            continue
        bmsize = bm_tab.decode(rdr)
        if bmsize is _OOB or bmsize < 0:
            raise Jbig2Error("bad collective bitmap size")
        rdr.align()
        if bmsize == 0:                        # uncompressed rows
            stride = (totwidth + 7) // 8
            need = stride * hcheight
            raw = payload[rdr.pos:rdr.pos + need]
            if len(raw) < need:
                raise Jbig2Error("collective bitmap overruns stream")
            coll = np.unpackbits(
                np.frombuffer(raw, np.uint8).reshape(hcheight, stride),
                axis=1)[:, :totwidth]
            rdr.pos += need
        else:                                  # MMR-coded
            from .ccitt import CcittError, decode_g4
            try:
                coll = decode_g4(payload[rdr.pos:rdr.pos + bmsize],
                                 totwidth, hcheight)
            except CcittError as e:
                raise Jbig2Error(f"MMR collective bitmap failed: "
                                 f"{e}") from e
            rdr.pos += bmsize
        xoff = 0
        for wdt in widths:
            new_syms.append(coll[:, xoff:xoff + wdt].copy())
            xoff += wdt

    # export runs: Table B.1 in Huffman mode (§6.5.10)
    ex_tab = _STD_TABLES[1]
    all_syms = in_syms + new_syms
    exported: list[np.ndarray] = []
    i = 0
    exflag = False
    while i < len(all_syms) and len(exported) < n_ex:
        run = ex_tab.decode(rdr)
        if run is _OOB or run < 0:
            raise Jbig2Error("bad export run length")
        if exflag:
            exported.extend(all_syms[i:i + run])
        i += run
        exflag = not exflag
    if len(exported) != n_ex:
        raise Jbig2Error("exported symbol count mismatch")
    return exported


def _decode_symbol_dict(payload: bytes,
                        in_syms: list[np.ndarray] | None = None,
                        tables: list[_HuffTable] | None = None
                        ) -> list[np.ndarray]:
    """Symbol dictionary segment (type 0, T.88 §6.5/§7.4.3) →
    exported symbol bitmaps. ``in_syms`` are the symbols imported from
    referred-to dictionaries (SDINSYMS); ``tables`` the custom Huffman
    tables from referred type-53 segments. Arithmetic coding with
    optional single-instance REFAGG refinement (§6.5.8.2), or Huffman
    coding (§6.5.9); Huffman+refinement and multi-instance aggregates
    raise."""
    from .mq import MQDecoder
    if len(payload) < 2:
        raise Jbig2Error("truncated symbol dictionary flags")
    (flags,) = struct.unpack_from(">H", payload, 0)
    sdhuff = flags & 1
    refagg = (flags >> 1) & 1
    template = (flags >> 10) & 3
    rtemplate = (flags >> 12) & 1
    if sdhuff:
        return _huff_symbol_dict(payload, flags, in_syms or [],
                                 tables or [])
    pos = 2
    n_at = 4 if template == 0 else 1
    if len(payload) < pos + 2 * n_at + 8:
        raise Jbig2Error("truncated symbol dictionary")
    at = []
    for i in range(n_at):
        ax = struct.unpack_from(">b", payload, pos)[0]
        ay = struct.unpack_from(">b", payload, pos + 1)[0]
        at.append((ax, ay))
        pos += 2
    rat = list(_REF_NOMINAL_AT)
    if refagg and rtemplate == 0:
        if len(payload) < pos + 4 + 8:
            raise Jbig2Error("truncated SDRAT pixels")
        rat = [(struct.unpack_from(">b", payload, pos)[0],
                struct.unpack_from(">b", payload, pos + 1)[0]),
               (struct.unpack_from(">b", payload, pos + 2)[0],
                struct.unpack_from(">b", payload, pos + 3)[0])]
        pos += 4
    n_ex, n_new = struct.unpack_from(">II", payload, pos)
    pos += 8
    if n_new > 100_000 or n_ex > 100_000:
        raise Jbig2Error("implausible symbol counts")

    dec = MQDecoder(payload[pos:])
    iadh: list[int] = [0] * 512
    iadw: list[int] = [0] * 512
    iaex: list[int] = [0] * 512
    iaai: list[int] = [0] * 512
    gen_cx = [0] * (1 << len(_template_pixels(template, at)))
    in_syms = in_syms or []
    # one context set shared by every aggregate/refinement in the
    # dictionary (§6.5.8.2: contexts are retained between symbols)
    tc = _TextCtx(len(in_syms) + n_new, rtemplate)
    new_syms: list[np.ndarray] = []
    hcheight = 0
    while len(new_syms) < n_new:
        dh = _decode_int(dec, iadh)
        if dh is _OOB:
            raise Jbig2Error("OOB height-class delta")
        hcheight += dh
        if hcheight <= 0 or hcheight > 10_000:
            raise Jbig2Error(f"bad symbol height {hcheight}")
        symwidth = 0
        while True:
            dw = _decode_int(dec, iadw)
            if dw is _OOB:
                break                      # end of height class
            symwidth += dw
            if symwidth <= 0 or symwidth > 10_000:
                raise Jbig2Error(f"bad symbol width {symwidth}")
            if len(new_syms) >= n_new:
                raise Jbig2Error("symbol count overrun")
            if refagg:
                n_refagg = _decode_int(dec, iaai)
                if n_refagg is _OOB or n_refagg < 1:
                    raise Jbig2Error("bad aggregate instance count")
                pool = in_syms + new_syms
                if n_refagg == 1:
                    # §6.5.8.2.2: refine an earlier symbol to this size
                    rid = _decode_iaid(dec, tc.iaid_cx, tc.symcodelen)
                    rdx = _decode_int(dec, tc.iardx)
                    rdy = _decode_int(dec, tc.iardy)
                    if rid >= len(pool) or _OOB in (rdx, rdy):
                        raise Jbig2Error("bad refinement-symbol "
                                         "reference")
                    bmp = _decode_refinement(b"", symwidth, hcheight,
                                             rtemplate, rat, False,
                                             pool[rid], rdx, rdy,
                                             dec=dec, cx=tc.ref_cx)
                else:
                    # §6.5.8.2.1: the symbol is a little text region
                    # drawn from the symbols decoded so far
                    if n_refagg > 10_000:
                        raise Jbig2Error("implausible aggregate count")
                    bmp = _decode_text_instances(
                        dec, tc, pool, symwidth, hcheight, n_refagg,
                        sbstrips=1, refcorner=1, transposed=0,
                        sbcombop=0, sbdefpixel=0, sbdsoffset=0,
                        sbrefine=True, sbrtemplate=rtemplate,
                        sbrat=rat)
            else:
                bmp = _decode_generic_arith(b"", symwidth, hcheight,
                                            template, at, False,
                                            dec=dec, cx=gen_cx)
            new_syms.append(bmp)

    # export flags: alternating runs over (input ++ new) symbols
    all_syms = in_syms + new_syms
    exported: list[np.ndarray] = []
    i = 0
    exflag = 1 == 0
    total = len(all_syms)
    while i < total and len(exported) < n_ex:
        run = _decode_int(dec, iaex)
        if run is _OOB or run < 0:
            raise Jbig2Error("bad export run length")
        if exflag:
            exported.extend(all_syms[i:i + run])
        i += run
        exflag = not exflag
    if len(exported) != n_ex:
        raise Jbig2Error("exported symbol count mismatch")
    return exported


def _decode_text_region(payload: bytes, syms: list[np.ndarray],
                        tables: list[_HuffTable] | None = None):
    """Text region segment (types 4/6/7, T.88 §6.4/§7.4.4) →
    (x, y, w, h, comb, bitmap). Arithmetic or Huffman (SBHUFF) coding;
    arithmetic regions optionally carry SBREFINE per-instance symbol
    refinement (§6.4.11). ``tables``: custom Huffman tables from
    referred type-53 segments, consumed in selector order (§7.4.4.1.2
    — selector value 3, or 1 for RSIZE)."""
    from .mq import MQDecoder
    if len(payload) < 17 + 2 + 4:
        raise Jbig2Error("truncated text region")
    w, h, x, y = struct.unpack_from(">IIII", payload, 0)
    comb = payload[16] & 0x07
    (tflags,) = struct.unpack_from(">H", payload, 17)
    sbhuff = tflags & 1
    sbrefine = (tflags >> 1) & 1
    logsbstrips = (tflags >> 2) & 3
    refcorner = (tflags >> 4) & 3
    transposed = (tflags >> 6) & 1
    sbcombop = (tflags >> 7) & 3
    sbdefpixel = (tflags >> 9) & 1
    sbdsoffset = (tflags >> 10) & 0x1F
    sbrtemplate = (tflags >> 15) & 1
    if sbdsoffset > 15:
        sbdsoffset -= 32                   # 5-bit two's complement
    if w == 0 or h == 0 or w * h > 64_000_000:
        raise Jbig2Error(f"bad text region dims {w}x{h}")
    if not syms:
        raise Jbig2Error("text region without symbol dictionary")
    pos = 19

    huff_sel = None
    if sbhuff:
        (hflags,) = struct.unpack_from(">H", payload, pos)
        pos += 2
        huff_sel = hflags
    sbrat = list(_REF_NOMINAL_AT)
    if sbrefine and sbrtemplate == 0:
        if len(payload) < pos + 4 + 4:
            raise Jbig2Error("truncated SBRAT pixels")
        sbrat = [(struct.unpack_from(">b", payload, pos)[0],
                  struct.unpack_from(">b", payload, pos + 1)[0]),
                 (struct.unpack_from(">b", payload, pos + 2)[0],
                  struct.unpack_from(">b", payload, pos + 3)[0])]
        pos += 4
    (n_inst,) = struct.unpack_from(">I", payload, pos)
    pos += 4

    sbstrips = 1 << logsbstrips
    if sbhuff:
        custom = iter(tables or [])

        def pick(sel: int, std: tuple[int, ...]) -> _HuffTable:
            if sel < len(std):
                return _STD_TABLES[std[sel]]
            try:
                return next(custom)
            except StopIteration:
                raise Jbig2Error("missing custom Huffman table")

        fs_tab = pick(huff_sel & 3, (6, 7))
        ds_tab = pick((huff_sel >> 2) & 3, (8, 9, 10))
        dt_tab = pick((huff_sel >> 4) & 3, (11, 12, 13))
        # refinement-delta tables (§7.4.4.1.2): selectors 0/1 → B.14/
        # B.15, 3 → custom in RDW,RDH,RDX,RDY order; RSIZE bit → B.1
        rdw_tab = pick((huff_sel >> 6) & 3, (14, 15))
        rdh_tab = pick((huff_sel >> 8) & 3, (14, 15))
        rdx_tab = pick((huff_sel >> 10) & 3, (14, 15))
        rdy_tab = pick((huff_sel >> 12) & 3, (14, 15))
        rsize_tab = pick(0 if not ((huff_sel >> 14) & 1) else 3, (1,))

        rdr = _BitReader(payload, pos)
        sym_tab = _decode_symid_table(rdr, len(syms))
        huff = {
            "dt": lambda: dt_tab.decode(rdr),
            "fs": lambda: fs_tab.decode(rdr),
            "ds": lambda: ds_tab.decode(rdr),
            "it": lambda: rdr.get_bits(logsbstrips),
            "sid": (lambda: 0) if sym_tab is None
            else (lambda: sym_tab.decode(rdr)),
            # §6.4.11 Huffman mode: RI is one raw bit; deltas via the
            # RDW/RDH/RDX/RDY tables; BMSIZE via the RSIZE table
            "ri": rdr.get,
            "rdw": lambda: rdw_tab.decode(rdr),
            "rdh": lambda: rdh_tab.decode(rdr),
            "rdx": lambda: rdx_tab.decode(rdr),
            "rdy": lambda: rdy_tab.decode(rdr),
            "rsize": lambda: rsize_tab.decode(rdr),
            "reader": rdr,
        }
        bitmap = _decode_text_instances(
            None, None, syms, w, h, n_inst, sbstrips=sbstrips,
            refcorner=refcorner, transposed=transposed,
            sbcombop=sbcombop, sbdefpixel=sbdefpixel,
            sbdsoffset=sbdsoffset, sbrefine=bool(sbrefine),
            sbrtemplate=sbrtemplate, sbrat=sbrat, huff=huff)
        return x, y, w, h, comb, bitmap

    dec = MQDecoder(payload[pos:])
    tc = _TextCtx(len(syms), sbrtemplate)
    bitmap = _decode_text_instances(
        dec, tc, syms, w, h, n_inst, sbstrips=sbstrips,
        refcorner=refcorner, transposed=transposed, sbcombop=sbcombop,
        sbdefpixel=sbdefpixel, sbdsoffset=sbdsoffset,
        sbrefine=bool(sbrefine), sbrtemplate=sbrtemplate, sbrat=sbrat)
    return x, y, w, h, comb, bitmap


class _TextCtx:
    """Shared text-region arithmetic contexts (one set per region, or
    per symbol dictionary for REFAGG aggregates, §6.5.8.2)."""

    __slots__ = ("iadt", "iafs", "iads", "iait", "iari", "iardw",
                 "iardh", "iardx", "iardy", "iaid_cx", "ref_cx",
                 "symcodelen")

    def __init__(self, n_syms: int, rtemplate: int):
        for name in ("iadt", "iafs", "iads", "iait", "iari", "iardw",
                     "iardh", "iardx", "iardy"):
            setattr(self, name, [0] * 512)
        self.symcodelen = _symcodelen(n_syms)
        self.iaid_cx = [0] * (1 << (self.symcodelen + 1))
        ref_nbits = len(_REF_CODING[rtemplate]) \
            + len(_REF_REFERENCE[rtemplate]) \
            + (2 if rtemplate == 0 else 0)
        self.ref_cx = [0] * (1 << ref_nbits)


def _decode_text_instances(dec, tc: _TextCtx, syms, w: int, h: int,
                           n_inst: int, *, sbstrips: int = 1,
                           refcorner: int = 1, transposed: int = 0,
                           sbcombop: int = 0, sbdefpixel: int = 0,
                           sbdsoffset: int = 0, sbrefine: bool = False,
                           sbrtemplate: int = 0,
                           sbrat=None, huff=None) -> np.ndarray:
    """Text-region instance decoding procedure (T.88 §6.4.5) over an
    open arithmetic decoder and shared contexts — used by text region
    segments and by REFAGG aggregate symbols (§6.5.8.2.1). ``huff``
    (dict of dt/fs/ds/it/sid readers over a _BitReader) switches the
    per-field decodes to SBHUFF Huffman mode; placement logic is
    identical (§6.4.5 is coding-agnostic past step 3b)."""
    if sbrat is None:
        sbrat = list(_REF_NOMINAL_AT)

    def dec_dt():
        return _decode_int(dec, tc.iadt) if huff is None else huff["dt"]()

    def dec_fs():
        return _decode_int(dec, tc.iafs) if huff is None else huff["fs"]()

    def dec_ds():
        return _decode_int(dec, tc.iads) if huff is None else huff["ds"]()

    def dec_it():
        return _decode_int(dec, tc.iait) if huff is None else huff["it"]()

    def dec_sid():
        return _decode_iaid(dec, tc.iaid_cx, tc.symcodelen) \
            if huff is None else huff["sid"]()
    bitmap = np.full((h, w), sbdefpixel, dtype=np.uint8)

    def draw(sym: np.ndarray, xs: int, yt: int) -> None:
        sh, sw = sym.shape
        x0, y0 = max(xs, 0), max(yt, 0)
        x1, y1 = min(xs + sw, w), min(yt + sh, h)
        if x0 >= x1 or y0 >= y1:
            return
        win = bitmap[y0:y1, x0:x1]
        cut = sym[y0 - yt:y1 - yt, x0 - xs:x1 - xs]
        if sbcombop == 0:
            win |= cut
        elif sbcombop == 1:
            win &= cut
        elif sbcombop == 2:
            win ^= cut
        else:
            win[...] = 1 - (win ^ cut)

    stript = dec_dt()
    if stript is _OOB:
        raise Jbig2Error("OOB STRIPT")
    stript = -stript * sbstrips
    firsts = 0
    n_done = 0
    while n_done < n_inst:
        dt = dec_dt()
        if dt is _OOB:
            raise Jbig2Error("OOB strip DT")
        stript += dt * sbstrips
        dfs = dec_fs()
        if dfs is _OOB:
            raise Jbig2Error("OOB first S")
        firsts += dfs
        curs = firsts
        first = True
        while True:
            if not first:
                ids = dec_ds()
                if ids is _OOB:
                    break                  # end of strip
                curs += ids + sbdsoffset
            first = False
            curt = 0 if sbstrips == 1 else dec_it()
            ti = stript + curt
            sid = dec_sid()
            if sid >= len(syms):
                raise Jbig2Error(f"symbol id {sid} out of range")
            sym = syms[sid]
            ri = 0
            if sbrefine:
                ri = huff["ri"]() if huff is not None \
                    else _decode_int(dec, tc.iari)
            if ri:
                # per-instance refinement (§6.4.11): arithmetic mode
                # refines through the shared decoder/context; Huffman
                # mode reads the deltas from the RDW/RDH/RDX/RDY
                # tables, byte-aligns, and refines with a FRESH
                # arithmetic decoder over the next BMSIZE bytes
                if huff is None:
                    rdw = _decode_int(dec, tc.iardw)
                    rdh = _decode_int(dec, tc.iardh)
                    rdx = _decode_int(dec, tc.iardx)
                    rdy = _decode_int(dec, tc.iardy)
                else:
                    rdw = huff["rdw"]()
                    rdh = huff["rdh"]()
                    rdx = huff["rdx"]()
                    rdy = huff["rdy"]()
                if _OOB in (rdw, rdh, rdx, rdy):
                    raise Jbig2Error("OOB refinement delta")
                rw = sym.shape[1] + rdw
                rh = sym.shape[0] + rdh
                if rw <= 0 or rh <= 0 or rw * rh > 64_000_000:
                    raise Jbig2Error(f"bad refined symbol dims {rw}x{rh}")
                if huff is None:
                    sym = _decode_refinement(
                        b"", rw, rh, sbrtemplate, sbrat, False, sym,
                        (rdw >> 1) + rdx, (rdh >> 1) + rdy,
                        dec=dec, cx=tc.ref_cx)
                else:
                    bmsize = huff["rsize"]()
                    if bmsize is _OOB or bmsize < 0:
                        raise Jbig2Error("bad refinement BMSIZE")
                    rdr = huff["reader"]
                    rdr.align()
                    end = rdr.pos + bmsize
                    if end > len(rdr.data):
                        raise Jbig2Error(
                            "refinement data overruns stream")
                    sym = _decode_refinement(
                        rdr.data[rdr.pos:end], rw, rh, sbrtemplate,
                        sbrat, False, sym,
                        (rdw >> 1) + rdx, (rdh >> 1) + rdy)
                    rdr.pos = end
                    rdr.bit = 0
            sh, sw = sym.shape
            if transposed:
                # S runs down the page, T across; "bottom" corners
                # advance CURS before drawing (T.88 6.4.5 step 3c iv)
                x_off = ti - (sw - 1 if refcorner in (2, 3) else 0)
                if refcorner in (0, 2):    # BL/BR: advance before
                    curs += sh - 1
                    draw(sym, x_off, curs - sh + 1)
                else:                      # TL/TR: advance after
                    draw(sym, x_off, curs)
                    curs += sh - 1
            else:
                # S runs across, T down; "right" corners advance
                # CURS before drawing (step 3c iv)
                y_off = ti - (sh - 1 if refcorner in (0, 2) else 0)
                if refcorner in (2, 3):    # BR/TR: advance before
                    curs += sw - 1
                    draw(sym, curs - sw + 1, y_off)
                else:                      # BL/TL: advance after
                    draw(sym, curs, y_off)
                    curs += sw - 1
            n_done += 1
            if n_done > n_inst:
                raise Jbig2Error("instance count overrun")
    return bitmap


# ------------------------------------------------------------- halftones

def _pattern_at(hdpw: int, template: int) -> list[tuple[int, int]]:
    """Pattern-dictionary AT pixels (T.88 §6.7.5): A1 = (-HDPW, 0),
    A2..A4 nominal when the 16-pixel template 0 is in use."""
    at = [(-hdpw, 0)]
    if template == 0:
        at += [(-3, -1), (2, -2), (-2, -2)]
    return at


def _decode_pattern_dict(payload: bytes) -> list[np.ndarray]:
    """Pattern dictionary segment (type 16, T.88 §6.7) → list of
    HDPW×HDPH pattern bitmaps (index = gray value)."""
    if len(payload) < 7:
        raise Jbig2Error("truncated pattern dictionary")
    flags = payload[0]
    hdmmr = flags & 1
    template = (flags >> 1) & 3
    hdpw, hdph = payload[1], payload[2]
    (graymax,) = struct.unpack_from(">I", payload, 3)
    if hdpw == 0 or hdph == 0:
        raise Jbig2Error(f"bad pattern dims {hdpw}x{hdph}")
    if graymax > 4095:
        raise Jbig2Error(f"implausible GRAYMAX {graymax}")
    cw = (graymax + 1) * hdpw
    if cw * hdph > 64_000_000:
        raise Jbig2Error("pattern dictionary too large")
    data = payload[7:]
    if hdmmr:
        from .ccitt import CcittError, decode_g4
        try:
            collective = decode_g4(data, cw, hdph)
        except CcittError as e:
            raise Jbig2Error(f"MMR pattern dict failed: {e}") from e
    else:
        if hdpw > 128:
            raise Jbig2Error("pattern width exceeds AT range")
        collective = _decode_generic_arith(data, cw, hdph, template,
                                           _pattern_at(hdpw, template),
                                           False)
    return [collective[:, k * hdpw:(k + 1) * hdpw].copy()
            for k in range(graymax + 1)]


def _decode_gray_image(data: bytes, w: int, h: int, template: int,
                       bpp: int) -> np.ndarray:
    """Gray-scale image decoding (T.88 Annex C.5, arithmetic): BPP
    gray-coded bitplanes MSB-first through ONE decoder and shared
    context, then Gray→binary conversion."""
    from .mq import MQDecoder
    dec = MQDecoder(data)
    at = _NOMINAL_AT[template]
    cx = [0] * (1 << len(_template_pixels(template, at)))
    msb = _decode_generic_arith(b"", w, h, template, at, False,
                                dec=dec, cx=cx)
    vals = msb.astype(np.int32) << (bpp - 1)
    prev = msb
    for j in range(bpp - 2, -1, -1):
        plane = _decode_generic_arith(b"", w, h, template, at, False,
                                      dec=dec, cx=cx)
        prev = plane ^ prev                     # C.5: Gray decoding
        vals |= prev.astype(np.int32) << j
    return vals


def _decode_halftone_region(payload: bytes, pats: list[np.ndarray]):
    """Halftone region segment (types 20/22/23, T.88 §6.6) →
    (x, y, w, h, comb, bitmap). Arithmetic, no skip plane."""
    if len(payload) < 38:
        raise Jbig2Error("truncated halftone region")
    w, h, x, y = struct.unpack_from(">IIII", payload, 0)
    comb = payload[16] & 0x07
    flags = payload[17]
    hmmr = flags & 1
    template = (flags >> 1) & 3
    henableskip = (flags >> 3) & 1
    hcombop = (flags >> 4) & 7
    hdefpixel = (flags >> 7) & 1
    hgw, hgh = struct.unpack_from(">II", payload, 18)
    hgx, hgy = struct.unpack_from(">ii", payload, 26)
    hrx, hry = struct.unpack_from(">HH", payload, 34)
    if hmmr:
        raise Jbig2Error("MMR halftone region unsupported")
    if henableskip:
        raise Jbig2Error("HENABLESKIP halftone unsupported")
    if w == 0 or h == 0 or w * h > 64_000_000:
        raise Jbig2Error(f"bad halftone region dims {w}x{h}")
    if hgw == 0 or hgh == 0 or hgw * hgh > 16_000_000:
        raise Jbig2Error(f"bad halftone grid {hgw}x{hgh}")
    if not pats:
        raise Jbig2Error("halftone region without pattern dictionary")
    bpp = max((len(pats) - 1).bit_length(), 1)
    vals = _decode_gray_image(payload[38:], hgw, hgh, template, bpp)
    np.clip(vals, 0, len(pats) - 1, out=vals)

    bitmap = np.full((h, w), hdefpixel, dtype=np.uint8)
    ph, pw = pats[0].shape

    def draw(pat: np.ndarray, xs: int, yt: int) -> None:
        x0, y0 = max(xs, 0), max(yt, 0)
        x1, y1 = min(xs + pw, w), min(yt + ph, h)
        if x0 >= x1 or y0 >= y1:
            return
        win = bitmap[y0:y1, x0:x1]
        cut = pat[y0 - yt:y1 - yt, x0 - xs:x1 - xs]
        if hcombop == 0:
            win |= cut
        elif hcombop == 1:
            win &= cut
        elif hcombop == 2:
            win ^= cut
        elif hcombop == 3:
            win[...] = 1 - (win ^ cut)
        else:
            win[...] = cut

    # grid placement (§6.6.5.1): fixed-point 1/256-pixel grid vectors
    for m in range(hgh):
        gx = hgx + m * hry
        gy = hgy + m * hrx
        row = vals[m]
        for n in range(hgw):
            draw(pats[row[n]], gx >> 8, gy >> 8)
            gx += hrx
            gy -= hry
    return x, y, w, h, comb, bitmap


# ------------------------------------------------------------ refinement

# refinement templates (T.88 §6.3.5.3, figures 12/13): pixels read
# from the bitmap being decoded (causal) and from the reference
# bitmap. Template 0 additionally has one AT pixel in each plane.
_REF_CODING = {
    0: [(0, -1), (1, -1), (-1, 0)],
    1: [(-1, -1), (0, -1), (1, -1), (-1, 0)],
}
_REF_REFERENCE = {
    0: [(0, -1), (1, -1), (-1, 0), (0, 0), (1, 0),
        (-1, 1), (0, 1), (1, 1)],
    1: [(0, -1), (-1, 0), (0, 0), (1, 0), (0, 1), (1, 1)],
}
_REF_NOMINAL_AT = [(-1, -1), (-1, -1)]         # A1 (coding), A2 (reference)
# TPGRON SLTP pseudo-contexts (T.88 §6.3.5.6) in this module's bit
# layout (coding plane MSB-first, then reference plane)
_TPGRON_CTX = {0: 0x0008, 1: 0x0008}


def _refine_bits(w: int, h: int, template: int,
                 at: list[tuple[int, int]], tpgron: bool,
                 ref: np.ndarray, dx: int, dy: int,
                 out_rows: list[list[int]], emit) -> None:
    """Shared refinement walk (T.88 §6.3.5.6): ``emit(ctx, x, y)``
    decodes into / encodes from ``out_rows[y][x]``. The reference
    pixel for output (x, y) is ``ref[y - dy, x - dx]`` (0 outside)."""
    coding = list(_REF_CODING[template])
    reference = list(_REF_REFERENCE[template])
    if template == 0:
        coding.append(at[0])
        reference.append(at[1])
    rh, rw = ref.shape
    rrows = ref.tolist()

    def rpix(xx: int, yy: int) -> int:
        return rrows[yy][xx] if 0 <= xx < rw and 0 <= yy < rh else 0

    ltp = 0
    sltp_ctx = _TPGRON_CTX[template]
    for y in range(h):
        if tpgron:
            ltp ^= emit(sltp_ctx, -1, y)
        row = out_rows[y]
        for x in range(w):
            if ltp:
                # typical pixel: uniform 3x3 reference neighborhood
                # is copied without coding (§6.3.5.6 step 3b)
                s = sum(rpix(x - dx + i, y - dy + j)
                        for j in (-1, 0, 1) for i in (-1, 0, 1))
                if s == 0:
                    row[x] = 0
                    continue
                if s == 9:
                    row[x] = 1
                    continue
            ctx = 0
            for cdx, cdy in coding:
                xx, yy = x + cdx, y + cdy
                ctx = (ctx << 1) | (out_rows[yy][xx]
                                    if 0 <= xx < w and 0 <= yy < h
                                    and (cdy < 0 or cdx < 0) else 0)
            for rdx, rdy in reference:
                ctx = (ctx << 1) | rpix(x - dx + rdx, y - dy + rdy)
            row[x] = emit(ctx, x, y)


def _decode_refinement(data: bytes, w: int, h: int, template: int,
                       at: list[tuple[int, int]], tpgron: bool,
                       ref: np.ndarray, dx: int = 0, dy: int = 0, *,
                       dec=None, cx: list[int] | None = None
                       ) -> np.ndarray:
    """Refinement region decoding procedure (T.88 §6.3)."""
    from .mq import MQDecoder
    if dec is None:
        dec = MQDecoder(data)
    nbits = len(_REF_CODING[template]) + len(_REF_REFERENCE[template]) \
        + (2 if template == 0 else 0)
    if cx is None:
        cx = [0] * (1 << nbits)
    rows = [[0] * w for _ in range(h)]
    decode = dec.decode

    def emit(ctx: int, x: int, y: int) -> int:
        return decode(cx, ctx)

    _refine_bits(w, h, template, at, tpgron, ref, dx, dy, rows, emit)
    return np.asarray(rows, dtype=np.uint8)


def _parse_refinement_region(payload: bytes):
    """Refinement region segment (types 40/42/43, §7.4.7) → deferred
    decode spec; the reference bitmap is the page region under the
    region's location at composition time (§6.3.2)."""
    if len(payload) < 18:
        raise Jbig2Error("truncated refinement region")
    w, h, x, y = struct.unpack_from(">IIII", payload, 0)
    comb = payload[16] & 0x07
    rflags = payload[17]
    template = rflags & 1
    tpgron = bool((rflags >> 1) & 1)
    if w == 0 or h == 0 or w * h > 64_000_000:
        raise Jbig2Error(f"bad refinement region dims {w}x{h}")
    pos = 18
    at = list(_REF_NOMINAL_AT)
    if template == 0:
        if len(payload) < 22:
            raise Jbig2Error("truncated refinement AT pixels")
        at = [(struct.unpack_from(">b", payload, 18)[0],
               struct.unpack_from(">b", payload, 19)[0]),
              (struct.unpack_from(">b", payload, 20)[0],
               struct.unpack_from(">b", payload, 21)[0])]
        pos = 22
    data = payload[pos:]

    def run(ref: np.ndarray) -> np.ndarray:
        return _decode_refinement(data, w, h, template, at, tpgron, ref)

    return x, y, w, h, comb, run


def decode_jbig2(data: bytes, *, globals_data: bytes = b"",
                 width: int | None = None,
                 height: int | None = None) -> np.ndarray:
    """Embedded JBIG2 stream(s) → (h, w) uint8 bitmap, 1 = black.

    ``globals_data`` is the PDF /JBIG2Globals stream (shared segments,
    parsed first). ``width``/``height`` crop/validate against the PDF
    /Width /Height when given (page-info height may be "unknown" /
    striped, in which case region extents define it).
    """
    page_w = page_h = None
    default_black = False
    page: np.ndarray | None = None
    regions: list[tuple[int, int, int, int, int, np.ndarray]] = []
    sym_dicts: dict[int, list[np.ndarray]] = {}
    pat_dicts: dict[int, list[np.ndarray]] = {}
    tab_segs: dict[int, _HuffTable] = {}

    for blob in (globals_data, data):
        if not blob:
            continue
        for seg_num, seg_type, refs, _pg, payload in \
                _parse_segment_headers(blob):
            if seg_type == _PAGE_INFO:
                if len(payload) < 17:
                    raise Jbig2Error("truncated page info")
                page_w, page_h = struct.unpack_from(">II", payload, 0)
                default_black = bool((payload[16] >> 2) & 1)
            elif seg_type in _GENERIC:
                regions.append(_decode_generic_region(payload))
            elif seg_type == 0:
                sym_dicts[seg_num] = _decode_symbol_dict(
                    payload,
                    [s for r in refs for s in sym_dicts.get(r, [])],
                    [tab_segs[r] for r in refs if r in tab_segs])
            elif seg_type == 53:
                tab_segs[seg_num] = _decode_table_segment(payload)
            elif seg_type in _TEXT:
                syms = [s for r in refs for s in sym_dicts.get(r, [])]
                if not syms:       # tolerate encoders with absent refs
                    syms = [s for d in sym_dicts.values() for s in d]
                regions.append(_decode_text_region(
                    payload, syms,
                    [tab_segs[r] for r in refs if r in tab_segs]))
            elif seg_type == 16:
                pat_dicts[seg_num] = _decode_pattern_dict(payload)
            elif seg_type in _HALFTONE:
                pats = next((pat_dicts[r] for r in refs
                             if r in pat_dicts), None)
                if pats is None:   # tolerate encoders with absent refs
                    pats = next(iter(pat_dicts.values()), [])
                regions.append(_decode_halftone_region(payload, pats))
            elif seg_type in (40, 42, 43):     # refinement regions
                regions.append(_parse_refinement_region(payload))
            elif seg_type in (_END_PAGE, _END_STRIPE, _END_FILE, 62):
                continue
            # tables/extension/profiles (53, 52): ignorable here

    if not regions:
        raise Jbig2Error("no decodable region segments")
    if page_w in (None, 0, 0xFFFFFFFF):
        page_w = max(x + w for x, _, w, _, _, _ in regions)
    if page_h in (None, 0, 0xFFFFFFFF):   # striped / unknown height
        page_h = max(y + h for _, y, _, h, _, _ in regions)
    if width:
        page_w = max(page_w, width)
    if height:
        page_h = max(page_h, height)
    if page_w * page_h > 64_000_000:
        raise Jbig2Error(f"bad page dims {page_w}x{page_h}")

    page = np.full((page_h, page_w), 1 if default_black else 0,
                   dtype=np.uint8)
    for x, y, w, h, comb, bitmap in regions:
        if y + h > page_h or x + w > page_w:
            raise Jbig2Error("region outside page bitmap")
        win = page[y:y + h, x:x + w]
        if callable(bitmap):       # refinement: page-so-far is the ref
            bitmap = bitmap(win.copy())
        if comb == 0:      # OR
            win |= bitmap
        elif comb == 1:    # AND
            win &= bitmap
        elif comb == 2:    # XOR
            win ^= bitmap
        elif comb == 3:    # XNOR
            win[...] = 1 - (win ^ bitmap)
        else:              # REPLACE
            win[...] = bitmap
    if width and height:
        return page[:height, :width]
    return page


def _segment(seg_num: int, seg_type: int, payload: bytes,
             page: int = 1, refs: tuple[int, ...] = ()) -> bytes:
    head = struct.pack(">IB", seg_num, seg_type & 0x3F)
    head += struct.pack(">B", len(refs) << 5)    # short-form ref count
    head += bytes(refs)                          # 1-byte refs (num<=256)
    head += struct.pack(">B", page)    # 1-byte page association
    head += struct.pack(">I", len(payload))
    return head + payload


def _encode_generic_bits(enc, cx: list[int], img: np.ndarray,
                         template: int, at, tpgdon: bool) -> None:
    """Arithmetic generic-region coding of one bitmap into an open
    encoder (shared by the standalone region and symbol-dictionary
    encoders)."""
    h, w = img.shape
    pix = _template_pixels(template, at)
    rows = img.tolist()
    sltp_ctx = _TPGDON_CTX[template]
    ltp = 0
    encode = enc.encode
    for y in range(h):
        if tpgdon:
            prev = rows[y - 1] if y > 0 else [0] * w
            typical = 1 if rows[y] == prev else 0
            encode(cx, sltp_ctx, typical ^ ltp)
            ltp = typical
            if ltp:
                continue
        row = rows[y]
        for x in range(w):
            ctx = 0
            for dx, dy in pix:
                xx = x + dx
                yy = y + dy
                # templates are causal (AT validated at decode), so an
                # in-bounds read only ever touches already-coded pixels
                if 0 <= xx < w and yy >= 0:
                    ctx = (ctx << 1) | rows[yy][xx]
                else:
                    ctx <<= 1
            encode(cx, ctx, row[x])


def encode_jbig2_arith(img: np.ndarray, template: int = 0,
                       tpgdon: bool = False) -> bytes:
    """(h, w) {0,1} bitmap (1=black) → embedded JBIG2 stream with one
    arithmetic-coded immediate lossless generic region (nominal AT
    pixels). ``decode(encode(x)) == x`` is the locked codec property;
    with ``tpgdon`` the typical-prediction SLTP path is exercised."""
    from .mq import MQEncoder
    img = (np.asarray(img) != 0).astype(np.uint8)
    h, w = img.shape
    at = _NOMINAL_AT[template]
    enc = MQEncoder()
    cx = [0] * (1 << len(_template_pixels(template, at)))
    _encode_generic_bits(enc, cx, img, template, at, tpgdon)
    data = enc.flush()
    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x01" + b"\x00\x00"
    region_info = struct.pack(">IIII", w, h, 0, 0) + b"\x00"  # comb OR
    gflags = bytes([(template & 3) << 1 | (0x08 if tpgdon else 0)])
    at_bytes = b"".join(struct.pack(">bb", ax, ay) for ax, ay in at)
    region = region_info + gflags + at_bytes + data
    return (_segment(1, _PAGE_INFO, page_info) +
            _segment(2, 39, region) +
            _segment(3, _END_PAGE, b""))


def encode_jbig2_mmr(img: np.ndarray) -> bytes:
    """(h, w) {0,1} bitmap (1=black) → embedded JBIG2 stream
    (page info + one immediate lossless MMR generic region)."""
    from .ccitt import encode_g4
    img = (np.asarray(img) != 0).astype(np.uint8)
    h, w = img.shape
    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x01" + b"\x00\x00"
    region_info = struct.pack(">IIII", w, h, 0, 0) + b"\x00"  # comb OR
    gflags = b"\x01"                                          # MMR=1
    region = region_info + gflags + encode_g4(img)
    return (_segment(1, _PAGE_INFO, page_info) +
            _segment(2, 39, region) +
            _segment(3, _END_PAGE, b""))


def encode_jbig2_text_page(symbols: list[np.ndarray],
                           placements: list[tuple[int, int, int]],
                           page_w: int, page_h: int, *,
                           refcorner: int = 1,
                           transposed: bool = False,
                           refine: dict[int, np.ndarray] | None = None
                           ) -> bytes:
    """Fixture encoder: symbol dictionary + text region (T.88 §6.5 /
    §6.4, arithmetic coding, SBSTRIPS=1, comb OR).

    ``placements`` are (symbol_index, s, t) instance anchors in the
    caller's symbol order and the chosen ``refcorner`` convention
    (0=BL 1=TL 2=BR 3=TR; ``transposed`` swaps the roles of s/t).
    The dictionary stores symbols sorted by (height, width) as the
    standard requires; instance ids are remapped internally.
    ``refine`` maps a placement index to a target bitmap: the region
    is coded with SBREFINE=1 and those instances carry a per-instance
    refinement of their symbol into the target (§6.4.11).
    """
    from .mq import MQEncoder
    syms = [(np.asarray(s) != 0).astype(np.uint8) for s in symbols]
    if not syms:
        raise Jbig2Error("need at least one symbol")
    order = sorted(range(len(syms)),
                   key=lambda i: (syms[i].shape[0], syms[i].shape[1], i))
    remap = {orig: new for new, orig in enumerate(order)}

    # ---- symbol dictionary payload
    template = 0
    at = _NOMINAL_AT[template]
    enc = MQEncoder()
    iadh: list[int] = [0] * 512
    iadw: list[int] = [0] * 512
    iaex: list[int] = [0] * 512
    gen_cx = [0] * (1 << len(_template_pixels(template, at)))
    hcheight = 0
    i = 0
    while i < len(order):
        h = syms[order[i]].shape[0]
        _encode_int(enc, iadh, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(order) and syms[order[i]].shape[0] == h:
            w = syms[order[i]].shape[1]
            _encode_int(enc, iadw, w - symwidth)
            symwidth = w
            _encode_generic_bits(enc, gen_cx, syms[order[i]],
                                 template, at, False)
            i += 1
        _encode_int(enc, iadw, _OOB)
    _encode_int(enc, iaex, 0)                  # first run: not exported
    _encode_int(enc, iaex, len(order))         # export all new symbols
    flags = (template & 3) << 10               # SDHUFF=0 REFAGG=0
    sd = struct.pack(">H", flags)
    sd += b"".join(struct.pack(">bb", ax, ay) for ax, ay in at)
    sd += struct.pack(">II", len(order), len(order))
    sd += enc.flush()

    # ---- text region payload (SBSTRIPS=1 -> no IAIT)
    sorted_syms = [syms[o] for o in order]
    symcodelen = _symcodelen(len(sorted_syms))
    enc = MQEncoder()
    iadt: list[int] = [0] * 512
    iafs: list[int] = [0] * 512
    iads: list[int] = [0] * 512
    iari: list[int] = [0] * 512
    iardw: list[int] = [0] * 512
    iardh: list[int] = [0] * 512
    iardx: list[int] = [0] * 512
    iardy: list[int] = [0] * 512
    iaid_cx: list[int] = [0] * (1 << (symcodelen + 1))
    sbrtemplate = 0
    sbrat = list(_REF_NOMINAL_AT)
    ref_nbits = len(_REF_CODING[sbrtemplate]) \
        + len(_REF_REFERENCE[sbrtemplate]) + 2
    ref_cx: list[int] = [0] * (1 << ref_nbits)

    inst = sorted((t, s, remap[sid], idx)
                  for idx, (sid, s, t) in enumerate(placements))
    _encode_int(enc, iadt, 0)                  # STRIPT init -> 0
    stript = 0
    firsts = 0
    k = 0
    while k < len(inst):
        t = inst[k][0]
        _encode_int(enc, iadt, t - stript)
        stript = t
        strip = [e for e in inst if e[0] == t]
        first = True
        curs = 0
        for _, s, sid, idx in strip:
            sym = sorted_syms[sid]
            target = refine.get(idx) if refine else None
            drawn = sym if target is None else \
                (np.asarray(target) != 0).astype(np.uint8)
            # the transmitted S is the left (top if transposed) edge
            # for EVERY refcorner — the decoder's advance-before /
            # advance-after orders both draw the edge at the received
            # value and leave CURS at edge + extent - 1
            adv = (drawn.shape[0] if transposed else drawn.shape[1]) - 1
            if first:
                _encode_int(enc, iafs, s - firsts)
                firsts = s
                first = False
            else:
                _encode_int(enc, iads, s - curs)
            curs = s + adv
            _encode_iaid(enc, iaid_cx, symcodelen, sid)
            if refine is not None:
                _encode_int(enc, iari, 0 if target is None else 1)
                if target is not None:
                    rdw = drawn.shape[1] - sym.shape[1]
                    rdh = drawn.shape[0] - sym.shape[0]
                    _encode_int(enc, iardw, rdw)
                    _encode_int(enc, iardh, rdh)
                    _encode_int(enc, iardx, 0)
                    _encode_int(enc, iardy, 0)
                    rows = drawn.tolist()

                    def emit(ctx, xx, yy, _rows=rows):
                        b = _rows[yy][xx]
                        enc.encode(ref_cx, ctx, b)
                        return b

                    _refine_bits(drawn.shape[1], drawn.shape[0],
                                 sbrtemplate, sbrat, False, sym,
                                 rdw >> 1, rdh >> 1, rows, emit)
        _encode_int(enc, iads, _OOB)           # end of strip
        k += len(strip)

    tflags = (refcorner & 3) << 4
    if transposed:
        tflags |= 1 << 6
    if refine is not None:
        tflags |= 1 << 1                       # SBREFINE
    tr = struct.pack(">IIII", page_w, page_h, 0, 0) + b"\x00"  # comb OR
    tr += struct.pack(">H", tflags)
    if refine is not None:                     # SBRTEMPLATE=0 -> SBRAT
        tr += b"".join(struct.pack(">bb", ax, ay) for ax, ay in sbrat)
    tr += struct.pack(">I", len(inst))
    tr += enc.flush()

    page_info = struct.pack(">IIII", page_w, page_h, 0, 0) \
        + b"\x01" + b"\x00\x00"
    return (_segment(1, _PAGE_INFO, page_info) +
            _segment(2, 0, sd) +
            _segment(3, 4, tr, refs=(2,)) +
            _segment(4, _END_PAGE, b""))


def encode_jbig2_halftone(values: np.ndarray,
                          patterns: list[np.ndarray], *,
                          template: int = 0,
                          combop: int = 0) -> bytes:
    """Fixture encoder: pattern dictionary + halftone region (T.88
    §6.7/§6.6, arithmetic coding, axis-aligned unit grid).

    ``values`` is the (HGH, HGW) gray-value grid indexing into
    ``patterns`` (equal-shape bitmaps, square for gapless tiling —
    the §6.6.5.1 grid steps x by HRX per column and y by HRX per
    row). The locked property is decode(encode(vals, pats)) ==
    the composed tiling.
    """
    from .mq import MQEncoder
    vals = np.asarray(values, dtype=np.int64)
    pats = [(np.asarray(p) != 0).astype(np.uint8) for p in patterns]
    if not pats or vals.ndim != 2:
        raise Jbig2Error("need a 2-D value grid and patterns")
    ph, pw = pats[0].shape
    if any(p.shape != (ph, pw) for p in pats):
        raise Jbig2Error("patterns must share one shape")
    if pw > 128 or pw == 0 or ph == 0:
        raise Jbig2Error("pattern width outside AT range")
    if vals.min() < 0 or vals.max() >= len(pats):
        raise Jbig2Error("gray value out of pattern range")
    hgh, hgw = vals.shape
    graymax = len(pats) - 1
    bpp = max(graymax.bit_length(), 1)

    # ---- pattern dictionary: collective bitmap, A1 = (-HDPW, 0)
    enc = MQEncoder()
    at = _pattern_at(pw, template)
    cx = [0] * (1 << len(_template_pixels(template, at)))
    collective = np.concatenate(pats, axis=1)
    _encode_generic_bits(enc, cx, collective, template, at, False)
    pd = bytes([(template & 3) << 1, pw, ph]) \
        + struct.pack(">I", graymax) + enc.flush()

    # ---- halftone region: gray-coded bitplanes, shared encoder/context
    enc = MQEncoder()
    at = _NOMINAL_AT[template]
    cx = [0] * (1 << len(_template_pixels(template, at)))
    planes = [((vals >> j) & 1).astype(np.uint8) for j in range(bpp)]
    prev = planes[bpp - 1]
    _encode_generic_bits(enc, cx, prev, template, at, False)
    for j in range(bpp - 2, -1, -1):
        _encode_generic_bits(enc, cx, planes[j] ^ prev,
                             template, at, False)   # C.5 Gray coding
        prev = planes[j]
    page_w, page_h = hgw * pw, hgh * ph
    hflags = ((template & 3) << 1) | ((combop & 7) << 4)
    ht = struct.pack(">IIII", page_w, page_h, 0, 0) + b"\x00"  # comb OR
    ht += bytes([hflags])
    ht += struct.pack(">IIiiHH", hgw, hgh, 0, 0, pw << 8, 0)
    ht += enc.flush()

    page_info = struct.pack(">IIII", page_w, page_h, 0, 0) \
        + b"\x01" + b"\x00\x00"
    return (_segment(1, _PAGE_INFO, page_info) +
            _segment(2, 16, pd) +
            _segment(3, 23, ht, refs=(2,)) +
            _segment(4, _END_PAGE, b""))


def encode_jbig2_refinement(base: np.ndarray, refined: np.ndarray, *,
                            template: int = 0,
                            tpgron: bool = False) -> bytes:
    """Fixture encoder: arithmetic generic region (the base image)
    followed by a refinement region (type 43) that REPLACEs it with
    ``refined``, using the page-so-far as the reference (T.88 §6.3).
    With ``tpgron`` the encoder emits LTP=1 for rows whose uniform-
    reference pixels already match the prediction, exercising the
    typical-pixel fast path."""
    from .mq import MQEncoder
    base = (np.asarray(base) != 0).astype(np.uint8)
    refined = (np.asarray(refined) != 0).astype(np.uint8)
    if base.shape != refined.shape:
        raise Jbig2Error("base/refined shape mismatch")
    if template not in (0, 1):
        raise Jbig2Error(f"bad refinement template {template}")
    h, w = base.shape

    # base: one arithmetic generic region (template 0, nominal AT)
    gat = _NOMINAL_AT[0]
    enc = MQEncoder()
    cx = [0] * (1 << len(_template_pixels(0, gat)))
    _encode_generic_bits(enc, cx, base, 0, gat, False)
    region_info = struct.pack(">IIII", w, h, 0, 0) + b"\x00"
    gen = region_info + bytes([0]) \
        + b"".join(struct.pack(">bb", ax, ay) for ax, ay in gat) \
        + enc.flush()

    # refinement: shared walk with an encoding emit()
    at = list(_REF_NOMINAL_AT)
    nbits = len(_REF_CODING[template]) + len(_REF_REFERENCE[template]) \
        + (2 if template == 0 else 0)
    enc = MQEncoder()
    cx = [0] * (1 << nbits)
    rows = refined.tolist()
    rrows = base.tolist()

    def rpix(xx: int, yy: int) -> int:
        return rrows[yy][xx] if 0 <= xx < w and 0 <= yy < h else 0

    def row_typical(y: int) -> int:
        for x in range(w):
            s = sum(rpix(x + i, y + j)
                    for j in (-1, 0, 1) for i in (-1, 0, 1))
            if (s == 0 and rows[y][x]) or (s == 9 and not rows[y][x]):
                return 0
        return 1

    ltp = [0]

    def emit(ctx: int, x: int, y: int) -> int:
        if x < 0:                              # SLTP decision bit
            d = row_typical(y)
            bit = d ^ ltp[0]
            enc.encode(cx, ctx, bit)
            ltp[0] = d
            return bit
        b = rows[y][x]
        enc.encode(cx, ctx, b)
        return b

    _refine_bits(w, h, template, at, tpgron, base, 0, 0, rows, emit)
    rflags = template | (2 if tpgron else 0)
    ref_seg = struct.pack(">IIII", w, h, 0, 0) + bytes([4])  # REPLACE
    ref_seg += bytes([rflags])
    if template == 0:
        ref_seg += b"".join(struct.pack(">bb", ax, ay) for ax, ay in at)
    ref_seg += enc.flush()

    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x01" + b"\x00\x00"
    return (_segment(1, _PAGE_INFO, page_info) +
            _segment(2, 39, gen) +
            _segment(3, 43, ref_seg) +
            _segment(4, _END_PAGE, b""))


def encode_jbig2_refagg_page(base_symbols: list[np.ndarray],
                             refined: list,
                             placements: list[tuple[int, int, int]],
                             page_w: int, page_h: int) -> bytes:
    """Fixture encoder: generic symbol dictionary + a REFAGG symbol
    dictionary (T.88 §6.5.8.2), then a text region drawing the new
    symbols.

    ``refined`` entries are either ``(base_index, target_bitmap)`` —
    a single-instance refinement of a dict-1 symbol — or
    ``("agg", [(base_index, s, t), ...], (w, h))`` — a multi-instance
    aggregate composing dict-1 symbols at top-left anchors into a
    w×h symbol (§6.5.8.2.1). ``placements`` are (refined_index, s, t)
    top-left anchors against the caller's ``refined`` order. IDs are
    remapped internally to the sorted dictionary orders the standard
    requires."""
    from .mq import MQEncoder
    base = [(np.asarray(s) != 0).astype(np.uint8) for s in base_symbols]
    specs = []
    for entry in refined:
        if entry[0] == "agg":
            _, inst, (aw, ah) = entry
            tgt = np.zeros((ah, aw), np.uint8)
            for bi, s, t in inst:
                g = base[bi]
                x1 = min(s + g.shape[1], aw)
                y1 = min(t + g.shape[0], ah)
                if s < aw and t < ah:
                    tgt[max(t, 0):y1, max(s, 0):x1] |= \
                        g[max(-t, 0):y1 - t, max(-s, 0):x1 - s]
            specs.append(("agg", inst, tgt))
        else:
            bi, tgt = entry
            specs.append(("refine", bi,
                          (np.asarray(tgt) != 0).astype(np.uint8)))
    targets = [sp[2] for sp in specs]
    if not base or not targets:
        raise Jbig2Error("need base and refined symbols")

    # ---- dict 1: generic coding of the base symbols (sorted order)
    order1 = sorted(range(len(base)),
                    key=lambda i: (base[i].shape[0], base[i].shape[1], i))
    remap1 = {orig: new for new, orig in enumerate(order1)}
    template = 0
    at = _NOMINAL_AT[template]
    enc = MQEncoder()
    iadh: list[int] = [0] * 512
    iadw: list[int] = [0] * 512
    iaex: list[int] = [0] * 512
    gen_cx = [0] * (1 << len(_template_pixels(template, at)))
    hcheight = 0
    i = 0
    while i < len(order1):
        h = base[order1[i]].shape[0]
        _encode_int(enc, iadh, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(order1) and base[order1[i]].shape[0] == h:
            w = base[order1[i]].shape[1]
            _encode_int(enc, iadw, w - symwidth)
            symwidth = w
            _encode_generic_bits(enc, gen_cx, base[order1[i]],
                                 template, at, False)
            i += 1
        _encode_int(enc, iadw, _OOB)
    _encode_int(enc, iaex, 0)
    _encode_int(enc, iaex, len(order1))
    sd1 = struct.pack(">H", (template & 3) << 10)
    sd1 += b"".join(struct.pack(">bb", ax, ay) for ax, ay in at)
    sd1 += struct.pack(">II", len(order1), len(order1)) + enc.flush()

    # ---- dict 2: REFAGG, refines imported (dict-1) symbols
    order2 = sorted(range(len(targets)),
                    key=lambda i: (targets[i].shape[0],
                                   targets[i].shape[1], i))
    remap2 = {orig: new for new, orig in enumerate(order2)}
    n_in = len(order1)
    n_new = len(order2)
    rtemplate = 0
    rat = list(_REF_NOMINAL_AT)
    enc = MQEncoder()
    iadh = [0] * 512
    iadw = [0] * 512
    iaex = [0] * 512
    iaai: list[int] = [0] * 512
    tc = _TextCtx(n_in + n_new, rtemplate)
    hcheight = 0
    i = 0
    while i < len(order2):
        oi = order2[i]
        h = targets[oi].shape[0]
        _encode_int(enc, iadh, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(order2) and targets[order2[i]].shape[0] == h:
            oi = order2[i]
            tgt = targets[oi]
            w = tgt.shape[1]
            _encode_int(enc, iadw, w - symwidth)
            symwidth = w
            spec = specs[oi]
            if spec[0] == "refine":
                _encode_int(enc, iaai, 1)      # single-instance refine
                _encode_iaid(enc, tc.iaid_cx, tc.symcodelen,
                             remap1[spec[1]])
                _encode_int(enc, tc.iardx, 0)
                _encode_int(enc, tc.iardy, 0)
                rows = tgt.tolist()

                def emit(ctx, xx, yy, _rows=rows):
                    b = _rows[yy][xx]
                    enc.encode(tc.ref_cx, ctx, b)
                    return b

                _refine_bits(w, h, rtemplate, rat, False,
                             base[spec[1]], 0, 0, rows, emit)
            else:                              # aggregate text region
                inst = sorted((t, s, remap1[bi])
                              for bi, s, t in spec[1])
                _encode_int(enc, iaai, len(inst))
                _encode_int(enc, tc.iadt, 0)   # STRIPT init
                stript = 0
                firsts = 0
                k = 0
                while k < len(inst):
                    t = inst[k][0]
                    _encode_int(enc, tc.iadt, t - stript)
                    stript = t
                    strip = [e for e in inst if e[0] == t]
                    first = True
                    curs = 0
                    for _, s, sid in strip:
                        sym = base[order1[sid]]
                        if first:
                            _encode_int(enc, tc.iafs, s - firsts)
                            firsts = s
                            first = False
                        else:
                            _encode_int(enc, tc.iads, s - curs)
                        curs = s + sym.shape[1] - 1
                        _encode_iaid(enc, tc.iaid_cx, tc.symcodelen,
                                     sid)
                        _encode_int(enc, tc.iari, 0)  # no refinement
                    _encode_int(enc, tc.iads, _OOB)
                    k += len(strip)
            i += 1
        _encode_int(enc, iadw, _OOB)
    _encode_int(enc, iaex, n_in)               # imported: not exported
    _encode_int(enc, iaex, n_new)              # export the refined set
    sd2 = struct.pack(">H", 0x0002 | ((rtemplate & 1) << 12))  # REFAGG
    # SDAT is still present when SDHUFF=0 (§7.4.3.1.2), then SDRAT
    sd2 += b"".join(struct.pack(">bb", ax, ay) for ax, ay in at)
    sd2 += b"".join(struct.pack(">bb", ax, ay) for ax, ay in rat)
    sd2 += struct.pack(">II", n_new, n_new) + enc.flush()

    # ---- text region over dict 2's exports (sorted target order)
    sorted_targets = [targets[o] for o in order2]
    tcodelen = _symcodelen(n_new)
    enc = MQEncoder()
    iadt: list[int] = [0] * 512
    iafs: list[int] = [0] * 512
    iads: list[int] = [0] * 512
    tid_cx: list[int] = [0] * (1 << (tcodelen + 1))
    inst = sorted((t, s, remap2[rid]) for rid, s, t in placements)
    _encode_int(enc, iadt, 0)
    stript = 0
    firsts = 0
    k = 0
    while k < len(inst):
        t = inst[k][0]
        _encode_int(enc, iadt, t - stript)
        stript = t
        strip = [e for e in inst if e[0] == t]
        first = True
        curs = 0
        for _, s, sid in strip:
            sym = sorted_targets[sid]
            adv = sym.shape[1] - 1
            if first:
                _encode_int(enc, iafs, s - firsts)
                firsts = s
                first = False
            else:
                _encode_int(enc, iads, s - curs)
            curs = s + adv
            _encode_iaid(enc, tid_cx, tcodelen, sid)
        _encode_int(enc, iads, _OOB)
        k += len(strip)
    tr = struct.pack(">IIII", page_w, page_h, 0, 0) + b"\x00"
    tr += struct.pack(">H", 1 << 4)            # TL refcorner
    tr += struct.pack(">I", len(inst)) + enc.flush()

    page_info = struct.pack(">IIII", page_w, page_h, 0, 0) \
        + b"\x01" + b"\x00\x00"
    return (_segment(1, _PAGE_INFO, page_info) +
            _segment(2, 0, sd1) +
            _segment(3, 0, sd2, refs=(2,)) +
            _segment(4, 4, tr, refs=(3,)) +
            _segment(5, _END_PAGE, b""))


def _bits_to_bytes(bits: list[int]) -> bytes:
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        chunk = bits[i:i + 8]
        for j, v in enumerate(chunk):
            b |= v << (7 - j)
        out.append(b)
    return bytes(out)


def _encode_text_region_payload(sorted_syms, placements_sorted,
                                page_w: int, page_h: int) -> bytes:
    """Arithmetic text-region payload (TL refcorner, SBSTRIPS=1) over
    an already-sorted symbol list; shared by the fixture encoders."""
    from .mq import MQEncoder
    symcodelen = _symcodelen(len(sorted_syms))
    enc = MQEncoder()
    iadt: list[int] = [0] * 512
    iafs: list[int] = [0] * 512
    iads: list[int] = [0] * 512
    iaid_cx: list[int] = [0] * (1 << (symcodelen + 1))
    _encode_int(enc, iadt, 0)
    stript = 0
    firsts = 0
    k = 0
    while k < len(placements_sorted):
        t = placements_sorted[k][0]
        _encode_int(enc, iadt, t - stript)
        stript = t
        strip = [e for e in placements_sorted if e[0] == t]
        first = True
        curs = 0
        for _, s, sid in strip:
            sym = sorted_syms[sid]
            adv = sym.shape[1] - 1
            if first:
                _encode_int(enc, iafs, s - firsts)
                firsts = s
                first = False
            else:
                _encode_int(enc, iads, s - curs)
            curs = s + adv
            _encode_iaid(enc, iaid_cx, symcodelen, sid)
        _encode_int(enc, iads, _OOB)
        k += len(strip)
    tr = struct.pack(">IIII", page_w, page_h, 0, 0) + b"\x00"
    tr += struct.pack(">H", 1 << 4)            # TL refcorner
    tr += struct.pack(">I", len(placements_sorted)) + enc.flush()
    return tr


def _encode_sbhuff_text_region_payload(sorted_syms, placements_sorted,
                                       page_w: int, page_h: int,
                                       fs_sel: int = 0, ds_sel: int = 0,
                                       dt_sel: int = 0,
                                       refine=None) -> bytes:
    """SBHUFF text-region payload (TL refcorner, SBSTRIPS=1, standard
    tables FS=B.6 DS=B.8 DT=B.11): the Huffman twin of
    ``_encode_text_region_payload``. Every symbol gets an equal-length
    ID code (length ⌈log2 n⌉, canonical code == index), carried via a
    single-runcode symbol-ID table (§7.4.4.1.7).

    ``refine`` maps a placement index (4th tuple element) to a target
    bitmap: the region is coded SBREFINE=1 per §6.4.11 Huffman mode —
    RI as one raw bit, RDW/RDH/RDX/RDY via B.15, BMSIZE via B.1, then
    the byte-aligned refinement data from a FRESH arithmetic coder."""
    from .mq import MQEncoder
    fs_tab = _STD_TABLES[(6, 7)[fs_sel]]
    ds_tab = _STD_TABLES[(8, 9, 10)[ds_sel]]
    dt_tab = _STD_TABLES[(11, 12, 13)[dt_sel]]
    n_syms = len(sorted_syms)
    idlen = max(1, (n_syms - 1).bit_length())
    sbrtemplate = 0
    sbrat = list(_REF_NOMINAL_AT)
    ref_nbits = len(_REF_CODING[sbrtemplate]) \
        + len(_REF_REFERENCE[sbrtemplate]) + 2

    bits: list[int] = []
    # 35 four-bit runcode lengths: only runcode ``idlen`` is used
    # (prefix length 1 → its canonical code is the single bit 0)
    for i in range(35):
        v = 1 if i == idlen else 0
        for k in (3, 2, 1, 0):
            bits.append((v >> k) & 1)
    for _ in range(n_syms):
        bits.append(0)                     # runcode: length = idlen
    while len(bits) % 8:
        bits.append(0)                     # §7.4.4.1.7 step 4 align

    # instances: B.11 cannot code 0, so STRIPT is transmitted as 1
    # (stript starts at -1; every strip DT ≥ 1 for sorted distinct t)
    dt_tab.encode(bits, 1)
    stript = -1
    firsts = 0
    k = 0
    while k < len(placements_sorted):
        t = placements_sorted[k][0]
        dt_tab.encode(bits, t - stript)
        stript = t
        strip = [e for e in placements_sorted if e[0] == t]
        first = True
        curs = 0
        for e in strip:
            _, s, sid = e[:3]
            idx = e[3] if len(e) > 3 else None
            sym = sorted_syms[sid]
            target = refine.get(idx) if refine is not None else None
            drawn = sym if target is None else \
                (np.asarray(target) != 0).astype(np.uint8)
            adv = drawn.shape[1] - 1
            if first:
                fs_tab.encode(bits, s - firsts)
                firsts = s
                first = False
            else:
                ds_tab.encode(bits, s - curs)
            curs = s + adv
            for b in range(idlen - 1, -1, -1):   # canonical code == id
                bits.append((sid >> b) & 1)
            if refine is not None:
                bits.append(0 if target is None else 1)   # RI raw bit
                if target is not None:
                    rdw = drawn.shape[1] - sym.shape[1]
                    rdh = drawn.shape[0] - sym.shape[0]
                    b15 = _STD_TABLES[15]
                    b15.encode(bits, rdw)
                    b15.encode(bits, rdh)
                    b15.encode(bits, 0)          # RDX
                    b15.encode(bits, 0)          # RDY
                    enc = MQEncoder()
                    ref_cx = [0] * (1 << ref_nbits)
                    rows = drawn.tolist()

                    def emit(ctx, xx, yy, _rows=rows, _enc=enc,
                             _cx=ref_cx):
                        bv = _rows[yy][xx]
                        _enc.encode(_cx, ctx, bv)
                        return bv

                    _refine_bits(drawn.shape[1], drawn.shape[0],
                                 sbrtemplate, sbrat, False, sym,
                                 rdw >> 1, rdh >> 1, rows, emit)
                    raw = enc.flush()
                    _STD_TABLES[1].encode(bits, len(raw))  # BMSIZE
                    while len(bits) % 8:
                        bits.append(0)           # §6.4.11 byte align
                    for byte in raw:
                        for kk in range(7, -1, -1):
                            bits.append((byte >> kk) & 1)
        ds_tab.encode(bits, _OOB)
        k += len(strip)

    tflags = 1 | (1 << 4)                      # SBHUFF, TL refcorner
    if refine is not None:
        tflags |= 1 << 1                       # SBREFINE
    hflags = fs_sel | (ds_sel << 2) | (dt_sel << 4)
    if refine is not None:                     # B.15 for all 4 deltas
        hflags |= (1 << 6) | (1 << 8) | (1 << 10) | (1 << 12)
    tr = struct.pack(">IIII", page_w, page_h, 0, 0) + b"\x00"
    tr += struct.pack(">H", tflags)
    tr += struct.pack(">H", hflags)
    if refine is not None:                     # SBRTEMPLATE=0 → SBRAT
        tr += b"".join(struct.pack(">bb", ax, ay) for ax, ay in sbrat)
    tr += struct.pack(">I", len(placements_sorted))
    return tr + _bits_to_bytes(bits)


def _custom_table_segment_payload(lines_spec, htlow: int, hthigh: int,
                                  htps: int, htrs: int,
                                  oob_preflen: int = 0) -> bytes:
    """Build a type-53 custom-table payload from (preflen, rangelen)
    pairs covering [htlow, hthigh) plus lower/upper/oob prefix
    lengths appended by the caller in ``lines_spec`` order."""
    flags = (1 if oob_preflen else 0) | ((htps - 1) << 1) \
        | ((htrs - 1) << 4)
    out = bytes([flags]) + struct.pack(">ii", htlow, hthigh)
    bits: list[int] = []
    for preflen, rangelen in lines_spec:
        for k in range(htps - 1, -1, -1):
            bits.append((preflen >> k) & 1)
        if rangelen is not None:
            for k in range(htrs - 1, -1, -1):
                bits.append((rangelen >> k) & 1)
    if oob_preflen:
        for k in range(htps - 1, -1, -1):
            bits.append((oob_preflen >> k) & 1)
    return out + _bits_to_bytes(bits)


def encode_jbig2_huffman_text_page(symbols: list[np.ndarray],
                                   placements: list[tuple[int, int, int]],
                                   page_w: int, page_h: int, *,
                                   mmr: bool = False,
                                   custom_dh: bool = False,
                                   sbhuff: bool = False,
                                   sb_tables: tuple = (0, 0, 0),
                                   refine: dict[int, np.ndarray] | None
                                   = None) -> bytes:
    """Fixture encoder: SDHUFF=1 symbol dictionary (standard tables
    B.4/B.2/B.1; ``custom_dh`` swaps DH to a stream-carried type-53
    table) + a text region drawing the symbols — arithmetic by
    default, SBHUFF Huffman-coded (standard tables B.6/B.8/B.11 and a
    stream-carried symbol-ID code table) with ``sbhuff=True``. The
    collective bitmaps are uncompressed (BMSIZE=0) or MMR-coded.
    ``refine`` (with ``sbhuff=True``) maps placement indices to target
    bitmaps carried as §6.4.11 Huffman-mode per-instance refinements."""
    syms = [(np.asarray(s) != 0).astype(np.uint8) for s in symbols]
    if not syms:
        raise Jbig2Error("need at least one symbol")
    order = sorted(range(len(syms)),
                   key=lambda i: (syms[i].shape[0], syms[i].shape[1], i))
    remap = {orig: new for new, orig in enumerate(order)}

    # custom DH table: covers 0..63 with 4 values per line
    custom = _custom_table_segment_payload(
        [(4, 2)] * 16 + [(4, None), (4, None)], 0, 64, 4, 3) \
        if custom_dh else None
    dh_tab = _decode_table_segment(custom) if custom_dh \
        else _STD_TABLES[4]
    dw_tab = _STD_TABLES[2]
    bm_tab = _STD_TABLES[1]

    # coded stream with byte-aligned collective bitmaps inline
    bits: list[int] = []
    hcheight = 0
    i = 0
    while i < len(order):
        h = syms[order[i]].shape[0]
        dh_tab.encode(bits, h - hcheight)
        hcheight = h
        cls = []
        symwidth = 0
        while i < len(order) and syms[order[i]].shape[0] == h:
            w = syms[order[i]].shape[1]
            dw_tab.encode(bits, w - symwidth)
            symwidth = w
            cls.append(syms[order[i]])
            i += 1
        dw_tab.encode(bits, _OOB)
        coll = np.concatenate(cls, axis=1)
        if mmr:
            from .ccitt import encode_g4
            raw = encode_g4(coll)
            bm_tab.encode(bits, len(raw))
        else:
            raw = np.packbits(coll, axis=1).tobytes()
            bm_tab.encode(bits, 0)
        while len(bits) % 8:
            bits.append(0)
        for b in raw:
            for k in range(7, -1, -1):
                bits.append((b >> k) & 1)
    # export: run of 0 unexported, then all new symbols
    ex_tab = _STD_TABLES[1]
    ex_tab.encode(bits, 0)
    ex_tab.encode(bits, len(order))

    flags = 0x0001                             # SDHUFF
    if custom_dh:
        flags |= 3 << 2                        # DH: custom table
    sd = struct.pack(">H", flags)
    sd += struct.pack(">II", len(order), len(order))
    sd += _bits_to_bytes(bits)

    sorted_syms = [syms[o] for o in order]
    inst = sorted((t, s, remap[sid], idx)
                  for idx, (sid, s, t) in enumerate(placements))
    tr = _encode_sbhuff_text_region_payload(
        sorted_syms, inst, page_w, page_h, *sb_tables,
        refine=refine) if sbhuff else \
        _encode_text_region_payload(
            sorted_syms, [e[:3] for e in inst], page_w, page_h)

    page_info = struct.pack(">IIII", page_w, page_h, 0, 0) \
        + b"\x01" + b"\x00\x00"
    out = _segment(1, _PAGE_INFO, page_info)
    if custom_dh:
        out += _segment(2, 53, custom)
        out += _segment(3, 0, sd, refs=(2,))
        out += _segment(4, 4, tr, refs=(3,))
        out += _segment(5, _END_PAGE, b"")
    else:
        out += _segment(2, 0, sd)
        out += _segment(3, 4, tr, refs=(2,))
        out += _segment(4, _END_PAGE, b"")
    return out
