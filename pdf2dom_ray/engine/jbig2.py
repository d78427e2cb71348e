"""JBIG2 (embedded-stream) decoder — MMR and arithmetic generic regions.

Covers the ``JBIG2Decode`` filter for pages built from generic region
segments: the segment-header framing is implemented in full (so any
embedded stream parses); MMR region decoding reuses the engine's
T.6/G4 codec (``engine/ccitt.py``) — JBIG2's MMR mode *is* T.6 coding
(ITU-T T.88 §6.2.6) — and arithmetic-coded generic regions (templates
0-3, generalized AT pixels, TPGDON typical prediction, T.88 §6.2.5)
decode through the engine MQ coder (``engine/mq.py``). Symbol
dictionaries / text regions and halftones raise ``Jbig2Error`` with
the specific reason and degrade upstream to the honest
``UnsupportedImageError`` → ``<img src="">`` path, mirroring how the
reference surfaces unsupported codecs (``ImageUtils.java:11-54``
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
           "encode_jbig2_arith"]


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
    """Yield (seg_num, seg_type, page, payload) per segment."""
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
        yield seg_num, seg_type, page, data[pos:pos + length]
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
                          tpgdon: bool) -> np.ndarray:
    """Arithmetic generic region decoding procedure (T.88 §6.2.5.7)."""
    from .mq import MQDecoder
    pix = _template_pixels(template, at)
    nbits = len(pix)
    dec = MQDecoder(data)
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

    for blob in (globals_data, data):
        if not blob:
            continue
        for seg_num, seg_type, _pg, payload in _parse_segment_headers(blob):
            if seg_type == _PAGE_INFO:
                if len(payload) < 17:
                    raise Jbig2Error("truncated page info")
                page_w, page_h = struct.unpack_from(">II", payload, 0)
                default_black = bool((payload[16] >> 2) & 1)
            elif seg_type in _GENERIC:
                regions.append(_decode_generic_region(payload))
            elif seg_type in _TEXT:
                raise Jbig2Error("text region (symbol coding) unsupported")
            elif seg_type in _HALFTONE:
                raise Jbig2Error("halftone region unsupported")
            elif seg_type == 0:
                raise Jbig2Error("symbol dictionary unsupported")
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
             page: int = 1) -> bytes:
    head = struct.pack(">IB", seg_num, seg_type & 0x3F)
    head += b"\x00"                    # no referred-to segments
    head += struct.pack(">B", page)    # 1-byte page association
    head += struct.pack(">I", len(payload))
    return head + payload


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
    pix = _template_pixels(template, at)
    enc = MQEncoder()
    cx = [0] * (1 << len(pix))
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
