"""Baseline JPEG (DCTDecode) codec — pure numpy, no codec libraries.

The reference decodes every PDFBox/ImageIO-supported codec
(`/root/reference/src/main/java/org/fit/pdfdom/PDFBoxTree.java:544-590`
via ``PDImageXObject.getImage()``); DCTDecode is the single most
common image filter in real PDFs, so this engine carries its own
baseline sequential decoder (ITU-T T.81 §F.2): marker parse → Huffman
entropy decode (16-bit lookup tables) → dequantize → batched matrix
IDCT → chroma upsample → YCbCr→RGB.

Supported: 8-bit baseline/extended-sequential (SOF0/SOF1) AND
progressive (SOF2 — spectral selection, successive approximation,
EOB runs), grayscale and 3-component YCbCr with any 1-2 sampling
factors (4:4:4 / 4:2:2 / 4:2:0), restart intervals. Not supported
(raise ``JpegError`` → the image degrades to an empty ``<img src>``
exactly like any other unsupported codec): arithmetic coding, 12-bit,
CMYK/YCCK, lossless SOFs.

Two encoders exist for deterministic test fixtures (no image libs in
this container): baseline (Annex K tables) and progressive (DC
first/refine + per-component AC first/refine scans). Progressive
re-orders the SAME quantized coefficients, so its decode is
bit-identical to the baseline file's decode — the cross-path property
the tests assert.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["JpegError", "decode_baseline_jpeg", "encode_baseline_jpeg",
           "encode_progressive_jpeg"]


class JpegError(Exception):
    pass


_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal DCT-II matrix: block = C @ pixels @ C.T ; pixels = C.T @ block @ C
_C = np.zeros((8, 8), dtype=np.float64)
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0) * \
            (np.sqrt(0.125) if _k == 0 else 0.5)


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------

def _canonical_codes(counts, symbols):
    """(16 counts, symbols) → list of (code, length, symbol)."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out.append((code, length, symbols[k]))
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffLookup:
    """16-bit-peek decode tables: O(1) symbol decode."""

    __slots__ = ("length", "symbol")

    def __init__(self, counts, symbols):
        self.length = np.zeros(1 << 16, dtype=np.uint8)
        self.symbol = np.zeros(1 << 16, dtype=np.uint8)
        for code, ln, sym in _canonical_codes(counts, symbols):
            lo = code << (16 - ln)
            hi = lo + (1 << (16 - ln))
            self.length[lo:hi] = ln
            self.symbol[lo:hi] = sym


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy data."""

    __slots__ = ("data", "n", "pos", "buf", "cnt")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.buf = 0
        self.cnt = 0

    def _fill(self):
        while self.cnt <= 24:
            b = self.data[self.pos] if self.pos < self.n else 0
            self.pos += 1
            self.buf = ((self.buf << 8) | b) & 0xFFFFFFFF
            self.cnt += 8

    def peek16(self) -> int:
        if self.cnt < 16:
            self._fill()
        return (self.buf >> (self.cnt - 16)) & 0xFFFF

    def skip(self, nbits: int):
        self.cnt -= nbits

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if self.cnt < nbits:
            self._fill()
        self.cnt -= nbits
        return (self.buf >> self.cnt) & ((1 << nbits) - 1)


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → (H, W, 3) RGB or (H, W) grayscale uint8 array.

    Baseline/extended sequential (SOF0/SOF1) AND progressive (SOF2,
    spectral selection + successive approximation) are decoded; the
    name is kept for API stability."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffLookup] = {}
    huff_ac: dict[int, _HuffLookup] = {}
    frame = None
    progressive = False
    prog_init = False
    restart_interval = 0
    adobe_transform = None

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"marker sync lost at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:          # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST
            continue
        if pos + 2 > len(data):
            raise JpegError("truncated segment header")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:          # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8
                                        ).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p:p + 128], dtype=">u2"
                                        ).astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            prec = seg[0]
            if prec != 8:
                raise JpegError(f"unsupported precision {prec}")
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0xFF{marker:02X} "
                            "(lossless/arithmetic)")
        elif marker == 0xC4:        # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1:p + 17])
                nsym = sum(counts)
                symbols = list(seg[p + 17:p + 17 + nsym])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _HuffLookup(counts, symbols)
                p += 17 + nsym
        elif marker == 0xDD:        # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xEE and seg[:5] == b"Adobe":   # APP14
            adobe_transform = seg[11] if len(seg) >= 12 else 0
        elif marker == 0xDA:        # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cid)
                scan.append({**comp, "td": tt >> 4, "ta": tt & 15})
            ecs_start = pos + seglen
            if not progressive:
                return _decode_scan(data, ecs_start, frame, scan, qt,
                                    huff_dc, huff_ac, restart_interval,
                                    adobe_transform)
            if not prog_init:
                _prog_init_frame(frame)
                prog_init = True
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahl = seg[3 + 2 * ns]
            pos = _decode_prog_scan(
                data, ecs_start, frame, scan, huff_dc, huff_ac,
                restart_interval, ss, se, ahl >> 4, ahl & 15)
            continue
        # APPn / COM / others: skip
        pos += seglen

    if progressive and prog_init:
        comps = frame["comps"]
        return _reconstruct(frame["w"], frame["h"], comps,
                            frame["hmax"], frame["vmax"], qt,
                            adobe_transform)
    raise JpegError("no SOS marker found")


def _split_destuff(data: bytes, start: int) -> list[bytes]:
    """Entropy-coded data → de-stuffed restart segments (0xFF00→0xFF,
    split at RSTn, stop at any other marker)."""
    segs = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # real marker (EOI etc.)
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs


def _decode_block(br: _BitReader, dc: _HuffLookup, ac: _HuffLookup,
                  pred: int) -> tuple[np.ndarray, int]:
    coef = np.zeros(64, dtype=np.int32)
    v = br.peek16()
    ln = dc.length[v]
    if ln == 0:
        raise JpegError("bad DC Huffman code")
    br.skip(int(ln))
    s = int(dc.symbol[v])
    diff = _extend(br.read(s), s)
    pred += diff
    coef[0] = pred
    k = 1
    while k < 64:
        v = br.peek16()
        ln = ac.length[v]
        if ln == 0:
            raise JpegError("bad AC Huffman code")
        br.skip(int(ln))
        rs = int(ac.symbol[v])
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16          # ZRL
                continue
            break                # EOB
        k += r
        if k > 63:
            raise JpegError("AC run past block end")
        coef[k] = _extend(br.read(s), s)
        k += 1
    return coef, pred


def _decode_scan(data, ecs_start, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval, adobe_transform=None):
    w, h = frame["w"], frame["h"]
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise JpegError(f"bad dimensions {w}x{h}")
    comps = scan
    ncomp = len(comps)
    if ncomp not in (1, 3, 4):
        raise JpegError(f"unsupported component count {ncomp}")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise JpegError(f"unsupported sampling {hmax}x{vmax}")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcus = mcux * mcuy

    for c in comps:
        if c["tq"] not in qt:
            raise JpegError(f"missing quant table {c['tq']}")
        if c["td"] not in huff_dc or c["ta"] not in huff_ac:
            raise JpegError("missing Huffman table")
        # coefficient store per component (block grid over the MCU area)
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["blocks"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)

    segs = _split_destuff(data, ecs_start)
    seg_idx = 0
    br = _BitReader(segs[0])
    preds = [0] * ncomp
    since_restart = 0
    for m in range(n_mcus):
        if restart_interval and since_restart == restart_interval:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise JpegError("missing restart segment")
            br = _BitReader(segs[seg_idx])
            preds = [0] * ncomp
            since_restart = 0
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef, preds[ci] = _decode_block(
                        br, huff_dc[c["td"]], huff_ac[c["ta"]], preds[ci])
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    c["blocks"][row * c["bw"] + col] = coef
        since_restart += 1

    return _reconstruct(w, h, comps, hmax, vmax, qt, adobe_transform)


def _reconstruct(w, h, comps, hmax, vmax, qt,
                 adobe_transform=None) -> np.ndarray:
    """Coefficient stores → pixels: dequantize + dezigzag + batched
    matrix IDCT + chroma upsample + color conversion (shared by the
    sequential and progressive paths).

    4-component images follow the Adobe convention (APP14): samples are
    INVERTED CMYK; transform 2 additionally stores the first three
    channels as YCbCr of the inverted CMY (YCCK). Final mapping:
    RGB = stored_CMY · stored_K / 255 — exact for Adobe-written files
    and the identity for K=0 fixtures."""
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise JpegError(f"missing quant table {c['tq']}")
        q = qt[c["tq"]][np.newaxis, :]
        deq = (c["blocks"] * q).astype(np.float64)
        blocks8 = np.zeros((len(deq), 64), dtype=np.float64)
        blocks8[:, _ZIGZAG] = deq
        blocks8 = blocks8.reshape(-1, 8, 8)
        pix = np.einsum("ij,njk,kl->nil", _C.T, blocks8, _C) + 128.0
        pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        plane = pix.reshape(c["bh"], c["bw"], 8, 8).transpose(0, 2, 1, 3) \
            .reshape(c["bh"] * 8, c["bw"] * 8)
        # upsample to full MCU-grid resolution, then crop to (h, w)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(comps) == 1:
        return planes[0]

    def ycbcr_to_rgb(p0, p1, p2):
        y = p0.astype(np.float64)
        cb = p1.astype(np.float64) - 128.0
        cr = p2.astype(np.float64) - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        return np.stack([r, g, b], axis=-1)

    if len(comps) == 4:
        if adobe_transform == 2:      # YCCK → inverted CMY
            cmy = ycbcr_to_rgb(planes[0], planes[1], planes[2])
        else:                         # raw (inverted) CMYK
            cmy = np.stack([p.astype(np.float64) for p in planes[:3]],
                           axis=-1)
        k = planes[3].astype(np.float64)[..., np.newaxis]
        rgb = np.clip(cmy, 0, 255) * k / 255.0
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

    rgb = ycbcr_to_rgb(planes[0], planes[1], planes[2])
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive (SOF2) scan decoding
# ---------------------------------------------------------------------------

def _prog_init_frame(frame) -> None:
    w, h = frame["w"], frame["h"]
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise JpegError(f"bad dimensions {w}x{h}")
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise JpegError(f"unsupported sampling {hmax}x{vmax}")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    frame.update(hmax=hmax, vmax=vmax, mcux=mcux, mcuy=mcuy)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        # non-interleaved scan grid: ceil over the component's samples
        c["cw"] = ((w * c["h"] + hmax - 1) // hmax + 7) // 8
        c["chh"] = ((h * c["v"] + vmax - 1) // vmax + 7) // 8
        c["blocks"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["pred"] = 0


def _split_destuff_end(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Like _split_destuff but also returns the file offset of the
    terminating marker (the 0xFF byte)."""
    segs = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs, min(i, n)


def _huff_sym(br: _BitReader, tbl: _HuffLookup) -> int:
    v = br.peek16()
    ln = tbl.length[v]
    if ln == 0:
        raise JpegError("bad Huffman code in progressive scan")
    br.skip(int(ln))
    return int(tbl.symbol[v])


def _prog_ac_first(br, block, ac, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_sym(br, ac)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read(r)
                return eobrun
            k += 16            # ZRL
            continue
        k += r
        if k > se:
            raise JpegError("AC run past spectral band")
        block[k] = _extend(br.read(s), s) << al
        k += 1
    return 0


def _prog_ac_refine(br, block, ac, ss, se, al, eobrun) -> int:
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_sym(br, ac)
            r, s = rs >> 4, rs & 15
            s_val = 0
            if s == 0:
                if r != 15:
                    eobrun = (1 << r)
                    if r:
                        eobrun += br.read(r)
                    break
                # r == 15 → run of 16 zero-history coefficients
            else:
                s_val = p1 if br.read(1) else m1
            while k <= se:
                coef = int(block[k])
                if coef != 0:
                    if br.read(1) and (coef & p1) == 0:
                        block[k] = coef + (p1 if coef >= 0 else m1)
                else:
                    if r == 0:
                        if s_val:
                            block[k] = s_val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            coef = int(block[k])
            if coef != 0:
                if br.read(1) and (coef & p1) == 0:
                    block[k] = coef + (p1 if coef >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(data, ecs_start, frame, scan, huff_dc, huff_ac,
                      restart_interval, ss, se, ah, al) -> int:
    """Decode one progressive scan into the frame coefficient stores;
    returns the file offset just past the entropy data."""
    comps = [next(c for c in frame["comps"] if c["id"] == s["id"])
             for s in scan]
    tds = [s["td"] for s in scan]
    tas = [s["ta"] for s in scan]
    segs, end = _split_destuff_end(data, ecs_start)
    seg_idx = 0
    br = _BitReader(segs[0])
    eobrun = 0
    is_dc = ss == 0
    if is_dc and se != 0:
        raise JpegError("DC scan with Se != 0")
    if not is_dc and len(comps) != 1:
        raise JpegError("interleaved AC progressive scan")

    def maybe_restart(count, per):
        nonlocal seg_idx, br, eobrun
        if restart_interval and count and count % restart_interval == 0 \
                and count < per:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise JpegError("missing restart segment")
            br = _BitReader(segs[seg_idx])
            eobrun = 0
            for c in comps:
                c["pred"] = 0

    if is_dc:
        mcux, mcuy = frame["mcux"], frame["mcuy"]
        n_mcus = mcux * mcuy
        for m in range(n_mcus):
            maybe_restart(m, n_mcus)
            my, mx = divmod(m, mcux)
            for ci, c in enumerate(comps):
                for by, bx in [(by, bx) for by in range(c["v"])
                               for bx in range(c["h"])]:
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    block = c["blocks"][row * c["bw"] + col]
                    if ah == 0:
                        sym = _huff_sym(br, huff_dc[tds[ci]])
                        diff = _extend(br.read(sym), sym)
                        c["pred"] += diff
                        block[0] = c["pred"] << al
                    else:
                        if br.read(1):
                            block[0] = int(block[0]) | (1 << al)
    else:
        c = comps[0]
        ac = huff_ac[tas[0]]
        nblocks = c["cw"] * c["chh"]
        for bi in range(nblocks):
            maybe_restart(bi, nblocks)
            row, col = divmod(bi, c["cw"])
            block = c["blocks"][row * c["bw"] + col]
            if ah == 0:
                eobrun = _prog_ac_first(br, block, ac, ss, se, al, eobrun)
            else:
                eobrun = _prog_ac_refine(br, block, ac, ss, se, al, eobrun)
    return end


# ---------------------------------------------------------------------------
# encoder (fixtures / roundtrip tests)
# ---------------------------------------------------------------------------

# Annex K tables
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# standard Huffman tables (Annex K.3)
_STD_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
             list(range(12)))
_STD_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_STD_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_STD_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


class _BitWriter:
    __slots__ = ("out", "buf", "cnt")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def write(self, code: int, nbits: int):
        self.buf = (self.buf << nbits) | (code & ((1 << nbits) - 1))
        self.cnt += nbits
        while self.cnt >= 8:
            b = (self.buf >> (self.cnt - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)   # byte stuffing
            self.cnt -= 8
        self.buf &= (1 << self.cnt) - 1

    def flush(self):
        if self.cnt:
            self.write(0x7F, 8 - self.cnt)   # pad with 1s


def _enc_codes(counts, symbols):
    return {sym: (code, ln) for code, ln, sym in
            _canonical_codes(counts, symbols)}


def _mag(v: int) -> tuple[int, int]:
    """value → (size, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _encode_block(bwri: "_BitWriter", coef: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    s, bits = _mag(int(coef[0]) - pred)
    pred = int(coef[0])
    code, ln = dc_codes[s]
    bwri.write(code, ln)
    if s:
        bwri.write(bits, s)
    run = 0
    nz = np.nonzero(coef[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(coef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]     # ZRL
            bwri.write(code, ln)
            run -= 16
        s, bits = _mag(v)
        code, ln = ac_codes[(run << 4) | s]
        bwri.write(code, ln)
        bwri.write(bits, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]         # EOB
        bwri.write(code, ln)
    return pred


def encode_baseline_jpeg(img: np.ndarray, quality: int = 85,
                         subsampling: str = "444",
                         restart_interval: int = 0) -> bytes:
    """(H, W, 3) RGB or (H, W) grayscale uint8 → baseline JFIF bytes
    (Annex K tables scaled by ``quality``; ``subsampling`` ``"444"`` or
    ``"420"``; optional DRI restart interval in MCUs). Deterministic."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise JpegError("empty image")
    if subsampling not in ("444", "420"):
        raise JpegError(f"unsupported subsampling {subsampling}")
    sub = 2 if (subsampling == "420" and not gray) else 1

    if gray:
        planes = [img.astype(np.float64) - 128.0]
        qtabs = [_scale_q(_QL, quality)]
        comps = [{"qi": 0, "ti": 0, "h": 1, "v": 1}]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub == 2:
            he, we = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            def down(p):
                pp = np.empty((he, we), dtype=np.float64)
                pp[:h, :w] = p
                if he > h:
                    pp[h:, :w] = p[-1:, :]
                if we > w:
                    pp[:, w:] = pp[:, w - 1:w]
                return pp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cb, cr = down(cb), down(cr)
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qtabs = [_scale_q(_QL, quality), _scale_q(_QC, quality)]
        comps = [{"qi": 0, "ti": 0, "h": sub, "v": sub},
                 {"qi": 1, "ti": 1, "h": 1, "v": 1},
                 {"qi": 1, "ti": 1, "h": 1, "v": 1}]

    dc_codes = [_enc_codes(*_STD_DC_L), _enc_codes(*_STD_DC_C)]
    ac_codes = [_enc_codes(*_STD_AC_L), _enc_codes(*_STD_AC_C)]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component quantized zigzag blocks on the MCU-aligned grid
    for c, p in zip(comps, planes):
        cbw, cbh = mcux * c["h"], mcuy * c["v"]
        ph, pw = p.shape
        pp = np.zeros((cbh * 8, cbw * 8), dtype=np.float64)
        pp[:ph, :pw] = p
        if ph < cbh * 8:
            pp[ph:, :pw] = p[-1:, :]
        if pw < cbw * 8:
            pp[:, pw:] = pp[:, pw - 1:pw]
        blocks = pp.reshape(cbh, 8, cbw, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8)
        dct = np.einsum("ij,njk,kl->nil", _C, blocks, _C.T)
        q = qtabs[c["qi"]].reshape(8, 8)[np.newaxis]
        c["zz"] = np.round(dct / q).astype(np.int32) \
            .reshape(-1, 64)[:, _ZIGZAG]
        c["bw"] = cbw

    entropy = bytearray()
    bwri = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    since = 0
    for m in range(mcux * mcuy):
        if restart_interval and since == restart_interval:
            bwri.flush()
            entropy += bwri.out
            entropy += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bwri = _BitWriter()
            preds = [0] * len(comps)
            since = 0
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    coef = c["zz"][row * c["bw"] + col]
                    preds[ci] = _encode_block(
                        bwri, coef, preds[ci],
                        dc_codes[c["ti"]], ac_codes[c["ti"]])
        since += 1
    bwri.flush()
    entropy += bwri.out

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HHBB", 1, 1, 0, 0)
    for i, q in enumerate(qtabs):
        # DQT stores the table in zigzag order; quantization math above
        # uses natural (row-major) order
        out += b"\xFF\xDB" + struct.pack(">HB", 67, i) + bytes(
            int(x) for x in q[_ZIGZAG])
    ncomp = len(comps)
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, c in enumerate(comps):
        out += bytes([ci + 1, (c["h"] << 4) | c["v"], c["qi"]])
    for tc, tabs in ((0, (_STD_DC_L, _STD_DC_C)), (1, (_STD_AC_L, _STD_AC_C))):
        for th in range(2 if ncomp == 3 else 1):
            counts, symbols = tabs[th]
            out += b"\xFF\xC4" + struct.pack(
                ">HB", 3 + 16 + len(symbols), (tc << 4) | th)
            out += bytes(counts) + bytes(symbols)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci, c in enumerate(comps):
        out += bytes([ci + 1, (c["ti"] << 4) | c["ti"]])
    out += b"\x00\x3F\x00"
    out += entropy
    out += b"\xFF\xD9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (fixtures / cross-path validation)
# ---------------------------------------------------------------------------

class _ProgWriter(_BitWriter):
    def sym(self, codes: dict, symbol: int):
        code, ln = codes[symbol]
        self.write(code, ln)


def _prog_prep(img: np.ndarray, quality: int, subsampling: str):
    """Shared prep: components with quantized zigzag blocks on the MCU
    grid plus the non-interleaved ceil grid dims."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise JpegError("empty image")
    sub = 2 if (subsampling == "420" and not gray) else 1
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        qtabs = [_scale_q(_QL, quality)]
        comps = [{"qi": 0, "ti": 0, "h": 1, "v": 1}]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub == 2:
            he, we = (h + 1) // 2 * 2, (w + 1) // 2 * 2

            def down(p):
                pp = np.empty((he, we), dtype=np.float64)
                pp[:h, :w] = p
                if he > h:
                    pp[h:, :w] = p[-1:, :]
                if we > w:
                    pp[:, w:] = pp[:, w - 1:w]
                return pp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cb, cr = down(cb), down(cr)
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qtabs = [_scale_q(_QL, quality), _scale_q(_QC, quality)]
        comps = [{"qi": 0, "ti": 0, "h": sub, "v": sub},
                 {"qi": 1, "ti": 1, "h": 1, "v": 1},
                 {"qi": 1, "ti": 1, "h": 1, "v": 1}]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c, p in zip(comps, planes):
        cbw, cbh = mcux * c["h"], mcuy * c["v"]
        ph, pw = p.shape
        pp = np.zeros((cbh * 8, cbw * 8), dtype=np.float64)
        pp[:ph, :pw] = p
        if ph < cbh * 8:
            pp[ph:, :pw] = p[-1:, :]
        if pw < cbw * 8:
            pp[:, pw:] = pp[:, pw - 1:pw]
        blocks = pp.reshape(cbh, 8, cbw, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8)
        dct = np.einsum("ij,njk,kl->nil", _C, blocks, _C.T)
        q = qtabs[c["qi"]].reshape(8, 8)[np.newaxis]
        c["zz"] = np.round(dct / q).astype(np.int32) \
            .reshape(-1, 64)[:, _ZIGZAG]
        c["bw"] = cbw
        c["cw"] = ((w * c["h"] + hmax - 1) // hmax + 7) // 8
        c["chh"] = ((h * c["v"] + vmax - 1) // vmax + 7) // 8
    return comps, qtabs, h, w, mcux, mcuy


def _enc_ac_first(bw: _ProgWriter, blocks, ac_codes, al: int):
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            bw.sym(ac_codes, nbits << 4)
            if nbits:
                bw.write(eobrun - (1 << nbits), nbits)
            eobrun = 0

    for block in blocks:
        vals = [int(v) // (1 << al) if v >= 0 else -((-int(v)) >> al)
                for v in block[1:64]]
        vals = [0] + vals          # index aligned to k
        nz = [k for k in range(1, 64) if vals[k] != 0]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        r = 0
        for k in range(1, nz[-1] + 1):
            v = vals[k]
            if v == 0:
                r += 1
                continue
            while r > 15:
                bw.sym(ac_codes, 0xF0)
                r -= 16
            s, bits = _mag(v)
            bw.sym(ac_codes, (r << 4) | s)
            bw.write(bits, s)
            r = 0
        if nz[-1] < 63:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _enc_ac_refine(bw: _ProgWriter, blocks, ac_codes, al: int):
    eobrun = 0
    run_bits: list[int] = []

    def flush():
        nonlocal eobrun
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            bw.sym(ac_codes, nbits << 4)
            if nbits:
                bw.write(eobrun - (1 << nbits), nbits)
            for b in run_bits:
                bw.write(b, 1)
            run_bits.clear()
            eobrun = 0

    for block in blocks:
        absv = [0] * 64
        eob = 0
        for k in range(1, 64):
            t = abs(int(block[k])) >> al
            absv[k] = t
            if t == 1:
                eob = k
        r = 0
        cur_bits: list[int] = []
        for k in range(1, 64):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush()
                bw.sym(ac_codes, 0xF0)
                r -= 16
                for b in cur_bits:
                    bw.write(b, 1)
                cur_bits = []
            if t > 1:
                cur_bits.append(t & 1)
                continue
            flush()
            bw.sym(ac_codes, (r << 4) | 1)
            bw.write(1 if int(block[k]) > 0 else 0, 1)
            for b in cur_bits:
                bw.write(b, 1)
            cur_bits = []
            r = 0
        if r > 0 or cur_bits:
            eobrun += 1
            run_bits.extend(cur_bits)
            if eobrun == 0x7FFF:
                flush()
    flush()


# progressive AC scans need EOBn symbols (0x10..0xE0) that the std
# baseline AC tables lack; a flat canonical table (255 nine-bit codes)
# covers every RS value — bit-inefficient but valid and simple
_PROG_AC = ([0, 0, 0, 0, 0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0],
            list(range(255)))


def encode_progressive_jpeg(img: np.ndarray, quality: int = 85,
                            subsampling: str = "444") -> bytes:
    """Progressive (SOF2) JFIF with spectral selection + successive
    approximation: DC first (Al=1) → DC refine → per-component AC
    first (1-63, Al=1) → AC refine. Same quantized coefficients as the
    baseline encoder, so decoded pixels are bit-identical to the
    baseline file's — the cross-path validation the tests rely on."""
    if subsampling not in ("444", "420"):
        raise JpegError(f"unsupported subsampling {subsampling}")
    comps, qtabs, h, w, mcux, mcuy = _prog_prep(img, quality, subsampling)
    ncomp = len(comps)
    dc_codes = [_enc_codes(*_STD_DC_L), _enc_codes(*_STD_DC_C)]
    prog_ac = _enc_codes(*_PROG_AC)
    ac_codes = [prog_ac, prog_ac]

    def sos_header(scan_comps, ss, se, ah, al) -> bytes:
        out = b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * len(scan_comps),
                                        len(scan_comps))
        for ci in scan_comps:
            ti = comps[ci]["ti"]
            out += bytes([ci + 1, (ti << 4) | ti])
        return out + bytes([ss, se, (ah << 4) | al])

    scans: list[bytes] = []

    # scan 1: DC first, interleaved, Al=1
    bw = _ProgWriter()
    preds = [0] * ncomp
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    v = int(c["zz"][row * c["bw"] + col][0]) >> 1
                    s, bits = _mag(v - preds[ci])
                    preds[ci] = v
                    bw.sym(dc_codes[c["ti"]], s)
                    if s:
                        bw.write(bits, s)
    bw.flush()
    scans.append(sos_header(list(range(ncomp)), 0, 0, 0, 1) + bytes(bw.out))

    # scan 2: DC refine (raw bits), Ah=1 Al=0
    bw = _ProgWriter()
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for c in comps:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    row = my * c["v"] + by
                    col = mx * c["h"] + bx
                    bw.write(int(c["zz"][row * c["bw"] + col][0]) & 1, 1)
    bw.flush()
    scans.append(sos_header(list(range(ncomp)), 0, 0, 1, 0) + bytes(bw.out))

    # per-component AC scans over the ceil grid
    for ci, c in enumerate(comps):
        blocks = [c["zz"][row * c["bw"] + col]
                  for row in range(c["chh"]) for col in range(c["cw"])]
        bw = _ProgWriter()
        _enc_ac_first(bw, blocks, ac_codes[c["ti"]], 1)
        bw.flush()
        scans.append(sos_header([ci], 1, 63, 0, 1) + bytes(bw.out))
    for ci, c in enumerate(comps):
        blocks = [c["zz"][row * c["bw"] + col]
                  for row in range(c["chh"]) for col in range(c["cw"])]
        bw = _ProgWriter()
        _enc_ac_refine(bw, blocks, ac_codes[c["ti"]], 0)
        bw.flush()
        scans.append(sos_header([ci], 1, 63, 1, 0) + bytes(bw.out))

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HHBB", 1, 1, 0, 0)
    for i, q in enumerate(qtabs):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, i) + bytes(
            int(x) for x in q[_ZIGZAG])
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, c in enumerate(comps):
        out += bytes([ci + 1, (c["h"] << 4) | c["v"], c["qi"]])
    for tc, tabs in ((0, (_STD_DC_L, _STD_DC_C)), (1, (_PROG_AC, _PROG_AC))):
        for th in range(2 if ncomp == 3 else 1):
            counts, symbols = tabs[th]
            out += b"\xFF\xC4" + struct.pack(
                ">HB", 3 + 16 + len(symbols), (tc << 4) | th)
            out += bytes(counts) + bytes(symbols)
    for s in scans:
        out += s
    out += b"\xFF\xD9"
    return bytes(out)


def encode_cmyk_jpeg(stored: np.ndarray, quality: int = 85,
                     transform: int = 0) -> bytes:
    """(H, W, 4) STORED-sample array (Adobe-inverted CMYK convention)
    → 4-component baseline JFIF with an APP14 Adobe marker.
    ``transform=2`` stores the first three channels as YCbCr of the
    inverted CMY (YCCK). Fixture encoder for the 4-component decode
    path; 4:4:4 only."""
    if stored.ndim != 3 or stored.shape[2] != 4:
        raise JpegError("encode_cmyk_jpeg wants (H, W, 4) samples")
    h, w = stored.shape[:2]
    planes = [stored[..., i].astype(np.float64) for i in range(4)]
    if transform == 2:
        r, g, b = planes[0], planes[1], planes[2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr, planes[3]]
    planes = [p - 128.0 for p in planes]
    qtab = _scale_q(_QL, quality)
    dc_codes = _enc_codes(*_STD_DC_L)
    ac_codes = _enc_codes(*_STD_AC_L)
    bw_blocks, bh_blocks = (w + 7) // 8, (h + 7) // 8

    zz = []
    for p in planes:
        pp = np.zeros((bh_blocks * 8, bw_blocks * 8), dtype=np.float64)
        pp[:h, :w] = p
        if h < bh_blocks * 8:
            pp[h:, :w] = p[-1:, :]
        if w < bw_blocks * 8:
            pp[:, w:] = pp[:, w - 1:w]
        blocks = pp.reshape(bh_blocks, 8, bw_blocks, 8) \
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        dct = np.einsum("ij,njk,kl->nil", _C, blocks, _C.T)
        q = qtab.reshape(8, 8)[np.newaxis]
        zz.append(np.round(dct / q).astype(np.int32)
                  .reshape(-1, 64)[:, _ZIGZAG])

    bwri = _BitWriter()
    preds = [0, 0, 0, 0]
    for bi in range(bh_blocks * bw_blocks):
        for ci in range(4):
            preds[ci] = _encode_block(bwri, zz[ci][bi], preds[ci],
                                      dc_codes, ac_codes)
    bwri.flush()

    out = bytearray(b"\xFF\xD8")
    adobe = b"Adobe" + struct.pack(">HHHB", 100, 0, 0, transform)
    out += b"\xFF\xEE" + struct.pack(">H", 2 + len(adobe)) + adobe
    out += b"\xFF\xDB" + struct.pack(">HB", 67, 0) + bytes(
        int(x) for x in qtab[_ZIGZAG])
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 12, 8, h, w, 4)
    for ci in range(4):
        out += bytes([ci + 1, 0x11, 0])
    counts, symbols = _STD_DC_L
    out += b"\xFF\xC4" + struct.pack(">HB", 3 + 16 + len(symbols), 0x00)
    out += bytes(counts) + bytes(symbols)
    counts, symbols = _STD_AC_L
    out += b"\xFF\xC4" + struct.pack(">HB", 3 + 16 + len(symbols), 0x10)
    out += bytes(counts) + bytes(symbols)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 8, 4)
    for ci in range(4):
        out += bytes([ci + 1, 0x00])
    out += b"\x00\x3F\x00"
    out += bwri.out
    out += b"\xFF\xD9"
    return bytes(out)
