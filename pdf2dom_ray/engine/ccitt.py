"""CCITT Group 4 (ITU-T T.6 MMR) fax codec — decoder + encoder.

Covers the PDF ``CCITTFaxDecode`` filter: ``/K < 0`` (pure 2D G4, the
overwhelmingly common case in scanned PDFs; PDFBox decodes it via its
own `CCITTFaxDecoderStream`), ``/K == 0`` (pure 1D MH Group 3) and
``/K > 0`` (mixed 1D/2D with EOL+tag framing).

The run-length code tables are the standard ITU-T T.4 white/black
terminating + make-up codes (public, reproduced in every fax codec:
libtiff, PDF.js, Pillow). They are validated at import time to be
prefix-free with the expected entry counts — a corrupted entry would
fail loudly, not decode garbage.

Decoder output convention matches the PDF filter: one bit per pixel,
0 = black (unless the caller applies /BlackIs1), rows padded to byte
boundaries; this module returns a (rows, cols) uint8 array of 0/1
PIXEL values where 1 = black, and the image layer maps it to gray.
"""

from __future__ import annotations

import numpy as np

__all__ = ["CcittError", "decode_g4", "encode_g4",
           "decode_g3", "encode_g3"]


class CcittError(Exception):
    pass


# ITU-T T.4 terminating codes (run length -> bit string)
_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
}
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
# extended make-ups (shared by both colors)
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_MODE_CODES = {
    "P": "0001", "H": "001", "V0": "1",
    "VR1": "011", "VR2": "000011", "VR3": "0000011",
    "VL1": "010", "VL2": "000010", "VL3": "0000010",
}


def _validate_prefix_free():
    for name, table in (("white", {**_WHITE_TERM, **_WHITE_MAKEUP,
                                   **_EXT_MAKEUP}),
                        ("black", {**_BLACK_TERM, **_BLACK_MAKEUP,
                                   **_EXT_MAKEUP})):
        codes = sorted(table.values())
        if len(set(codes)) != len(codes):
            raise AssertionError(f"duplicate {name} T.4 code")
        for i, c in enumerate(codes):
            for d in codes[i + 1:]:
                if d.startswith(c):
                    raise AssertionError(
                        f"{name} T.4 codes not prefix-free: {c} / {d}")
    mode = sorted(_MODE_CODES.values())
    for i, c in enumerate(mode):
        for d in mode[i + 1:]:
            if d.startswith(c):
                raise AssertionError(f"mode codes not prefix-free: {c}/{d}")
    assert len(_WHITE_TERM) == 64 and len(_BLACK_TERM) == 64
    assert len(_WHITE_MAKEUP) == 27 and len(_BLACK_MAKEUP) == 27


_validate_prefix_free()

# decode maps: (bitstring -> run) per color, modes merged with runs at
# the decoder level via longest-match over a bounded code length
_WHITE_DEC = {v: k for k, v in {**_WHITE_TERM, **_WHITE_MAKEUP,
                                **_EXT_MAKEUP}.items()}
_BLACK_DEC = {v: k for k, v in {**_BLACK_TERM, **_BLACK_MAKEUP,
                                **_EXT_MAKEUP}.items()}
_MODE_DEC = {v: k for k, v in _MODE_CODES.items()}
_MAX_WHITE = max(len(c) for c in _WHITE_DEC)
_MAX_BLACK = max(len(c) for c in _BLACK_DEC)
_MAX_MODE = max(len(c) for c in _MODE_DEC)


class _Bits:
    __slots__ = ("s", "pos")

    def __init__(self, data: bytes):
        self.s = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def take_code(self, table: dict, max_len: int) -> object:
        s = self.s
        n = len(s)
        buf = ""
        p = self.pos
        while len(buf) < max_len and p < n:
            buf += "1" if s[p] else "0"
            p += 1
            if buf in table:
                self.pos = p
                return table[buf]
        raise CcittError(f"bad code at bit {self.pos}: {buf!r}")

    def exhausted(self) -> bool:
        return self.pos >= len(self.s)


def _read_run(bits: _Bits, white: bool) -> int:
    """Total run = make-ups (≥64) until a terminating code (<64)."""
    table = _WHITE_DEC if white else _BLACK_DEC
    max_len = _MAX_WHITE if white else _MAX_BLACK
    total = 0
    while True:
        r = bits.take_code(table, max_len)
        total += r
        if r < 64:
            return total


def _decode_2d_row(bits: _Bits, ref: np.ndarray, columns: int
                   ) -> np.ndarray:
    """One 2D-coded row (T.6 modes) against a reference line."""
    cur = np.zeros(columns, dtype=np.uint8)
    a0 = -1
    color = 0   # 0 white, 1 black
    guard = 0
    while a0 < columns:
        guard += 1
        if guard > 4 * columns + 8:
            raise CcittError("no progress in row decode")
        # changing elements on the reference line (pixel differs
        # from its left neighbour; imaginary white at -1)
        ref_changes = np.nonzero(
            ref != np.concatenate(([0], ref[:-1])))[0]
        b1 = columns
        for c in ref_changes:
            if c > (a0 if a0 >= 0 else -1) and (ref[c] != color):
                b1 = c
                break
        b2 = columns
        after = ref_changes[ref_changes > b1]
        if len(after):
            b2 = int(after[0])
        mode = bits.take_code(_MODE_DEC, _MAX_MODE)
        if mode == "P":
            start = max(a0, 0)
            if color:
                cur[start:b2] = 1
            a0 = b2
        elif mode == "H":
            r1 = _read_run(bits, white=(color == 0))
            r2 = _read_run(bits, white=(color == 1))
            start = max(a0, 0)
            a1 = min(start + r1, columns)
            a2 = min(a1 + r2, columns)
            if color:
                cur[start:a1] = 1
            else:
                cur[a1:a2] = 1
            a0 = a2
        else:   # vertical
            delta = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                     "VL1": -1, "VL2": -2, "VL3": -3}[mode]
            a1 = min(max(b1 + delta, 0), columns)
            start = max(a0, 0)
            if color:
                cur[start:a1] = 1
            a0 = a1
            color ^= 1
    return cur


def _decode_1d_row(bits: _Bits, columns: int) -> np.ndarray:
    """One 1D MH row: alternating white/black T.4 runs summing to
    ``columns`` (first run is white, possibly 0)."""
    cur = np.zeros(columns, dtype=np.uint8)
    pos = 0
    white = True
    guard = 0
    while pos < columns:
        guard += 1
        if guard > 2 * columns + 8:
            raise CcittError("no progress in 1D row decode")
        run = _read_run(bits, white=white)
        end = min(pos + run, columns)
        if not white:
            cur[pos:end] = 1
        pos = end
        white = not white
    return cur


def _at_eol(bits: _Bits) -> bool:
    rem = bits.s[bits.pos:bits.pos + 12]
    return len(rem) >= 12 and not rem[:11].any() and bool(rem[11])


def decode_g4(data: bytes, columns: int, rows: int | None = None
              ) -> np.ndarray:
    """T.6 2D decode → (rows, columns) uint8, 1 = black."""
    if columns <= 0 or columns > 1 << 16:
        raise CcittError(f"bad columns {columns}")
    bits = _Bits(data)
    ref = np.zeros(columns, dtype=np.uint8)   # imaginary all-white line
    out_rows: list[np.ndarray] = []
    max_rows = rows if rows else 1 << 20

    while len(out_rows) < max_rows:
        if bits.exhausted():
            break
        # EOFB probe: 000000000001 000000000001
        rem = bits.s[bits.pos:bits.pos + 24]
        if len(rem) < 13 or (len(rem) >= 24
                             and not rem[:11].any() and rem[11]
                             and not rem[12:23].any() and rem[23]):
            break
        cur = _decode_2d_row(bits, ref, columns)
        out_rows.append(cur)
        ref = cur
    if rows and len(out_rows) < rows:
        raise CcittError(f"decoded {len(out_rows)} rows, expected {rows}")
    if not out_rows:
        raise CcittError("no rows decoded")
    return np.stack(out_rows[:rows] if rows else out_rows)


def decode_g3(data: bytes, columns: int, rows: int | None = None, *,
              k: int = 0, byte_align: bool = False) -> np.ndarray:
    """T.4 Group 3 decode → (rows, columns) uint8, 1 = black.

    ``k == 0``: pure 1D MH rows (PDF default framing: no EOLs required,
    but leading/interleaved EOLs are tolerated). ``k > 0``: mixed mode —
    every row is prefixed by EOL + 1 tag bit (1 = 1D, 0 = 2D against
    the previous row)."""
    if columns <= 0 or columns > 1 << 16:
        raise CcittError(f"bad columns {columns}")
    bits = _Bits(data)
    ref = np.zeros(columns, dtype=np.uint8)
    out_rows: list[np.ndarray] = []
    max_rows = rows if rows else 1 << 20

    while len(out_rows) < max_rows:
        if byte_align and bits.pos % 8:
            bits.pos += 8 - bits.pos % 8
        if bits.exhausted():
            break
        eols = 0
        while _at_eol(bits):
            bits.pos += 12
            eols += 1
            if eols >= 6:        # RTC: six consecutive EOLs end the page
                break
        if eols >= 6 or bits.exhausted():
            break
        if len(bits.s) - bits.pos < 4:
            break                # trailing pad bits
        if k > 0:
            if eols == 0 and out_rows:
                raise CcittError("missing EOL in K>0 stream")
            one_d = bool(bits.s[bits.pos])
            bits.pos += 1
            cur = _decode_1d_row(bits, columns) if one_d else \
                _decode_2d_row(bits, ref, columns)
        else:
            cur = _decode_1d_row(bits, columns)
        out_rows.append(cur)
        ref = cur
    if rows and len(out_rows) < rows:
        raise CcittError(f"decoded {len(out_rows)} rows, expected {rows}")
    if not out_rows:
        raise CcittError("no rows decoded")
    return np.stack(out_rows[:rows] if rows else out_rows)


# ---------------------------------------------------------------------------
# encoder (fixtures / roundtrip tests)
# ---------------------------------------------------------------------------

def _run_code(run: int, white: bool) -> str:
    """Make-up codes (greedy largest, chained — the decoder accumulates
    until a terminating code) followed by the terminating code."""
    term = _WHITE_TERM if white else _BLACK_TERM
    makeup = {**(_WHITE_MAKEUP if white else _BLACK_MAKEUP), **_EXT_MAKEUP}
    out = ""
    while run >= 64:
        best = max(k for k in makeup if k <= run)
        out += makeup[best]
        run -= best
    out += term[run]
    return out


def encode_g4(img: np.ndarray) -> bytes:
    """(rows, cols) array (nonzero = black) → T.6 bitstream + EOFB."""
    img = (np.asarray(img) != 0).astype(np.uint8)
    rows, columns = img.shape
    ref = np.zeros(columns, dtype=np.uint8)
    bits: list[str] = []
    for r in range(rows):
        cur = img[r]
        a0 = -1
        color = 0
        while a0 < columns:
            cur_changes = np.nonzero(
                cur != np.concatenate(([0], cur[:-1])))[0]
            # a1: first changing element > a0 of color opposite to the
            # current run color
            a1 = columns
            for c in cur_changes:
                if c > (a0 if a0 >= 0 else -1) and cur[c] != color:
                    a1 = int(c)
                    break
            # a2: next change after a1
            a2 = columns
            for c in cur_changes:
                if c > a1:
                    a2 = int(c)
                    break
            ref_changes = np.nonzero(
                ref != np.concatenate(([0], ref[:-1])))[0]
            b1 = columns
            for c in ref_changes:
                if c > (a0 if a0 >= 0 else -1) and ref[c] != color:
                    b1 = int(c)
                    break
            b2 = columns
            after = ref_changes[ref_changes > b1]
            if len(after):
                b2 = int(after[0])
            if b2 < a1:
                bits.append(_MODE_CODES["P"])
                a0 = b2
            elif abs(a1 - b1) <= 3:
                d = a1 - b1
                bits.append(_MODE_CODES[
                    {0: "V0", 1: "VR1", 2: "VR2", 3: "VR3",
                     -1: "VL1", -2: "VL2", -3: "VL3"}[d]])
                a0 = a1
                color ^= 1
            else:
                bits.append(_MODE_CODES["H"])
                r1 = a1 - max(a0, 0)
                r2 = a2 - a1
                bits.append(_run_code(r1, white=(color == 0)))
                bits.append(_run_code(r2, white=(color == 1)))
                a0 = a2
        ref = cur
    bits.append("000000000001" * 2)   # EOFB
    s = "".join(bits)
    s += "0" * ((-len(s)) % 8)
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def _row_runs(cur: np.ndarray) -> list[int]:
    """Alternating run lengths starting with white (first may be 0)."""
    n = len(cur)
    changes = (np.nonzero(np.diff(cur))[0] + 1).tolist()
    bounds = [0] + changes + [n]
    runs = [bounds[i + 1] - bounds[i] for i in range(len(bounds) - 1)]
    if cur[0] == 1:
        runs = [0] + runs
    return runs


def encode_g3(img: np.ndarray, *, k: int = 0) -> bytes:
    """T.4 Group 3 encode (1D MH rows; ``k>0`` adds EOL+tag framing and
    a 6-EOL RTC trailer). Fixture-side counterpart of ``decode_g3``."""
    img = (np.asarray(img) != 0).astype(np.uint8)
    rows, _columns = img.shape
    bits: list[str] = []
    eol = "000000000001"
    for r in range(rows):
        if k > 0:
            bits.append(eol + "1")      # every row 1D-coded
        white = True
        for run in _row_runs(img[r]):
            bits.append(_run_code(run, white))
            white = not white
    if k > 0:
        bits.append(eol * 6)            # RTC
    s = "".join(bits)
    s += "0" * ((-len(s)) % 8)
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))
