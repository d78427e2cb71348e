"""Classic PDF stream filters: LZWDecode (EarlyChange semantics),
ASCII85Decode, RunLengthDecode, TIFF predictor 2.

PDFBox supports all of these via its filter registry; older web PDFs
(pre-Flate tooling) use LZW heavily. The LZW test encoder mirrors the
spec encoder including clear-on-full-table resets, so the decoder's
early-change width bumps and 12-bit overflow handling are exercised.
"""

import numpy as np
import pytest

from pdf2dom_ray.engine.cos import (PdfParseError, _ascii85_decode,
                                    _lzw_decode, _runlength_decode)
from pdf2dom_ray.engine.parse import parse_document


def lzw_encode(data: bytes) -> bytes:
    """Reference encoder (EarlyChange=1, clear-on-full) for roundtrips."""
    out_bits = []

    def reset():
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, next_code, width = reset()

    def emit(code, w):
        out_bits.append(format(code, f"0{w}b"))

    emit(256, width)
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code >= (1 << width) - 1:
            if width < 12:
                width += 1
            else:
                emit(256, width)
                table, next_code, width = reset()
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
    emit(257, width)
    s = "".join(out_bits)
    s += "0" * ((-len(s)) % 8)
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def test_lzw_roundtrip_variety():
    rng = np.random.default_rng(0)
    cases = [b"", b"A", b"AAAAAAAAAAAA",
             bytes(rng.integers(0, 256, 50_000, dtype=np.uint8).tolist()),
             b"the quick brown fox " * 3000,
             bytes(range(256)) * 40]
    for c in cases:
        assert _lzw_decode(lzw_encode(c)) == c


def test_lzw_bad_code_raises():
    with pytest.raises(PdfParseError):
        # first code after clear must be a literal; 0x7FD0... forces an
        # out-of-range first code (511 at width 9)
        _lzw_decode(bytes([0b10000000, 0b01111111, 0b11000000]))


def test_ascii85_and_runlength():
    import base64
    assert _ascii85_decode(base64.a85encode(b"hello world") + b"~>") == \
        b"hello world"
    assert _ascii85_decode(b"<~" + base64.a85encode(b"xyz") + b"~>") == b"xyz"
    rle = bytes([2]) + b"abc" + bytes([129]) + b"z" + bytes([128])
    assert _runlength_decode(rle) == b"abc" + b"z" * 128


def _pdf_with_filtered_content(filter_name: bytes, content: bytes,
                               payload: bytes) -> bytes:
    return (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>"
            b"\nendobj\n"
            b"4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"
            b"\nendobj\n"
            b"5 0 obj\n<< /Length " + str(len(payload)).encode()
            + b" /Filter /" + filter_name + b" >>\nstream\n" + payload
            + b"\nendstream\nendobj\n"
            b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n")


@pytest.mark.parametrize("filter_name,encode", [
    (b"LZWDecode", lzw_encode),
    (b"ASCII85Decode", lambda c: __import__("base64").a85encode(c) + b"~>"),
    (b"RunLengthDecode",
     lambda c: b"".join(bytes([0]) + bytes([b]) for b in c) + bytes([128])),
])
def test_pdf_with_filtered_content_stream(filter_name, encode):
    content = b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (filtered stream) Tj ET"
    pdf = _pdf_with_filtered_content(filter_name, content, encode(content))
    r = parse_document(pdf)
    assert r.error is None, (filter_name, r.error)
    assert "filtered stream" in r.extracted_text
