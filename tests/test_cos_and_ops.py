"""COS-layer robustness + operator coverage: ', " show ops, inline
images, filters, multi-stream pages, color spaces, damaged xref
recovery, text-string decoding."""

import zlib

import numpy as np

from pdf2dom_ray.engine.cos import Lexer, PdfDocument
from pdf2dom_ray.engine.parse import parse_document
from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder


def simple_pdf(content: bytes, font="Courier") -> bytes:
    b = PdfBuilder()
    p = PageSpec()
    p.use_core_font("F1", font)
    p.raw(content)
    b.add_page(p)
    return b.build()


def texts(r):
    return [s["text"] for s in r.spans]


# -- show-text operator variants --------------------------------------------

def test_quote_operator_advances_line():
    r = parse_document(simple_pdf(
        b"BT /F1 10 Tf 14 TL 1 0 0 1 100 700 Tm (one) Tj (two) ' ET"))
    assert texts(r) == ["one", "two"]
    assert r.extracted_text == "one\ntwo"
    assert abs(r.spans[1]["top"] - r.spans[0]["top"] - 14.0) < 0.01


def test_double_quote_operator_sets_spacing():
    r = parse_document(simple_pdf(
        b'BT /F1 10 Tf 14 TL 1 0 0 1 100 700 Tm (ab) Tj 3 1 (cd) " ET'))
    assert texts(r) == ["ab", "cd"]
    assert r.spans[1]["word_spacing"] == 3.0
    assert r.spans[1]["letter_spacing"] == 1.0


def test_td_and_tstar():
    r = parse_document(simple_pdf(
        b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (a) Tj 0 -20 Td (b) Tj "
        b"20 TL T* (c) Tj ET"))
    assert texts(r) == ["a", "b", "c"]
    tops = [s["top"] for s in r.spans]
    assert tops[1] - tops[0] > 19
    assert tops[2] - tops[1] > 19


def test_td_negative_leading():
    # TD sets leading = -ty (PDF 32000 9.4.2)
    r = parse_document(simple_pdf(
        b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (a) Tj 0 -15 TD (b) Tj "
        b"T* (c) Tj ET"))
    tops = [s["top"] for s in r.spans]
    assert abs((tops[2] - tops[1]) - 15.0) < 0.01


# -- inline images / unknown ops skipped ------------------------------------

def test_inline_image_skipped():
    r = parse_document(simple_pdf(
        b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (before) Tj ET\n"
        b"BI /W 2 /H 2 /CS /RGB /BPC 8 ID \x00\x01\x02\x03\x04\x05"
        b"\x06\x07\x08\x09\x0a\x0b EI\n"
        b"BT /F1 10 Tf 1 0 0 1 100 680 Tm (after) Tj ET"))
    assert texts(r) == ["before", "after"]


def test_bezier_ops_ignored_like_reference():
    # c/v/y are not registered in the reference → silently dropped
    r = parse_document(simple_pdf(
        b"100 100 m 150 200 200 100 250 150 c S\n"
        b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (text) Tj ET"))
    assert texts(r) == ["text"]
    assert r.error is None


# -- filters / streams -------------------------------------------------------

def test_flate_content_stream():
    content = b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (flated) Tj ET"
    raw = zlib.compress(content)
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>\nendobj\n"
           b"5 0 obj\n<< /Length " + str(len(raw)).encode() +
           b" /Filter /FlateDecode >>\nstream\n" + raw + b"\nendstream\nendobj\n")
    r = parse_document(pdf)
    assert texts(r) == ["flated"]


def test_no_xref_no_trailer_recovery():
    """The scan-based loader needs neither xref nor trailer."""
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 200] "
           b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
           b"5 0 obj\n<< /Length 46 >>\nstream\n"
           b"BT /F1 10 Tf 1 0 0 1 10 100 Tm (rescued) Tj ET\nendstream\nendobj\n")
    r = parse_document(pdf)
    assert r.error is None
    assert texts(r) == ["rescued"]


def test_contents_array_concatenated():
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /Font << /F1 4 0 R >> >> /Contents [5 0 R 6 0 R] >>\nendobj\n"
           b"4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>\nendobj\n"
           b"5 0 obj\n<< /Length 37 >>\nstream\n"
           b"BT /F1 10 Tf 1 0 0 1 10 700 Tm (px) Tj\nendstream\nendobj\n"
           b"6 0 obj\n<< /Length 7 >>\nstream\n(qy) Tj\nendstream\nendobj\n")
    r = parse_document(pdf)
    # second stream continues the text object state of the first
    assert "px" in r.extracted_text and "qy" in r.extracted_text


# -- colors ------------------------------------------------------------------

def test_gray_and_cmyk_colors():
    r = parse_document(simple_pdf(
        b"0.5 g BT /F1 10 Tf 1 0 0 1 100 700 Tm (gray) Tj ET\n"
        b"1 0 0 0 k BT /F1 10 Tf 1 0 0 1 100 650 Tm (cyan) Tj ET"))
    assert r.spans[0]["color"] == "#7f7f7f"  # 0.5*255 = 127.5 → trunc 127
    assert r.spans[1]["color"] == "#00ffff"


def test_scn_with_cs():
    r = parse_document(simple_pdf(
        b"/DeviceRGB cs 0 0.5 1 scn "
        b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (c) Tj ET"))
    assert r.spans[0]["color"] == "#007fff"


def test_q_restores_color():
    r = parse_document(simple_pdf(
        b"q 1 0 0 rg BT /F1 10 Tf 1 0 0 1 100 700 Tm (red) Tj ET Q\n"
        b"BT /F1 10 Tf 1 0 0 1 100 650 Tm (black) Tj ET"))
    assert r.spans[0]["color"] == "#ff0000"
    assert r.spans[1]["color"] == "#000000"


# -- COS lexer ----------------------------------------------------------------

def test_lexer_strings():
    lex = Lexer(rb"(a\(b\)c\\d\171)")
    assert lex.parse_object() == b"a(b)c\\dy"
    lex = Lexer(b"<48656C6C6F>")
    assert lex.parse_object() == b"Hello"
    lex = Lexer(b"(nested (parens) here)")
    assert lex.parse_object() == b"nested (parens) here"


def test_lexer_names_and_refs():
    lex = Lexer(b"/Name#20With#20Spaces")
    assert lex.parse_object() == "Name With Spaces"
    lex = Lexer(b"12 0 R")
    assert tuple(lex.parse_object()) == (12, 0)
    lex = Lexer(b"12 0")  # not a ref
    assert lex.parse_object() == 12


def test_utf16_title():
    b = PdfBuilder(title=None)
    p = PageSpec()
    p.use_core_font("F1", "Courier")
    p.text_block("F1", 10, 36, 750, ["x"])
    b.add_page(p)
    data = b.build()
    # splice a UTF-16BE title Info object
    title = "Über".encode("utf-16-be")
    info = b"8 0 obj\n<< /Title (\xfe\xff" + title + b") >>\nendobj\n"
    data = data.replace(b"\nxref\n", b"\n" + info + b"\nxref\n", 1)
    data = data.replace(b" >>\nstartxref", b" /Info 8 0 R >>\nstartxref", 1)
    r = parse_document(data)
    assert "<title>Über</title>" in r.html_dom


def test_incremental_update_wins():
    """Later object definitions override earlier ones (incremental
    update semantics of the scan loader)."""
    base = simple_pdf(b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (old) Tj ET")
    # append a replacement content stream object with the same number;
    # object 2 is the content stream in PdfBuilder's layout for 1 page —
    # find its number by scanning for the stream containing '(old)'
    import re
    m = re.search(rb"(\d+) 0 obj\n<< /Length \d+ >>\nstream\n[^e]*old",
                  base)
    num = m.group(1)
    newc = b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (new) Tj ET\n"
    patch = (num + b" 0 obj\n<< /Length " + str(len(newc)).encode() +
             b" >>\nstream\n" + newc + b"\nendstream\nendobj\n")
    r = parse_document(base + patch)
    assert texts(r) == ["new"]


def test_cr_only_line_endings():
    """Classic MacOS CR-only PDFs must parse (EOL handling in the
    stream scanner and lexer)."""
    pdf = (b"%PDF-1.4\r"
           b"1 0 obj\r<< /Type /Catalog /Pages 2 0 R >>\rendobj\r"
           b"2 0 obj\r<< /Type /Pages /Count 1 /Kids [3 0 R] >>\rendobj\r"
           b"3 0 obj\r<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>\rendobj\r"
           b"4 0 obj\r<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>\rendobj\r"
           b"5 0 obj\r<< /Length 44 >>\rstream\r"
           b"BT /F1 10 Tf 1 0 0 1 10 700 Tm (crmac) Tj ET\rendstream\rendobj\r")
    r = parse_document(pdf)
    assert r.error is None
    assert texts(r) == ["crmac"]


def test_unbalanced_q_Q():
    """Extra Q pops are ignored; unclosed q leaves state as-is (PDFBox
    tolerates both)."""
    r = parse_document(simple_pdf(
        b"Q Q\nq q 1 0 0 rg\n"
        b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (ok) Tj ET"))
    assert r.error is None
    assert r.spans[0]["color"] == "#ff0000"


def test_comment_inside_object():
    r = parse_document(simple_pdf(
        b"% leading comment\n"
        b"BT /F1 10 Tf % inline comment\n1 0 0 1 100 700 Tm (c) Tj ET"))
    assert texts(r) == ["c"]


def test_png_predictor_decoding():
    """FlateDecode with /Predictor 12 (PNG Up) — common in xref and
    image streams of real web PDFs."""
    import zlib as _z
    import numpy as np
    from pdf2dom_ray.engine.cos import Stream
    # build predictor-encoded data: 3 rows × 4 cols, Up filter
    rows = np.array([[10, 20, 30, 40], [11, 21, 31, 41], [12, 22, 32, 42]],
                    dtype=np.uint8)
    enc = bytearray()
    prev = np.zeros(4, dtype=np.int32)
    for r in rows:
        enc.append(2)  # Up
        enc.extend(((r.astype(np.int32) - prev) & 0xFF).astype(np.uint8))
        prev = r.astype(np.int32)
    payload = _z.compress(bytes(enc))
    s = Stream({"Filter": "FlateDecode",
                "DecodeParms": {"Predictor": 12, "Colors": 1,
                                "BitsPerComponent": 8, "Columns": 4}},
               payload, None)
    assert s.data() == rows.tobytes()


def test_png_predictor_paeth_sub():
    import zlib as _z
    import numpy as np
    from pdf2dom_ray.engine.cos import _apply_png_predictor
    # round-trip check: encode with Sub then decode
    row = np.array([5, 10, 20, 35, 55], dtype=np.uint8)
    enc = bytearray([1, 5])  # Sub filter, first byte raw
    for i in range(1, 5):
        enc.append((int(row[i]) - int(row[i - 1])) & 0xFF)
    out = _apply_png_predictor(bytes(enc), 1, 8, 5)
    assert out == row.tobytes()
