"""Text-path edge cases: NBSP, diacritic merge, horizontal scaling (Tz),
text rise (Ts), multi-char ToUnicode (ligatures)."""

from pdf2dom_ray.engine.parse import parse_document
from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder


def build(content: bytes, splice_tounicode: dict | None = None) -> bytes:
    b = PdfBuilder()
    p = PageSpec()
    p.use_core_font("F1", "Courier")
    p.raw(content)
    b.add_page(p)
    data = b.build()
    if splice_tounicode:
        entries = "".join(f"<{c:02X}> <{u}>\n" for c, u in
                          splice_tounicode.items())
        cmap = (f"1 begincodespacerange <00> <FF> endcodespacerange\n"
                f"{len(splice_tounicode)} beginbfchar\n{entries}endbfchar\n"
                ).encode()
        obj = (b"9 0 obj\n<< /Length " + str(len(cmap)).encode() +
               b" >>\nstream\n" + cmap + b"\nendstream\nendobj\n")
        data = data.replace(b"/BaseFont /Courier >>",
                            b"/BaseFont /Courier /ToUnicode 9 0 R >>")
        data = data.replace(b"\nxref\n", b"\n" + obj + b"\nxref\n", 1)
    return data


def texts(r):
    return [s["text"] for s in r.spans]


def test_nbsp_not_whitespace():
    """Java trim strips only chars <= U+0020 — NBSP stays in the box
    (PDFBoxTree.java:599)."""
    r = parse_document(build(
        b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (a\xa0b) Tj ET",
        splice_tounicode={0x61: "0061", 0xA0: "00A0", 0x62: "0062"}))
    assert texts(r) == ["a b"]


def test_diacritic_merged_into_following_glyph():
    """The reference holds a pending diacritic and merges it into the
    NEXT glyph iff they overlap (PDFBoxTree.java:595-605) — a diacritic
    drawn over the *previous* glyph is dropped. Replicate both."""
    # dia drawn at the position where 'x' will land → overlap → merged
    r = parse_document(build(
        b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (e) Tj "
        b"1 0 0 1 106 700 Tm (\x80) Tj "
        b"1 0 0 1 106 700 Tm (x) Tj ET",
        splice_tounicode={0x65: "0065", 0x80: "0301", 0x78: "0078"}))
    assert "".join(texts(r)) == "ex́"

    # dia drawn over the PREVIOUS glyph, no overlap with the next →
    # dropped exactly like the reference
    r2 = parse_document(build(
        b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (e) Tj "
        b"1 0 0 1 100 700 Tm (\x80) Tj "
        b"1 0 0 1 106 700 Tm (x) Tj ET",
        splice_tounicode={0x65: "0065", 0x80: "0301", 0x78: "0078"}))
    assert "".join(texts(r2)) == "ex"


def test_tz_horizontal_scaling_halves_widths():
    r = parse_document(build(
        b"BT /F1 10 Tf 50 Tz 1 0 0 1 100 700 Tm (mm) Tj ET"))
    # Courier 600/1000*10 = 6pt per glyph at 100%; at 50% → 3pt each
    assert abs(r.spans[0]["width"] - 6.0) < 0.01
    r2 = parse_document(build(
        b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (mm) Tj ET"))
    assert abs(r2.spans[0]["width"] - 12.0) < 0.01


def test_ts_rise_shifts_baseline():
    r = parse_document(build(
        b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (base) Tj "
        b"3 Ts (sup) Tj 0 Ts ET"))
    tops = [s["top"] for s in r.spans]
    # rise 3 moves the baseline up → smaller top; also forces a split
    # via |disty| > 1
    assert len(tops) == 2
    assert abs((tops[0] - tops[1]) - 3.0) < 0.01


def test_multichar_tounicode_ligature():
    r = parse_document(build(
        b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (a\x81b) Tj ET",
        splice_tounicode={0x61: "0061", 0x81: "006600660069", 0x62: "0062"}))
    assert texts(r) == ["affib"]


def test_fast_and_slow_interleave():
    """An ASCII run (fast path) followed by a ToUnicode run (slow path)
    continuing the same box."""
    r = parse_document(build(
        b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (ab) Tj ET\n"
        b"BT /F1 10 Tf 1 0 0 1 112 700 Tm (\xe9) Tj ET",
        splice_tounicode={0x61: "0061", 0x62: "0062", 0xE9: "00E9"}))
    # é at exactly the pen position → same box, no split
    assert texts(r) == ["abé"]


def test_differences_encoding():
    """Simple font with /Encoding /Differences remapping codes to AGL
    glyph names (PDF 32000 9.6.6)."""
    b = PdfBuilder()
    p = PageSpec()
    p.use_core_font("F1", "Courier")
    p.raw(b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (ab\x80) Tj ET")
    b.add_page(p)
    data = b.build()
    data = data.replace(
        b"/BaseFont /Courier >>",
        b"/BaseFont /Courier /Encoding << /Type /Encoding "
        b"/Differences [ 97 /eacute 128 /Euro ] >> >>")
    r = parse_document(data)
    assert r.error is None
    # code 97 ('a') → é via Differences; 'b' untouched; 0x80 → €
    assert "".join(s["text"] for s in r.spans) == "éb€"


def test_winansi_encoding_high_bytes():
    b = PdfBuilder()
    p = PageSpec()
    p.use_core_font("F1", "Courier")
    p.raw(b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (x\x93y\x94) Tj ET")
    b.add_page(p)
    data = b.build().replace(
        b"/BaseFont /Courier >>",
        b"/BaseFont /Courier /Encoding /WinAnsiEncoding >>")
    r = parse_document(data)
    assert "".join(s["text"] for s in r.spans) == "x“y”"


def test_glyphlist_uni_names():
    from pdf2dom_ray.engine.glyphlist import glyph_to_unicode
    assert glyph_to_unicode("eacute") == "é"
    assert glyph_to_unicode("uni05D0") == "א"
    assert glyph_to_unicode("u1F600") == "😀"
    assert glyph_to_unicode("nosuchglyphname") is None
    assert glyph_to_unicode("a") == "a"


def test_rtl_vectorized_equivalence():
    """Uniform-RTL runs take the vectorized path; output must be
    bit-identical to the per-glyph loop (incl. box reversal)."""
    from pdf2dom_ray.engine import walker as W
    b = PdfBuilder()
    p = PageSpec()
    p.use_core_font("F1", "Courier")
    p.raw(b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (abc de) Tj "
          b"1 0 0 1 100 686 Tm (fgh ab) Tj ET")
    b.add_page(p)
    data = b.build()
    cmap = (b"1 begincodespacerange <00> <FF> endcodespacerange\n"
            b"9 beginbfchar\n<20> <0020>\n"
            b"<61> <05D0>\n<62> <05D1>\n<63> <05D2>\n<64> <05D3>\n"
            b"<65> <05D4>\n<66> <05D5>\n<67> <05D6>\n<68> <05D7>\nendbfchar\n")
    obj = (b"9 0 obj\n<< /Length " + str(len(cmap)).encode() +
           b" >>\nstream\n" + cmap + b"\nendstream\nendobj\n")
    data = data.replace(b"/BaseFont /Courier >>",
                        b"/BaseFont /Courier /ToUnicode 9 0 R >>")
    data = data.replace(b"\nxref\n", b"\n" + obj + b"\nxref\n", 1)
    try:
        W.FAST_ASCII = False
        slow = parse_document(data)
        W.FAST_ASCII = True
        fast = parse_document(data)
    finally:
        W.FAST_ASCII = True
    assert slow.error is None and fast.error is None
    assert slow.html_dom == fast.html_dom
    assert slow.spans == fast.spans
    # boxes are reversed strings (finishBox RTL rule)
    assert fast.spans[0]["text"] == "גבא"
