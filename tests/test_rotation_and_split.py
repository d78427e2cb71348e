"""Page-rotation quadrant fixtures (TestPageRotation.java:15-101) and
box-split predicate fixtures (PDFBoxTree.java:632-637), plus bidi.
"""

import re

import pytest

from pdf2dom_ray.engine.parse import parse_document
from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder


def css_rect(style: str):
    def grab(prop):
        m = re.search(rf"{prop}:(-?[\d.]+)pt", style)
        return float(m.group(1)) if m else None
    return grab("left"), grab("top"), grab("width"), grab("height")


def build_rotated(rot: int) -> bytes:
    """Rect near the user-space bottom-left + image near top-right."""
    import numpy as np
    b = PdfBuilder()
    p = PageSpec(612, 792, rotate=rot)
    p.rect(50, 50, 100, 40, fill=(1, 0, 0))
    img = np.zeros((4, 4, 3), np.uint8)
    p.use_image("Im0", img)
    p.draw_image("Im0", 500, 700, 50, 50)
    b.add_page(p)
    return b.build()


def page_dims(r):
    m = re.search(r'class="page" style="width:([\d.]+)pt;height:([\d.]+)pt',
                  r.html_dom)
    return float(m.group(1)), float(m.group(2))


@pytest.mark.parametrize("rot", [0, 90, 180, 270])
def test_rotation_page_dims(rot):
    r = parse_document(build_rotated(rot))
    w, h = page_dims(r)
    if rot in (90, 270):
        assert (w, h) == (792.0, 612.0)  # swapped (PDFDomTree.java:280-284)
    else:
        assert (w, h) == (612.0, 792.0)


@pytest.mark.parametrize("rot,quadrant", [
    (0, "bottom-left"), (90, "top-left"), (180, "top-right"),
    (270, "bottom-right")])
def test_rotation_rect_quadrant(rot, quadrant):
    """The user-space bottom-left rect lands in the expected display
    quadrant after rotation (δ=10pt like TestUtils.java:93-161)."""
    r = parse_document(build_rotated(rot))
    w, h = page_dims(r)
    style = re.search(r'class="r" style="([^"]*)"', r.html_dom).group(1)
    left, top, rw, rh = css_rect(style)
    cx = left + rw / 2
    cy = top + rh / 2
    horiz = "left" if cx < w / 2 else "right"
    vert = "top" if cy < h / 2 else "bottom"
    assert f"{vert}-{horiz}" == quadrant


@pytest.mark.parametrize("rot", [0, 90, 180, 270])
def test_rotation_image_opposite_quadrant(rot):
    r = parse_document(build_rotated(rot))
    w, h = page_dims(r)
    style = re.search(r"<img style=\"([^\"]*)\"", r.html_dom).group(1)
    left, top, iw, ih = css_rect(style)
    # image starts user-space top-right; rect user-space bottom-left —
    # they must land in opposite quadrants in every rotation
    rstyle = re.search(r'class="r" style="([^"]*)"', r.html_dom).group(1)
    rl, rt, rw, rh = css_rect(rstyle)
    assert ((left + iw / 2 < w / 2) != (rl + rw / 2 < w / 2)) or \
           ((top + ih / 2 < h / 2) != (rt + rh / 2 < h / 2))


# -- box-split predicate -----------------------------------------------------

def glyph_pdf(ops: list[bytes]) -> bytes:
    b = PdfBuilder()
    p = PageSpec()
    p.use_core_font("F1", "Courier")  # fixed 600/1000 widths
    p.raw(b"BT /F1 10 Tf\n" + b"\n".join(ops) + b"\nET")
    b.add_page(p)
    return b.build()


def texts(r):
    return [s["text"] for s in r.spans]


def test_split_on_positive_gap():
    # Courier glyph advance = 6pt at size 10; a 7pt jump > 1.0 splits
    r = parse_document(glyph_pdf([
        b"1 0 0 1 100 700 Tm (ab) Tj",
        b"1 0 0 1 119 700 Tm (cd) Tj",   # gap = 119-112 = 7 > 1.0
    ]))
    assert texts(r) == ["ab", "cd"]


def test_no_split_within_tolerance():
    r = parse_document(glyph_pdf([
        b"1 0 0 1 100 700 Tm (ab) Tj",
        b"1 0 0 1 112.5 700 Tm (cd) Tj",   # gap = 0.5 <= 1.0 → same box
    ]))
    assert texts(r) == ["abcd"]


def test_split_on_negative_gap():
    r = parse_document(glyph_pdf([
        b"1 0 0 1 100 700 Tm (ab) Tj",
        b"1 0 0 1 105 700 Tm (cd) Tj",    # distx = 105-112 = -7 < -6 → split
    ]))
    assert texts(r) == ["ab", "cd"]


def test_small_negative_overlap_no_split():
    r = parse_document(glyph_pdf([
        b"1 0 0 1 100 700 Tm (ab) Tj",
        b"1 0 0 1 109 700 Tm (cd) Tj",    # distx = -3 ∈ (-6, 1] → same box
    ]))
    assert texts(r) == ["abcd"]


def test_split_on_vertical_shift():
    r = parse_document(glyph_pdf([
        b"1 0 0 1 100 700 Tm (ab) Tj",
        b"1 0 0 1 112 698.5 Tm (cd) Tj",  # |disty| = 1.5 > 1.0 → split
    ]))
    assert texts(r) == ["ab", "cd"]


def test_split_on_style_change():
    r = parse_document(glyph_pdf([
        b"1 0 0 1 100 700 Tm (ab) Tj",
        b"0.9 0 0 1 112 700 Tm (cd) Tj",  # fontSize (xScale) differs → split
    ]))
    assert len(texts(r)) == 2


def test_split_on_color_change():
    r = parse_document(glyph_pdf([
        b"1 0 0 1 100 700 Tm (ab) Tj",
        b"1 0 0 RG 0 0 1 rg (cd) Tj",     # fill color change → style split
    ]))
    assert texts(r) == ["ab", "cd"]


def test_word_split_via_space():
    r = parse_document(glyph_pdf([b"1 0 0 1 100 700 Tm (hi there) Tj"]))
    # space advance (6pt) > 1.0 → one box per word; space glyphs dropped
    assert texts(r) == ["hi", "there"]


def test_letter_spacing_splits_everything():
    r = parse_document(glyph_pdf([b"2 Tc 1 0 0 1 100 700 Tm (abc) Tj"]))
    # Tc=2 → inter-glyph gap 2pt > 1.0 → every glyph its own box
    assert texts(r) == ["a", "b", "c"]
    assert all(s["letter_spacing"] == 2.0 for s in r.spans)


def test_word_spacing_applies_to_space_code():
    r = parse_document(glyph_pdf([b"5 Tw 1 0 0 1 100 700 Tm (a b) Tj"]))
    assert texts(r) == ["a", "b"]
    # second box starts 6 (space) + 5 (Tw) + 6 = after a wider gap
    assert abs(r.spans[1]["left"] - (100 + 6 + 6 + 5)) < 0.01
    assert all(s["word_spacing"] == 5.0 for s in r.spans)


# -- TJ adjustments ----------------------------------------------------------

def test_tj_array_kerning():
    r = parse_document(glyph_pdf([
        b"1 0 0 1 100 700 Tm [(ab) -700 (cd)] Tj".replace(b"Tj", b"TJ"),
    ]))
    # -700/1000*10 = 7pt extra gap → split
    assert texts(r) == ["ab", "cd"]


def test_tj_small_kerning_no_split():
    r = parse_document(glyph_pdf([
        b"1 0 0 1 100 700 Tm [(ab) -50 (cd)] TJ",
    ]))
    assert texts(r) == ["abcd"]


# -- bidi / RTL (PDFBoxTree.java:666-669, 686-699) --------------------------

def hebrew_pdf():
    """Simple font + ToUnicode mapping codes to Hebrew letters."""
    b = PdfBuilder()
    p = PageSpec()
    p.use_core_font("F1", "Courier")
    p.raw(b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (abc) Tj ET")
    b.add_page(p)
    data = b.build()
    # patch in a ToUnicode CMap mapping a/b/c → א/ב/ג
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"1 begincodespacerange <00> <FF> endcodespacerange\n"
            b"3 beginbfchar\n"
            b"<61> <05D0>\n<62> <05D1>\n<63> <05D2>\nendbfchar\n"
            b"endcmap end")
    extra = (b"9 0 obj\n<< /Length " + str(len(cmap)).encode() +
             b" >>\nstream\n" + cmap + b"\nendstream\nendobj\n")
    # naive splice: add the object and reference it from the font dict
    data = data.replace(b"/BaseFont /Courier >>",
                        b"/BaseFont /Courier /ToUnicode 9 0 R >>")
    data = data.replace(b"\nxref\n", b"\n" + extra + b"\nxref\n", 1)
    return data


def test_rtl_box_reversed():
    r = parse_document(hebrew_pdf())
    assert r.error is None
    # glyph order אבג; first char is RTL → emitted string reversed
    assert texts(r) == ["גבא"]
