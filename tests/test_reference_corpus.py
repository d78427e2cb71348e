"""Conformance over the reference's REAL test PDFs.

The only ground-truth exercise of real-world fonts/encodings/images
available without a JVM: every PDF under the reference's
``src/test/resources`` is parsed through the engine's Ray-free kernel
and the reference's own structural assertions are replayed —
`TestPDFDomTree.java:30-85` (rendering modes, page range),
`TestFonts.java:32-93` (bare-CFF → WOFF), `TestImages.java` (save-to-
dir naming), `TestPageRotation.java` (0/90/180/270 geometry, delta=10
area checks from `TestUtils.java:91-158`), `TestPaths.java` (filled
non-rect path → raster). Byte-level drift is locked separately by
sha256 goldens in ``tests/goldens/reference_corpus.json``.

Ray-free (pure kernel) — no ray_session fixture.
"""

from __future__ import annotations

import base64
import json
import os
import re
import struct

import pytest

REF = "/root/reference/src/test/resources"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus not present")

FILES = [
    "HorariosMadrid_Segovia.pdf", "images.pdf", "3-page-document.pdf",
    "fonts/bare-cff.pdf", "shapes/arrow-path.pdf",
    "text-rendering-mode-neither.pdf", "text-rendering-mode-fill.pdf",
    "text-rendering-mode-stroke.pdf",
    "text-rendering-mode-stroke-and-fill.pdf",
    "page-rotation/object-page-rotate-0.pdf",
    "page-rotation/object-page-rotate-90.pdf",
    "page-rotation/object-page-rotate-180.pdf",
    "page-rotation/object-page-rotate-270.pdf",
]

_DELTA = 10.0          # TestUtils.java:91


@pytest.fixture(scope="module")
def parsed():
    """Each reference PDF parsed ONCE (default embed-base64 config)."""
    from pdf2dom_ray.engine.parse import parse_document
    out = {}
    for rel in FILES:
        with open(os.path.join(REF, rel), "rb") as f:
            out[rel] = parse_document(f.read())
    return out


def _first_style(html: str, cls: str) -> str:
    m = re.search(f'class="{cls}" style="([^"]*)"', html)
    assert m, f"no element of class {cls}"
    return m.group(1)


def _style_rect(style: str) -> tuple[float, float, float, float]:
    """(left, top, width, height) — missing properties read as 0
    (TestPageRotation.findNumberProperty)."""
    vals = {}
    for prop in ("left", "top", "width", "height"):
        m = re.search(f"{prop}:([-0-9.]+)(pt|px);", style)
        vals[prop] = float(m.group(1)) if m else 0.0
    return vals["left"], vals["top"], vals["width"], vals["height"]


def _page_rect(html: str) -> tuple[float, float, float, float]:
    m = re.search('class="page" style="([^"]*)"', html)
    assert m
    return _style_rect(m.group(1))


def _first_img_style(html: str) -> str:
    m = re.search('<img style="([^"]*)"', html)
    assert m, "no <img> in output"
    return m.group(1)


# -- TestPDFDomTree.java: text rendering modes ------------------------

def test_neither_mode_text_is_invisible(parsed):
    style = _first_style(
        parsed["text-rendering-mode-neither.pdf"].html_dom, "p")
    assert "color:rgba(0,0,0,0)" in style        # BoxStyle.transparentColor


def test_fill_mode_filled_no_outline(parsed):
    style = _first_style(
        parsed["text-rendering-mode-fill.pdf"].html_dom, "p")
    assert "color:#8000fe;" in style or "color:#8000ff;" in style
    assert "webkit-text-stroke" not in style


def test_stroke_mode_outlined_not_filled(parsed):
    style = _first_style(
        parsed["text-rendering-mode-stroke.pdf"].html_dom, "p")
    assert "color:rgba(0,0,0,0)" in style
    assert "webkit-text-stroke: #ff00ff" in style


def test_stroke_and_fill_mode(parsed):
    style = _first_style(
        parsed["text-rendering-mode-stroke-and-fill.pdf"].html_dom, "p")
    assert "color:#9af0e7" in style or "color:#9af0e6" in style
    assert "webkit-text-stroke: #ff00ff" in style


# -- TestPDFDomTree.java:78-85: page range ----------------------------

def test_multipage_first_page_only(parsed):
    from pdf2dom_ray.config import PdfDomConfig
    from pdf2dom_ray.engine.parse import parse_document
    with open(os.path.join(REF, "3-page-document.pdf"), "rb") as f:
        data = f.read()
    html = parse_document(
        data, PdfDomConfig(start_page=0, end_page=1)).html_dom
    assert "#1" in html
    assert "#2" not in html and "#3" not in html
    # and the unrestricted parse carries all three
    full = parsed["3-page-document.pdf"].html_dom
    assert "#1" in full and "#2" in full and "#3" in full


# -- TestFonts.java: bare-CFF → WOFF ----------------------------------

def test_bare_cff_woff_font_face_in_style(parsed):
    html = parsed["fonts/bare-cff.pdf"].html_dom
    assert "@font-face" in html
    assert "x-font-woff" in html


def test_bare_cff_woff_is_readable(parsed):
    html = parsed["fonts/bare-cff.pdf"].html_dom
    m = re.search(r"x-font-woff;base64,([^']*)'", html)
    assert m
    woff = base64.b64decode(m.group(1))
    sig, _flavor, _length, num_tables = struct.unpack(">IIIH",
                                                      woff[:14])
    assert sig == 0x774F4646                      # 'wOFF'
    assert num_tables > 1                         # TestFonts.java:53


def test_bare_cff_div_uses_font(parsed):
    style = _first_style(parsed["fonts/bare-cff.pdf"].html_dom, "p")
    assert "font-family:" in style


def test_bare_cff_save_to_dir_font_file(tmp_path):
    from pdf2dom_ray.config import SAVE_TO_DIR, PdfDomConfig
    from pdf2dom_ray.engine.parse import parse_document
    with open(os.path.join(REF, "fonts/bare-cff.pdf"), "rb") as f:
        data = f.read()
    r = parse_document(data, PdfDomConfig(font_handler=SAVE_TO_DIR))
    names = [res["path"].rsplit("/", 1)[-1] for res in r.resources]
    assert "EKCFJL+Omsym2.woff" in names          # TestFonts.java:76
    assert ("EKCFJL+Omsym2.woff" in r.html_dom)   # url points at file


def test_bare_cff_ignore_fonts_no_font_face(parsed):
    from pdf2dom_ray.config import IGNORE, PdfDomConfig
    from pdf2dom_ray.engine.parse import parse_document
    with open(os.path.join(REF, "fonts/bare-cff.pdf"), "rb") as f:
        data = f.read()
    r = parse_document(data, PdfDomConfig(font_handler=IGNORE))
    assert "@font-face" not in r.html_dom


# -- TestImages.java: save-to-dir naming ------------------------------

def _saved_image_names(rel: str) -> list[str]:
    from pdf2dom_ray.config import SAVE_TO_DIR, PdfDomConfig
    from pdf2dom_ray.engine.parse import parse_document
    with open(os.path.join(REF, rel), "rb") as f:
        data = f.read()
    r = parse_document(data, PdfDomConfig(image_handler=SAVE_TO_DIR))
    assert r.error is None
    return [res["path"].rsplit("/", 1)[-1] for res in r.resources]


def test_images_pdf_first_and_second_saved(parsed):
    names = _saved_image_names("images.pdf")
    assert "Untitled.png" in names
    assert "Untitled1.png" in names               # dedup suffix


def test_horarios_same_name_dedup_terminates(parsed):
    names = _saved_image_names("HorariosMadrid_Segovia.pdf")
    assert "PDF Document.png" in names
    assert "PDF Document1.png" in names


# -- TestPageRotation.java: 0/90/180/270 geometry ---------------------

def _rot_html(parsed, deg: int) -> str:
    return parsed[
        f"page-rotation/object-page-rotate-{deg}.pdf"].html_dom


def _in_top(t, page):
    return -_DELTA < t[1] < page[3] / 2


def _in_bottom(t, page):
    return page[3] / 2 < t[1] < page[3] + _DELTA


def _in_left(t, page):
    return -_DELTA < t[0] < page[2] / 2


def _in_right(t, page):
    return page[2] / 2 < t[0] < page[2] + _DELTA


def _not_outside(t, page):
    return (t[0] + t[2] < page[2] + _DELTA
            and t[1] + t[3] < page[3] + _DELTA)


@pytest.mark.parametrize("deg,vert,horiz", [
    (0, _in_top, _in_left), (90, _in_top, _in_right),
    (180, _in_bottom, _in_right), (270, _in_bottom, _in_left)])
def test_rotation_image_position(parsed, deg, vert, horiz):
    html = _rot_html(parsed, deg)
    page = _page_rect(html)
    img = _style_rect(_first_img_style(html))
    assert vert(img, page) and horiz(img, page)


@pytest.mark.parametrize("deg,vert,horiz", [
    (0, _in_bottom, _in_right), (90, _in_bottom, _in_left),
    (180, _in_top, _in_left), (270, _in_top, _in_right)])
def test_rotation_rect_position(parsed, deg, vert, horiz):
    html = _rot_html(parsed, deg)
    page = _page_rect(html)
    rect = _style_rect(_first_style(html, "r"))
    assert vert(rect, page) and horiz(rect, page)
    assert _not_outside(rect, page)


# -- TestPaths.java: filled non-rect path → raster --------------------

def test_arrow_path_creates_image(parsed):
    assert "<img" in parsed["shapes/arrow-path.pdf"].html_dom


def test_arrow_path_image_fill_color(parsed):
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    html = parsed["shapes/arrow-path.pdf"].html_dom
    m = re.search(r"data:image/png;base64,([A-Za-z0-9+/=]+)", html)
    assert m
    arr = decode_engine_png(base64.b64decode(m.group(1)))
    h = arr.shape[0]
    fill = (arr[..., 0].astype(int) == 217) & \
           (arr[..., 1].astype(int) == 217) & \
           (arr[..., 2].astype(int) == 217)
    if arr.shape[2] == 4:
        fill &= arr[..., 3].astype(int) > 0
    assert fill[: max(h // 2, 1)].any(), "no fill color in top area"
    assert fill[h // 2:].any(), "no fill color in bottom area"


# -- corpus-wide: clean parses + byte-identity goldens ----------------

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "reference_corpus.json")


def test_all_files_parse_clean(parsed):
    for rel, r in parsed.items():
        assert r.error is None, f"{rel}: {r.error}"
        assert r.num_pages >= 1
        assert len(r.html_dom) > 200


def test_html_dom_sha256_goldens(parsed):
    """The spec-lock: any serializer/float/box change over REAL PDFs
    must regenerate these hashes CONSCIOUSLY (CLAUDE.md invariant).
    Regenerate: python scripts/regen_reference_goldens.py"""
    import hashlib
    want = json.load(open(GOLDEN))
    got = {rel: hashlib.sha256(r.html_dom.encode()).hexdigest()
           for rel, r in parsed.items()}
    assert got == want
