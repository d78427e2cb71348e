"""Type0/CID composite fonts, form XObjects, font-table admission rules
(PDFBoxTree.java:368-406, FontTable.java) and a hypothesis-based
fast/slow path equivalence property for the box state machine."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf2dom_ray.engine import walker as walker_mod
from pdf2dom_ray.engine.parse import parse_document
from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder


def test_type0_identity_h_text():
    b = PdfBuilder()
    p = PageSpec()
    p.use_type0_font("F1", "AAAAAA+CidFont", seed=5)
    p.text_hex("F1", 12, 100, 700, "Hello CID")
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert r.extracted_text.replace("\n", " ") == "Hello CID"
    # Type0 + CIDFontType2 descendant is admitted to the font table
    # (PDFBoxTree.java:380-387) → @font-face with the family-regex name
    assert '@font-face {font-family:"AAAAAA CidFont";' in r.html_dom
    assert r.spans[0]["font_family"] == "AAAAAA CidFont"


def test_type0_word_spacing_not_applied():
    # Tw applies only to single-byte code 32 — not to 2-byte CID 0x0020
    b = PdfBuilder()
    p = PageSpec()
    p.use_type0_font("F1", "BBBBBB+CidFont", seed=6, cid_width=500)
    p.raw(b"BT /F1 10 Tf 100 Tw 1 0 0 1 100 700 Tm "
          b"<00610020 0062> Tj ET")
    b.add_page(p)
    r = parse_document(b.build())
    texts = [s["text"] for s in r.spans]
    assert texts == ["a", "b"]
    # gap = CID-space advance only (5pt at size 10, width 500), Tw ignored
    assert abs(r.spans[1]["left"] - 110.0) < 0.01


def test_form_xobject_text_recursion():
    b = PdfBuilder()
    p = PageSpec()
    p.use_core_font("F0", "Helvetica")
    p.text_block("F0", 12, 36, 750, ["outer"])
    p.use_form("Fm0",
               b"BT /FF 10 Tf 1 0 0 1 50 100 Tm (inner) Tj ET",
               matrix=(1, 0, 0, 1, 200, 300),
               fonts={"FF": {"kind": "core", "base": "Courier"}})
    p.draw_form("Fm0")
    b.add_page(p)
    r = parse_document(b.build())
    assert "outer" in r.extracted_text
    assert "inner" in r.extracted_text
    inner = [s for s in r.spans if s["text"] == "inner"][0]
    # form matrix translates (50,100) → (250,400) user → display y=792-400
    assert abs(inner["left"] - 250.0) < 0.01
    # "courier" does not contain "couriernew" → known-family miss → raw name
    assert inner["font_family"] == "Courier"


def test_form_resources_fonts_admitted():
    """updateFontTable recurses into form XObject resources
    (PDFBoxTree.java:394-405)."""
    b = PdfBuilder()
    p = PageSpec()
    p.use_form("Fm0", b"BT /FE 10 Tf 1 0 0 1 50 100 Tm (emb) Tj ET",
               fonts={"FE": {"kind": "ttf", "base": "CCCCCC+FormFont",
                             "seed": 9, "widths": None,
                             "first_char": 32}})
    p.draw_form("Fm0")
    b.add_page(p)
    r = parse_document(b.build())
    assert '@font-face {font-family:"CCCCCC FormFont";' in r.html_dom


def test_font_used_name_suffix_dedup():
    """Two distinct embedded fonts with the same family get name, name1
    (FontTable.java:77-99)."""
    b = PdfBuilder()
    p = PageSpec()
    p.use_embedded_ttf("F1", "XXXXXX+Dup", seed=1)
    p.use_embedded_ttf("F2", "YYYYYY+Dup", seed=2)
    # same derived family "… Dup"? different prefixes → different names;
    # use same full family by matching prefix groups
    p.text_block("F1", 10, 36, 750, ["one"])
    p.text_block("F2", 10, 36, 700, ["two"])
    b.add_page(p)
    r = parse_document(b.build())
    assert '"XXXXXX Dup"' in r.html_dom
    assert '"YYYYYY Dup"' in r.html_dom


def test_type1_font_not_admitted():
    """Core Type1 fonts carry no FontFile → invalid entry → no font-face
    (FontTable.java:159-170, 214-218)."""
    b = PdfBuilder()
    p = PageSpec()
    p.use_core_font("F1", "Garamond-Custom")  # unknown base, no payload
    p.text_block("F1", 12, 36, 750, ["t"])
    b.add_page(p)
    r = parse_document(b.build())
    assert "@font-face" not in r.html_dom
    # known-family match on "Garamond" substring (PDFBoxTree.java:91)
    assert r.spans[0]["font_family"] == "Garamond"


# -- property test: fast/slow path equivalence (M10) ------------------------

@st.composite
def glyph_runs(draw):
    """Random sequence of Tm placements + ASCII strings."""
    n = draw(st.integers(1, 6))
    ops = []
    x = 100.0
    for _ in range(n):
        x += draw(st.floats(-8, 15))
        y = 700.0 + draw(st.floats(-2, 2))
        s = draw(st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1, max_size=12))
        s = s.replace("(", "[").replace(")", "]").replace("\\", "/")
        ops.append(f"1 0 0 1 {x:.3f} {y:.3f} Tm ({s}) Tj".encode())
        x += 20
    return b"BT /F1 10 Tf\n" + b"\n".join(ops) + b"\nET"


@settings(max_examples=60, deadline=None)
@given(content=glyph_runs())
def test_fast_slow_equivalence(content):
    b = PdfBuilder()
    p = PageSpec()
    p.use_core_font("F1", "Helvetica")
    p.raw(content)
    b.add_page(p)
    data = b.build()
    try:
        walker_mod.FAST_ASCII = False
        slow = parse_document(data)
        walker_mod.FAST_ASCII = True
        fast = parse_document(data)
    finally:
        walker_mod.FAST_ASCII = True
    assert slow.html_dom == fast.html_dom
    assert slow.extracted_text == fast.extracted_text
    assert slow.spans == fast.spans


def test_font_save_to_dir_uses_raw_name(tmp_path):
    """Save-to-dir font files are named by the RAW PostScript name
    (TestFonts.java:76 expects 'EKCFJL+Omsym2.woff'), while @font-face
    uses the deduped family usedName."""
    from pdf2dom_ray.config import SAVE_TO_DIR, PdfDomConfig
    b = PdfBuilder()
    p = PageSpec()
    p.use_embedded_ttf("F1", "EKCFJL+Omsym2", seed=3)
    p.text_block("F1", 12, 36, 750, ["x"])
    b.add_page(p)
    r = parse_document(b.build(), PdfDomConfig(font_handler=SAVE_TO_DIR))
    paths = [res["path"] for res in r.resources]
    assert paths == ["resources/EKCFJL+Omsym2.otf"]
    assert "src:url('resources/EKCFJL+Omsym2.otf')" in r.html_dom
    assert 'font-family:"EKCFJL Omsym2"' in r.html_dom


def test_bare_cff_font_converted_to_woff():
    """The bare-CFF fixture mirror (TestFonts.java:29-53): @font-face
    present, x-font-woff mime, WOFF parses with >1 tables."""
    import base64
    import re
    from pdf2dom_ray.engine.woff import parse_woff_header
    b = PdfBuilder()
    p = PageSpec()
    p.use_type1c_font("F1", "EKCFJL+Omsym2")
    p.text_block("F1", 12, 36, 750, ["Bye"])
    b.add_page(p)
    r = parse_document(b.build())
    assert "@font-face" in r.html_dom
    assert "data:application/x-font-woff;base64," in r.html_dom
    m = re.search(r"x-font-woff;base64,([^']*)'", r.html_dom)
    woff = base64.b64decode(m.group(1))
    num_tables, tags = parse_woff_header(woff)
    assert num_tables > 1
    assert b"CFF " in tags
    # div.p uses the font family (TestFonts.java:56-65)
    assert r.spans[0]["font_family"] == "EKCFJL Omsym2"


def test_bare_cff_save_to_dir_woff_ending():
    from pdf2dom_ray.config import SAVE_TO_DIR, PdfDomConfig
    b = PdfBuilder()
    p = PageSpec()
    p.use_type1c_font("F1", "EKCFJL+Omsym2")
    p.text_block("F1", 12, 36, 750, ["x"])
    b.add_page(p)
    r = parse_document(b.build(), PdfDomConfig(font_handler=SAVE_TO_DIR))
    assert [res["path"] for res in r.resources] == \
        ["resources/EKCFJL+Omsym2.woff"]


def test_cff_roundtrip_info():
    from pdf2dom_ray.engine.woff import cff_info, cff_to_woff
    from pdf2dom_ray.synth.pdfgen import tiny_cff
    cff = tiny_cff("MyFont", n_glyphs=7)
    name, n = cff_info(cff)
    assert name == "MyFont"
    assert n == 7
    woff = cff_to_woff(cff)
    assert woff[:4] == b"wOFF"
