"""JBIG2 (engine/jbig2.py): MMR + arithmetic generic-region roundtrip,
segment framing, honest degradation for symbol/halftone streams, and
the JBIG2Decode PDF path end-to-end.
"""

import struct

import numpy as np
import pytest

from pdf2dom_ray.engine.jbig2 import (Jbig2Error, decode_jbig2,
                                      encode_jbig2_arith,
                                      encode_jbig2_mmr)


def _checker(h, w, period=3):
    y, x = np.mgrid[0:h, 0:w]
    return ((x // period + y // period) % 2).astype(np.uint8)


@pytest.mark.parametrize("shape", [(1, 1), (8, 8), (13, 37), (64, 48)])
def test_mmr_roundtrip(shape):
    img = _checker(*shape)
    assert np.array_equal(decode_jbig2(encode_jbig2_mmr(img)), img)


def test_mmr_roundtrip_sparse_and_solid():
    for img in (np.zeros((9, 17), np.uint8),
                np.ones((9, 17), np.uint8),
                np.eye(12, dtype=np.uint8)):
        assert np.array_equal(decode_jbig2(encode_jbig2_mmr(img)), img)


def test_encoder_deterministic():
    img = _checker(20, 31)
    assert encode_jbig2_mmr(img) == encode_jbig2_mmr(img)


def test_width_height_crop():
    img = _checker(10, 10)
    out = decode_jbig2(encode_jbig2_mmr(img), width=8, height=6)
    assert out.shape == (6, 8)
    assert np.array_equal(out, img[:6, :8])


@pytest.mark.parametrize("template", [0, 1, 2, 3])
@pytest.mark.parametrize("tpgdon", [False, True])
def test_arith_roundtrip(template, tpgdon):
    img = _checker(23, 41, period=4)
    data = encode_jbig2_arith(img, template=template, tpgdon=tpgdon)
    assert np.array_equal(decode_jbig2(data), img)


def test_arith_roundtrip_shapes_and_patterns():
    rng = np.random.default_rng(11)
    for img in (np.zeros((1, 1), np.uint8),
                np.ones((7, 3), np.uint8),
                np.eye(19, dtype=np.uint8),
                (rng.random((31, 29)) < 0.1).astype(np.uint8),
                (rng.random((16, 64)) < 0.5).astype(np.uint8)):
        data = encode_jbig2_arith(img)
        assert np.array_equal(decode_jbig2(data), img)


def test_arith_tpgdon_compresses_repeated_rows():
    # an image of identical rows should be far smaller with TPGDON
    img = np.tile((np.arange(64) % 5 == 0).astype(np.uint8), (64, 1))
    plain = encode_jbig2_arith(img, tpgdon=False)
    typ = encode_jbig2_arith(img, tpgdon=True)
    assert np.array_equal(decode_jbig2(typ), img)
    assert len(typ) < len(plain)


def test_arith_encoder_deterministic():
    img = _checker(20, 31)
    assert encode_jbig2_arith(img) == encode_jbig2_arith(img)


def test_exttemplate_rejected():
    data = bytearray(encode_jbig2_arith(_checker(8, 8)))
    gflags_off = 11 + 19 + 11 + 17
    assert data[gflags_off] == 0x00
    data[gflags_off] = 0x10                  # EXTTEMPLATE
    with pytest.raises(Jbig2Error, match="EXTTEMPLATE"):
        decode_jbig2(bytes(data))


def test_truncated_symbol_dictionary_rejected():
    seg = struct.pack(">IB", 1, 0) + b"\x00\x01" + struct.pack(">I", 4) \
        + b"\x00\x00\x00\x00"
    with pytest.raises(Jbig2Error, match="truncated symbol dictionary"):
        decode_jbig2(seg)


@pytest.mark.parametrize("cut", [3, 12, 40])
def test_truncated_raises(cut):
    data = encode_jbig2_mmr(_checker(16, 16))
    with pytest.raises(Jbig2Error):
        decode_jbig2(data[:cut])


def test_no_regions_raises():
    with pytest.raises(Jbig2Error, match="no decodable"):
        decode_jbig2(b"")


def test_globals_stream_carries_page_info():
    full = encode_jbig2_mmr(_checker(12, 12))
    page_info_seg = full[:11 + 19]
    rest = full[11 + 19:]
    out = decode_jbig2(rest, globals_data=page_info_seg)
    assert np.array_equal(out, _checker(12, 12))


def test_pdf_with_jbig2_image_parses():
    import base64
    import re

    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    bm = _checker(16, 16, period=4)
    b = PdfBuilder(title="jbig2")
    p = PageSpec()
    p.use_custom_image(
        "Im0",
        "/Width 16 /Height 16 /ColorSpace /DeviceGray "
        "/BitsPerComponent 1 /Filter /JBIG2Decode",
        encode_jbig2_mmr(bm), compress=False)
    p.draw_image("Im0", 100, 600, 64, 64)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert r.n_images == 1
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m, "JBIG2 image must produce a non-empty PNG data URI"
    png = decode_engine_png(base64.b64decode(m.group(1)))
    assert png.shape[:2] == (16, 16)
    # black where bitmap=1, white elsewhere
    exp = np.repeat(np.where(bm[..., None] == 1, 0, 255), 3,
                    axis=-1).astype(np.uint8)
    assert np.array_equal(png[..., :3], exp)


def test_pdf_with_arithmetic_jbig2_image_parses():
    import base64
    import re

    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    bm = _checker(16, 16, period=4)
    b = PdfBuilder(title="jbig2-arith")
    p = PageSpec()
    p.use_custom_image(
        "Im0",
        "/Width 16 /Height 16 /ColorSpace /DeviceGray "
        "/BitsPerComponent 1 /Filter /JBIG2Decode",
        encode_jbig2_arith(bm, tpgdon=True), compress=False)
    p.draw_image("Im0", 100, 600, 64, 64)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert r.n_images == 1
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m, "arithmetic JBIG2 must produce a non-empty PNG data URI"
    png = decode_engine_png(base64.b64decode(m.group(1)))
    exp = np.repeat(np.where(bm[..., None] == 1, 0, 255), 3,
                    axis=-1).astype(np.uint8)
    assert np.array_equal(png[..., :3], exp)


def test_pdf_with_truncated_symbol_dict_degrades_to_empty_src():
    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    # a truncated symbol-dictionary segment degrades cleanly
    seg = struct.pack(">IB", 1, 0) + b"\x00\x01" + struct.pack(">I", 4) \
        + b"\x00\x00\x00\x00"
    b = PdfBuilder(title="jbig2-symbol")
    p = PageSpec()
    p.use_custom_image(
        "Im0",
        "/Width 8 /Height 8 /ColorSpace /DeviceGray "
        "/BitsPerComponent 1 /Filter /JBIG2Decode",
        seg, compress=False)
    p.draw_image("Im0", 100, 600, 64, 64)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert r.n_images == 1
    assert 'src=""' in r.html_dom


# ------------------------- symbol dictionary + text region (T.88 §6.4/6.5)

def _glyph(seed, h, w):
    rng = np.random.default_rng(seed)
    g = (rng.random((h, w)) < 0.5).astype(np.uint8)
    g[0, 0] = 1                      # no all-zero top-left corner pixel
    return g


def _compose(syms, placements, pw, ph, refcorner=1, transposed=False):
    """Reference composition for the encoder's placement convention:
    (s, t) anchor; s = left (top if transposed) edge always; t = the
    row/column named by the corner."""
    exp = np.zeros((ph, pw), np.uint8)
    for sid, s, t in placements:
        g = syms[sid]
        h, w = g.shape
        if not transposed:
            y = t - (h - 1 if refcorner in (0, 2) else 0)
            x = s if refcorner in (0, 1) else t * 0 + s  # s is left edge
            exp[y:y + h, s:s + w] |= g
        else:
            x = t - (w - 1 if refcorner in (2, 3) else 0)
            exp[s:s + h, x:x + w] |= g
    return exp


def test_text_region_roundtrip_all_corners():
    from pdf2dom_ray.engine.jbig2 import (decode_jbig2,
                                          encode_jbig2_text_page)
    syms = [_glyph(0, 8, 5), _glyph(1, 8, 6), _glyph(2, 10, 4)]
    for rc in (0, 1, 2, 3):
        t_anchor = 11 if rc in (0, 2) else 2   # bottom vs top row
        pl = [(0, 2, t_anchor), (1, 9, t_anchor), (2, 17, t_anchor + 1),
              (0, 24, t_anchor)]
        out = decode_jbig2(encode_jbig2_text_page(
            syms, pl, 32, 20, refcorner=rc))
        exp = _compose(syms, pl, 32, 20, refcorner=rc)
        assert np.array_equal(out, exp), f"refcorner {rc}"


def test_text_region_transposed():
    from pdf2dom_ray.engine.jbig2 import (decode_jbig2,
                                          encode_jbig2_text_page)
    syms = [_glyph(4, 6, 4), _glyph(5, 7, 5)]
    for rc in (0, 1, 2, 3):
        t_anchor = 10 if rc in (2, 3) else 3   # right vs left column
        pl = [(0, 2, t_anchor), (1, 10, t_anchor)]
        out = decode_jbig2(encode_jbig2_text_page(
            syms, pl, 18, 20, refcorner=rc, transposed=True))
        exp = _compose(syms, pl, 18, 20, refcorner=rc, transposed=True)
        assert np.array_equal(out, exp), f"transposed refcorner {rc}"


def test_text_region_many_strips_and_height_classes():
    from pdf2dom_ray.engine.jbig2 import (decode_jbig2,
                                          encode_jbig2_text_page)
    rng = np.random.default_rng(9)
    syms = [_glyph(10 + i, int(rng.integers(4, 12)),
                   int(rng.integers(3, 9))) for i in range(8)]
    pl = []
    for row in range(6):
        t = row * 14
        x = 1
        for _ in range(5):
            sid = int(rng.integers(0, len(syms)))
            pl.append((sid, x, t))
            x += syms[sid].shape[1] + int(rng.integers(0, 4))
    out = decode_jbig2(encode_jbig2_text_page(syms, pl, 64, 96))
    assert np.array_equal(out, _compose(syms, pl, 64, 96))


def test_text_region_repeated_symbol_reuse():
    # the dictionary is decoded once; ids can repeat arbitrarily
    from pdf2dom_ray.engine.jbig2 import (decode_jbig2,
                                          encode_jbig2_text_page)
    g = _glyph(20, 5, 5)
    pl = [(0, 5 * i, 0) for i in range(8)]
    out = decode_jbig2(encode_jbig2_text_page([g], pl, 40, 5))
    assert np.array_equal(out, np.tile(g, (1, 8)))


def test_huffman_symbol_dict_rejected():
    from pdf2dom_ray.engine.jbig2 import decode_jbig2
    sd = struct.pack(">H", 0x0001) + struct.pack(">II", 1, 1)
    seg = struct.pack(">IB", 1, 0) + b"\x00\x01" \
        + struct.pack(">I", len(sd)) + sd
    with pytest.raises(Jbig2Error, match="Huffman"):
        decode_jbig2(seg)


def test_pdf_with_jbig2_text_region_parses():
    import base64
    import re

    from pdf2dom_ray.engine.jbig2 import encode_jbig2_text_page
    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    syms = [_glyph(30, 7, 5), _glyph(31, 7, 4)]
    pl = [(0, 1, 1), (1, 8, 1), (0, 14, 1)]
    data = encode_jbig2_text_page(syms, pl, 20, 10)
    b = PdfBuilder(title="jbig2-text")
    p = PageSpec()
    p.use_custom_image(
        "Im0",
        "/Width 20 /Height 10 /ColorSpace /DeviceGray "
        "/BitsPerComponent 1 /Filter /JBIG2Decode",
        data, compress=False)
    p.draw_image("Im0", 100, 600, 80, 40)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert r.n_images == 1
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m, "symbol-coded JBIG2 must render a PNG now"
    png = decode_engine_png(base64.b64decode(m.group(1)))
    exp_bm = _compose(syms, pl, 20, 10)
    exp = np.repeat(np.where(exp_bm[..., None] == 1, 0, 255), 3,
                    axis=-1).astype(np.uint8)
    assert np.array_equal(png[..., :3], exp)


# ----------------------------------------------------------- halftones

def _dither_patterns(n, ph, pw, seed=3):
    rng = np.random.default_rng(seed)
    return [(rng.random((ph, pw)) < k / max(n - 1, 1)).astype(np.uint8)
            for k in range(n)]


def _tile(vals, pats):
    return np.block([[pats[v] for v in row] for row in vals])


def test_halftone_roundtrip():
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_halftone
    rng = np.random.default_rng(7)
    pats = _dither_patterns(4, 4, 4)
    vals = rng.integers(0, 4, (6, 9))
    out = decode_jbig2(encode_jbig2_halftone(vals, pats))
    assert np.array_equal(out, _tile(vals, pats))


@pytest.mark.parametrize("template", [0, 1, 2, 3])
def test_halftone_templates(template):
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_halftone
    rng = np.random.default_rng(11)
    pats = _dither_patterns(2, 3, 3)
    vals = rng.integers(0, 2, (5, 5))
    out = decode_jbig2(encode_jbig2_halftone(vals, pats,
                                             template=template))
    assert np.array_equal(out, _tile(vals, pats))


def test_halftone_multi_bitplane():
    # 9 patterns -> 4 gray-coded bitplanes through one shared decoder
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_halftone
    rng = np.random.default_rng(13)
    pats = _dither_patterns(9, 5, 5)
    vals = rng.integers(0, 9, (4, 7))
    out = decode_jbig2(encode_jbig2_halftone(vals, pats))
    assert np.array_equal(out, _tile(vals, pats))


def test_halftone_encoder_deterministic():
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_halftone
    pats = _dither_patterns(3, 4, 4)
    vals = np.arange(12).reshape(3, 4) % 3
    assert encode_jbig2_halftone(vals, pats) == \
        encode_jbig2_halftone(vals, pats)


def test_halftone_value_out_of_range_rejected():
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_halftone
    with pytest.raises(Jbig2Error, match="range"):
        encode_jbig2_halftone(np.array([[0, 5]]),
                              _dither_patterns(2, 3, 3))


def test_mmr_halftone_rejected():
    # flip HMMR in the halftone flags byte: declared-unsupported path
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_halftone
    pats = _dither_patterns(2, 3, 3)
    bs = bytearray(encode_jbig2_halftone(np.array([[0, 1]]), pats))
    # locate the halftone flags byte: it immediately precedes the
    # grid fields (hgw=2, hgh=1) at payload offset 18
    idx = bytes(bs).index(struct.pack(">II", 2, 1)) - 1
    bs[idx] |= 0x01
    with pytest.raises(Jbig2Error, match="MMR halftone"):
        decode_jbig2(bytes(bs))


def test_pdf_with_jbig2_halftone_parses():
    import base64
    import re

    from pdf2dom_ray.engine.jbig2 import encode_jbig2_halftone
    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    rng = np.random.default_rng(17)
    pats = _dither_patterns(4, 4, 4)
    vals = rng.integers(0, 4, (5, 8))
    data = encode_jbig2_halftone(vals, pats)
    exp_bm = _tile(vals, pats)
    h, w = exp_bm.shape
    b = PdfBuilder(title="jbig2-halftone")
    p = PageSpec()
    p.use_custom_image(
        "Im0",
        f"/Width {w} /Height {h} /ColorSpace /DeviceGray "
        "/BitsPerComponent 1 /Filter /JBIG2Decode",
        data, compress=False)
    p.draw_image("Im0", 100, 600, 80, 50)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert r.n_images == 1
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m, "halftone JBIG2 must render a PNG now"
    png = decode_engine_png(base64.b64decode(m.group(1)))
    exp = np.repeat(np.where(exp_bm[..., None] == 1, 0, 255), 3,
                    axis=-1).astype(np.uint8)
    assert np.array_equal(png[..., :3], exp)


# ---------------------------------------------------------- refinement

@pytest.mark.parametrize("template", [0, 1])
def test_refinement_roundtrip(template):
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_refinement
    rng = np.random.default_rng(5)
    base = (rng.random((20, 30)) < 0.4).astype(np.uint8)
    refined = base.copy()
    refined.flat[rng.integers(0, base.size, 25)] ^= 1
    out = decode_jbig2(encode_jbig2_refinement(base, refined,
                                               template=template))
    assert np.array_equal(out, refined)


@pytest.mark.parametrize("template", [0, 1])
def test_refinement_tpgron(template):
    # large uniform areas -> typical rows actually taken
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_refinement
    base = np.zeros((24, 24), np.uint8)
    base[6:18, 6:18] = 1
    refined = base.copy()
    refined[12, 3] = 1
    refined[7, 7] = 0
    bs = encode_jbig2_refinement(base, refined, template=template,
                                 tpgron=True)
    assert np.array_equal(decode_jbig2(bs), refined)


def test_refinement_identity_under_tpgron():
    # every row typical: only SLTP bits and boundary pixels are coded
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_refinement
    base = np.zeros((40, 40), np.uint8)
    base[5:35, 5:35] = 1
    typ = encode_jbig2_refinement(base, base, tpgron=True)
    assert np.array_equal(decode_jbig2(typ), base)


def test_refinement_mixed_typical_rows():
    # rows alternate between typical (uniform interior untouched) and
    # non-typical (an interior flip forces full coding)
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_refinement
    base = np.zeros((30, 30), np.uint8)
    base[4:26, 4:26] = 1
    refined = base.copy()
    refined[10, 10] = 0            # inside the solid block
    refined[20, 2] = 1             # in the blank margin
    bs = encode_jbig2_refinement(base, refined, tpgron=True)
    assert np.array_equal(decode_jbig2(bs), refined)


def test_refinement_encoder_deterministic():
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_refinement
    base = _checker(16, 16)
    refined = 1 - base
    assert encode_jbig2_refinement(base, refined) == \
        encode_jbig2_refinement(base, refined)


def test_refinement_shape_mismatch_rejected():
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_refinement
    with pytest.raises(Jbig2Error, match="shape"):
        encode_jbig2_refinement(np.zeros((4, 4)), np.zeros((5, 4)))


def test_pdf_with_jbig2_refinement_parses():
    import base64
    import re

    from pdf2dom_ray.engine.jbig2 import encode_jbig2_refinement
    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    rng = np.random.default_rng(29)
    base = (rng.random((12, 18)) < 0.3).astype(np.uint8)
    refined = base.copy()
    refined.flat[rng.integers(0, base.size, 10)] ^= 1
    data = encode_jbig2_refinement(base, refined)
    b = PdfBuilder(title="jbig2-refine")
    p = PageSpec()
    p.use_custom_image(
        "Im0",
        "/Width 18 /Height 12 /ColorSpace /DeviceGray "
        "/BitsPerComponent 1 /Filter /JBIG2Decode",
        data, compress=False)
    p.draw_image("Im0", 100, 600, 72, 48)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None and r.n_images == 1
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m
    png = decode_engine_png(base64.b64decode(m.group(1)))
    exp = np.repeat(np.where(refined[..., None] == 1, 0, 255), 3,
                    axis=-1).astype(np.uint8)
    assert np.array_equal(png[..., :3], exp)


# ----------------------------- SBREFINE / REFAGG (refinement in coding)

def test_text_region_sbrefine_roundtrip():
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_text_page
    syms = [_glyph(30, 7, 5), _glyph(31, 7, 4)]
    t1 = syms[0].copy()
    t1[3, 2] ^= 1
    t1[0, 4] ^= 1                  # same-size refinement (bit flips)
    t2 = np.zeros((9, 6), np.uint8)
    t2[1:8, 1:5] = syms[1][:, :4]  # grown refinement
    t2[0, 0] = 1
    pl = [(0, 1, 1), (1, 8, 1), (0, 16, 1)]
    bs = encode_jbig2_text_page(syms, pl, 26, 12, refine={0: t1, 1: t2})
    exp = np.zeros((12, 26), np.uint8)
    for g, s, t in ((t1, 1, 1), (t2, 8, 1), (syms[0], 16, 1)):
        exp[t:t + g.shape[0], s:s + g.shape[1]] |= g
    assert np.array_equal(decode_jbig2(bs), exp)


def test_text_region_sbrefine_shrinking():
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_text_page
    syms = [_glyph(33, 9, 7)]
    small = syms[0][1:8, 1:6].copy()       # negative RDW/RDH
    small[0, 0] = 1
    bs = encode_jbig2_text_page(syms, [(0, 2, 2)], 12, 12,
                                refine={0: small})
    exp = np.zeros((12, 12), np.uint8)
    exp[2:2 + 7, 2:2 + 5] |= small
    assert np.array_equal(decode_jbig2(bs), exp)


def test_refagg_symbol_dict_roundtrip():
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_refagg_page
    base = [_glyph(40, 6, 5), _glyph(41, 8, 4)]
    t0 = base[0].copy()
    t0[2, 2] ^= 1
    t1 = np.zeros((9, 6), np.uint8)
    t1[0:8, 1:5] = base[1]
    t1[8, 0] = 1
    refined = [(0, t0), (1, t1)]
    pl = [(0, 1, 1), (1, 8, 1), (0, 16, 2)]
    out = decode_jbig2(encode_jbig2_refagg_page(base, refined, pl,
                                                24, 12))
    exp = np.zeros((12, 24), np.uint8)
    for rid, s, t in pl:
        g = [t0, t1][rid]
        exp[t:t + g.shape[0], s:s + g.shape[1]] |= g
    assert np.array_equal(out, exp)


def test_refagg_encoder_deterministic():
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_refagg_page
    base = [_glyph(42, 5, 5)]
    t = base[0].copy()
    t[1, 1] ^= 1
    a = encode_jbig2_refagg_page(base, [(0, t)], [(0, 0, 0)], 8, 8)
    b = encode_jbig2_refagg_page(base, [(0, t)], [(0, 0, 0)], 8, 8)
    assert a == b


# --------------------------------------- Huffman symbol dictionaries

def test_huffman_table_roundtrip_std():
    from pdf2dom_ray.engine.jbig2 import _STD_TABLES, _BitReader, _OOB
    for num, vals in ((1, [0, 5, 15, 16, 271, 272, 65807, 65808,
                           1 << 20]),
                      (2, [0, 1, 2, 3, 10, 11, 74, 75, 10_000]),
                      (3, [-300, -257, -256, -1, 0, 5, 74, 75, 9999]),
                      (4, [1, 3, 4, 11, 12, 75, 76, 100_000]),
                      (5, [-999, -256, -255, -1, 0, 1, 12, 76, 500])):
        tab = _STD_TABLES[num]
        bits = []
        for v in vals:
            tab.encode(bits, v)
        rdr = _BitReader(bytes(
            sum(b << (7 - i % 8) for i, b in enumerate(bits[k:k + 8]))
            for k in range(0, len(bits), 8)))
        for v in vals:
            assert tab.decode(rdr) == v, (num, v)


def test_huffman_table_oob():
    from pdf2dom_ray.engine.jbig2 import (_STD_TABLES, _BitReader,
                                          _OOB, _bits_to_bytes)
    for num in (2, 3):
        tab = _STD_TABLES[num]
        bits = []
        tab.encode(bits, 7)
        tab.encode(bits, _OOB)
        tab.encode(bits, 0)
        rdr = _BitReader(_bits_to_bytes(bits))
        assert tab.decode(rdr) == 7
        assert tab.decode(rdr) is _OOB
        assert tab.decode(rdr) == 0


def _hglyphs():
    return [_glyph(60, 7, 5), _glyph(61, 7, 4), _glyph(62, 9, 6)]


@pytest.mark.parametrize("mmr", [False, True])
@pytest.mark.parametrize("custom_dh", [False, True])
def test_huffman_symbol_dict_roundtrip(mmr, custom_dh):
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_huffman_text_page
    syms = _hglyphs()
    pl = [(0, 1, 1), (1, 8, 1), (2, 14, 1), (0, 1, 11)]
    exp = np.zeros((22, 24), np.uint8)
    for sid, s, t in pl:
        g = syms[sid]
        exp[t:t + g.shape[0], s:s + g.shape[1]] |= g
    bs = encode_jbig2_huffman_text_page(syms, pl, 24, 22, mmr=mmr,
                                        custom_dh=custom_dh)
    assert np.array_equal(decode_jbig2(bs), exp)


def test_huffman_dict_encoder_deterministic():
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_huffman_text_page
    syms = _hglyphs()
    pl = [(0, 0, 0)]
    assert encode_jbig2_huffman_text_page(syms, pl, 8, 8) == \
        encode_jbig2_huffman_text_page(syms, pl, 8, 8)


def test_pdf_with_huffman_jbig2_parses():
    import base64
    import re

    from pdf2dom_ray.engine.jbig2 import encode_jbig2_huffman_text_page
    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    syms = _hglyphs()
    pl = [(0, 1, 1), (2, 8, 1)]
    exp_bm = np.zeros((12, 16), np.uint8)
    for sid, s, t in pl:
        g = syms[sid]
        exp_bm[t:t + g.shape[0], s:s + g.shape[1]] |= g
    data = encode_jbig2_huffman_text_page(syms, pl, 16, 12, mmr=True)
    b = PdfBuilder(title="jbig2-huffman")
    p = PageSpec()
    p.use_custom_image(
        "Im0",
        "/Width 16 /Height 12 /ColorSpace /DeviceGray "
        "/BitsPerComponent 1 /Filter /JBIG2Decode",
        data, compress=False)
    p.draw_image("Im0", 100, 600, 64, 48)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None and r.n_images == 1
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m
    png = decode_engine_png(base64.b64decode(m.group(1)))
    exp = np.repeat(np.where(exp_bm[..., None] == 1, 0, 255), 3,
                    axis=-1).astype(np.uint8)
    assert np.array_equal(png[..., :3], exp)


def _sbhuff_ref(syms, placements, w, h):
    ref = np.zeros((h, w), dtype=np.uint8)
    for sid, s, t in placements:
        sym = syms[sid]
        ref[t:t + sym.shape[0], s:s + sym.shape[1]] |= sym
    return ref


@pytest.mark.parametrize("fs_sel,ds_sel,dt_sel",
                         [(0, 0, 0), (1, 1, 1), (0, 2, 2), (1, 0, 2)])
def test_sbhuff_text_region_roundtrip(fs_sel, ds_sel, dt_sel):
    # SBHUFF=1 text regions: standard tables B.6-B.13 + the stream-
    # carried symbol-ID runcode table (T.88 §7.4.4.1.7)
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_huffman_text_page
    syms = [_glyph(9, 6, 5), _glyph(10, 8, 7), _glyph(11, 5, 6)]
    pl = [(0, 3, 2), (1, 15, 2), (2, 30, 2), (0, 3, 20), (2, 12, 20)]
    data = encode_jbig2_huffman_text_page(
        syms, pl, 64, 40, sbhuff=True,
        sb_tables=(fs_sel, ds_sel, dt_sel))
    assert np.array_equal(decode_jbig2(data), _sbhuff_ref(syms, pl, 64, 40))


def test_sbhuff_single_symbol_degenerate_id_code():
    # one symbol → equal-length ID codes degenerate; decode still works
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_huffman_text_page
    syms = [_glyph(3, 5, 4)]
    pl = [(0, 2, 2), (0, 20, 10)]
    data = encode_jbig2_huffman_text_page(syms, pl, 32, 20, sbhuff=True)
    assert np.array_equal(decode_jbig2(data), _sbhuff_ref(syms, pl, 32, 20))


def test_sbhuff_text_region_refinement_roundtrip():
    # §6.4.11 Huffman mode: RI raw bit, RDW/RDH/RDX/RDY via B.15,
    # BMSIZE via B.1, byte-aligned fresh-arithmetic refinement data —
    # grown, shrunk, and same-size targets plus unrefined instances
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_huffman_text_page
    syms = [_glyph(9, 6, 5), _glyph(10, 8, 7), _glyph(11, 5, 6)]
    t0 = syms[0].copy()
    t0[2, 3] ^= 1
    t0[0, 0] ^= 1                       # same-size (bit flips)
    t1 = np.zeros((10, 9), np.uint8)
    t1[1:9, 1:8] = syms[1]              # grown (+RDW/+RDH)
    t1[0, 0] = 1
    t2 = syms[2][1:5, 1:4].copy()       # shrunk (negative deltas)
    t2[0, 0] = 1
    pl = [(0, 3, 2), (1, 15, 2), (2, 30, 2), (0, 3, 20), (2, 12, 20)]
    refine = {0: t0, 1: t1, 4: t2}
    data = encode_jbig2_huffman_text_page(syms, pl, 64, 40, sbhuff=True,
                                          refine=refine)
    exp = np.zeros((40, 64), np.uint8)
    for idx, (sid, s, t) in enumerate(pl):
        g = refine.get(idx, syms[sid])
        exp[t:t + g.shape[0], s:s + g.shape[1]] |= g
    assert np.array_equal(decode_jbig2(data), exp)
    # deterministic bytes
    assert data == encode_jbig2_huffman_text_page(
        syms, pl, 64, 40, sbhuff=True, refine=refine)


def test_sbhuff_refinement_with_nonzero_table_selectors():
    # refinement composes with non-default FS/DS/DT standard tables
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_huffman_text_page
    syms = [_glyph(12, 7, 5)]
    big = np.zeros((9, 7), np.uint8)
    big[1:8, 1:6] = syms[0]
    big[0, 6] = 1
    pl = [(0, 2, 2), (0, 14, 2), (0, 2, 14)]
    data = encode_jbig2_huffman_text_page(
        syms, pl, 32, 24, sbhuff=True, sb_tables=(1, 2, 1),
        refine={1: big})
    exp = np.zeros((24, 32), np.uint8)
    for idx, (sid, s, t) in enumerate(pl):
        g = big if idx == 1 else syms[sid]
        exp[t:t + g.shape[0], s:s + g.shape[1]] |= g
    assert np.array_equal(decode_jbig2(data), exp)


def test_pdf_with_sbhuff_jbig2_image_parses():
    # full surface drive: PDF → JBIG2Decode filter → SBHUFF text
    # region → PNG data URI in the emitted DOM
    import base64
    import re

    from pdf2dom_ray.engine.jbig2 import encode_jbig2_huffman_text_page
    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    syms = [_glyph(9, 6, 5), _glyph(10, 8, 7)]
    pl = [(0, 2, 2), (1, 12, 2), (0, 22, 6)]
    data = encode_jbig2_huffman_text_page(syms, pl, 32, 16, sbhuff=True)
    exp_bm = _sbhuff_ref(syms, pl, 32, 16)

    b = PdfBuilder(title="jbig2-sbhuff")
    p = PageSpec()
    p.use_custom_image(
        "Im0",
        "/Width 32 /Height 16 /ColorSpace /DeviceGray "
        "/BitsPerComponent 1 /Filter /JBIG2Decode",
        data, compress=False)
    p.draw_image("Im0", 100, 600, 64, 32)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert r.n_images == 1
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m, "SBHUFF JBIG2 must produce a non-empty PNG data URI"
    png = decode_engine_png(base64.b64decode(m.group(1)))
    exp = np.repeat(np.where(exp_bm[..., None] == 1, 0, 255), 3,
                    axis=-1).astype(np.uint8)
    assert np.array_equal(png[..., :3], exp)


def test_sbhuff_refinement_truncated_bmsize_rejected():
    # SBHUFF per-instance refinement now decodes (see the roundtrip
    # tests above); a BMSIZE that overruns the stream must still fail
    # cleanly, not read past the payload
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_huffman_text_page
    syms = [_glyph(9, 5, 5)]
    tgt = syms[0].copy()
    tgt[1, 1] ^= 1
    bs = encode_jbig2_huffman_text_page(syms, [(0, 0, 0)], 8, 8,
                                        sbhuff=True, refine={0: tgt})
    with pytest.raises(Jbig2Error):
        decode_jbig2(bs[:-3])              # truncate refinement bytes


def test_refagg_multi_instance_aggregate():
    # a new symbol built as a little embedded text region (§6.5.8.2.1)
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_refagg_page
    base = [_glyph(40, 6, 5), _glyph(41, 8, 4)]
    t0 = base[0].copy()
    t0[2, 2] ^= 1
    agg_inst = [(0, 0, 1), (1, 6, 0)]
    agg = np.zeros((8, 11), np.uint8)
    agg[1:7, 0:5] |= base[0]
    agg[0:8, 6:10] |= base[1]
    refined = [(0, t0), ("agg", agg_inst, (11, 8))]
    pl = [(0, 1, 1), (1, 8, 1), (1, 1, 10)]
    out = decode_jbig2(encode_jbig2_refagg_page(base, refined, pl,
                                                22, 20))
    exp = np.zeros((20, 22), np.uint8)
    for rid, s, t in pl:
        g = [t0, agg][rid]
        exp[t:t + g.shape[0], s:s + g.shape[1]] |= g
    assert np.array_equal(out, exp)


def test_refagg_aggregate_multiple_strips():
    # aggregate whose instances span two strip rows
    from pdf2dom_ray.engine.jbig2 import encode_jbig2_refagg_page
    base = [_glyph(44, 4, 4)]
    agg_inst = [(0, 0, 0), (0, 5, 0), (0, 2, 6)]
    agg = np.zeros((10, 9), np.uint8)
    for bi, s, t in agg_inst:
        agg[t:t + 4, s:s + 4] |= base[0]
    refined = [("agg", agg_inst, (9, 10))]
    out = decode_jbig2(encode_jbig2_refagg_page(base, refined,
                                                [(0, 0, 0)], 9, 10))
    assert np.array_equal(out, agg)
