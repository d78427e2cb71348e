"""Baseline JPEG codec (engine/jpeg.py) + DCTDecode end-to-end.

The reference decodes DCT images via PDFBox/ImageIO
(`PDFBoxTree.java:544-590`); this engine carries its own baseline
decoder. Tests: encoder/decoder roundtrip across subsampling modes,
restart intervals, odd sizes, grayscale, error paths, determinism, and
a DCT-image PDF parsing to a non-empty PNG data URI.
"""

import base64
import re

import numpy as np
import pytest

from pdf2dom_ray.engine.jpeg import (JpegError, decode_baseline_jpeg,
                                     encode_baseline_jpeg)


def _smooth(h, w):
    x = np.linspace(0, 200, w)
    y = np.linspace(0, 180, h)
    return np.stack([np.add.outer(y * 0.5, x * 0.5),
                     np.add.outer(y * 0.3, x * 0.6),
                     np.tile(x * 0.9, (h, 1))], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("ri", [0, 2])
def test_roundtrip_smooth(sub, ri):
    img = _smooth(48, 64)
    dec = decode_baseline_jpeg(
        encode_baseline_jpeg(img, 90, subsampling=sub, restart_interval=ri))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 2.0
    assert err.max() < 16


def test_roundtrip_odd_dims_and_gray():
    g = (np.add.outer(np.arange(19), np.arange(13)) % 256).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(g, 95, restart_interval=1))
    assert dec.shape == g.shape
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 2


def test_flat_color_lossless():
    img = np.full((16, 24, 3), 77, np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(img, 85))
    assert (dec == img).all()


def test_encoder_deterministic():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8).astype(np.uint8)
    assert encode_baseline_jpeg(img, 85) == encode_baseline_jpeg(img, 85)


def test_decode_errors():
    with pytest.raises(JpegError):
        decode_baseline_jpeg(b"")
    with pytest.raises(JpegError):
        decode_baseline_jpeg(b"\x89PNG not a jpeg")
    with pytest.raises(JpegError):   # truncated SOF (precision 0)
        decode_baseline_jpeg(b"\xff\xd8\xff\xc2\x00\x04\x00\x00")
    with pytest.raises(JpegError):   # arithmetic-coded SOF9
        decode_baseline_jpeg(b"\xff\xd8\xff\xc9\x00\x04\x08\x00")


def test_pdf_with_dct_image_parses():
    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    b = PdfBuilder(title="dct")
    p = PageSpec()
    img = np.full((16, 16, 3), 0, np.uint8)
    img[..., 0] = 180      # red-ish block: survives JPEG quantization
    p.use_jpeg_image("Im0", img, quality=90)
    p.draw_image("Im0", 100, 600, 64, 64)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert r.n_images == 1
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m, "DCT image must produce a non-empty PNG data URI"
    png = decode_engine_png(base64.b64decode(m.group(1)))
    assert png.shape[0] == 16 and png.shape[1] == 16
    # decoded color within JPEG quantization error of the original
    assert abs(int(png[..., 0].mean()) - 180) < 8
    assert int(png[..., 1].mean()) < 24


def test_pdf_with_gray_dct_image_parses():
    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    b = PdfBuilder(title="dct-gray")
    p = PageSpec()
    g = (np.add.outer(np.arange(8), np.arange(8)) * 4).astype(np.uint8)
    p.use_jpeg_image("Im0", g, quality=95)
    p.draw_image("Im0", 100, 600, 32, 32)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert r.n_images == 1
    assert 'src="data:image/png;base64,' in r.html_dom


# -- sfnt normalization (FontTable.java:172-191 FontVerter parity) ----------

def test_sfnt_normalize_rebuilds_checksums():
    import struct
    from pdf2dom_ray.engine.sfnt import _checksum, normalize_ttf
    from pdf2dom_ray.synth.pdfgen import tiny_ttf
    raw = tiny_ttf(5)
    norm = normalize_ttf(raw)
    assert norm != raw
    assert normalize_ttf(norm) == norm               # idempotent
    assert _checksum(norm) == 0xB1B0AFBA             # head adjustment
    def tags(d):
        n = struct.unpack(">H", d[4:6])[0]
        return sorted(d[12 + 16 * i:12 + 16 * i + 4] for i in range(n))
    assert tags(raw) == tags(norm)                   # table set preserved


def test_sfnt_normalize_passthrough_on_garbage():
    from pdf2dom_ray.engine.sfnt import normalize_ttf
    assert normalize_ttf(b"not a font") == b"not a font"
    assert normalize_ttf(b"") == b""
    assert normalize_ttf(b"\x00\x01\x00\x00\xff\xff") == \
        b"\x00\x01\x00\x00\xff\xff"


# -- CCITT Group 4 (T.6) -----------------------------------------------------

def test_ccitt_g4_roundtrip_variety():
    from pdf2dom_ray.engine.ccitt import decode_g4, encode_g4
    rng = np.random.default_rng(0)
    cases = [
        np.zeros((5, 40), np.uint8),
        np.ones((4, 40), np.uint8),
        (rng.random((20, 100)) > 0.7).astype(np.uint8),
        (rng.random((12, 1728)) > 0.98).astype(np.uint8),
    ]
    for img in cases:
        dec = decode_g4(encode_g4(img), img.shape[1], img.shape[0])
        assert (dec == img).all()


def test_ccitt_g4_bad_data_raises():
    from pdf2dom_ray.engine.ccitt import CcittError, decode_g4
    with pytest.raises(CcittError):
        # an all-ones run of 14 bits cannot start any mode code chain
        # that terminates; row decode detects no progress / bad code
        decode_g4(b"\x00\x08\x00\x00", 64, 4)   # invalid 0-run prefix
    with pytest.raises(CcittError):
        decode_g4(b"", 64, 4)                   # no rows at all


def test_pdf_with_ccitt_image_parses():
    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder
    import base64

    bm = np.zeros((16, 24), np.uint8)
    bm[4:12, 6:18] = 1                  # black box on white
    b = PdfBuilder(title="fax")
    p = PageSpec()
    p.use_ccitt_image("Im0", bm)
    p.draw_image("Im0", 100, 600, 96, 64)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert r.n_images == 1
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m
    png = decode_engine_png(base64.b64decode(m.group(1)))
    assert png.shape[:2] == (16, 24)
    assert png[8, 12, 0] == 0      # black inside the box
    assert png[0, 0, 0] == 255     # white background


# -- progressive (SOF2) ------------------------------------------------------

@pytest.mark.parametrize("sub", ["444", "420"])
def test_progressive_decodes_bit_identical_to_baseline(sub):
    """Progressive scans reorder the same quantized coefficients, so
    decoded pixels must equal the baseline file's decode EXACTLY."""
    from pdf2dom_ray.engine.jpeg import (decode_baseline_jpeg,
                                         encode_baseline_jpeg,
                                         encode_progressive_jpeg)
    rng = np.random.default_rng(7)
    imgs = [
        rng.integers(0, 256, (33, 41, 3), dtype=np.uint8).astype(np.uint8),
        _smooth(48, 64),
    ]
    sparse = np.zeros((40, 56, 3), np.uint8)
    sparse[8:10, 8:10] = 200          # long EOB runs + AC refinement
    imgs.append(sparse)
    for img in imgs:
        base = decode_baseline_jpeg(
            encode_baseline_jpeg(img, 85, subsampling=sub))
        prog = decode_baseline_jpeg(
            encode_progressive_jpeg(img, 85, subsampling=sub))
        assert prog.shape == base.shape
        assert (prog == base).all()


def test_progressive_gray_and_pdf_end_to_end():
    import re as _re
    from pdf2dom_ray.engine.jpeg import (decode_baseline_jpeg,
                                         encode_baseline_jpeg,
                                         encode_progressive_jpeg)
    g = (np.add.outer(np.arange(19), np.arange(13)) % 256).astype(np.uint8)
    assert (decode_baseline_jpeg(encode_progressive_jpeg(g, 95))
            == decode_baseline_jpeg(encode_baseline_jpeg(g, 95))).all()


def test_pdf_with_progressive_dct_image_parses():
    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    b = PdfBuilder(title="prog")
    p = PageSpec()
    img = np.full((16, 16, 3), 0, np.uint8)
    img[..., 2] = 200
    p.use_jpeg_image("Im0", img, quality=90, progressive=True)
    p.draw_image("Im0", 100, 600, 64, 64)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert r.n_images == 1
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m
    png = decode_engine_png(base64.b64decode(m.group(1)))
    assert abs(int(png[..., 2].mean()) - 200) < 8


def test_ccitt_g3_roundtrip_and_pdf():
    from pdf2dom_ray.engine.ccitt import decode_g3, encode_g3
    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder
    rng = np.random.default_rng(1)
    for k in (0, 1):
        for img in [np.zeros((5, 40), np.uint8),
                    (rng.random((12, 80)) > 0.8).astype(np.uint8)]:
            dec = decode_g3(encode_g3(img, k=k), img.shape[1],
                            img.shape[0], k=k)
            assert (dec == img).all()
    bm = np.zeros((10, 16), np.uint8)
    bm[2:8, 4:12] = 1
    for k in (0, 2):
        b = PdfBuilder(title=f"g3k{k}")
        p = PageSpec()
        p.use_ccitt_image("Im0", bm, k=k)
        p.draw_image("Im0", 100, 600, 64, 40)
        b.add_page(p)
        r = parse_document(b.build())
        assert r.error is None
        assert r.n_images == 1
        assert 'src="data:image/png;base64,' in r.html_dom


@pytest.mark.parametrize("transform", [0, 2])
def test_cmyk_jpeg_decode(transform):
    """4-component Adobe CMYK/YCCK: stored inverted-CMYK samples map to
    RGB = CMY·K/255 (identity at stored K=255)."""
    from pdf2dom_ray.engine.jpeg import (decode_baseline_jpeg,
                                         encode_cmyk_jpeg)
    stored = np.zeros((24, 32, 4), np.uint8)
    stored[..., 0] = 180
    stored[..., 1] = 60
    stored[..., 2] = 220
    stored[..., 3] = 255
    dec = decode_baseline_jpeg(encode_cmyk_jpeg(stored, 92,
                                                transform=transform))
    assert dec.shape == (24, 32, 3)
    means = dec.reshape(-1, 3).mean(axis=0)
    assert np.allclose(means, [180, 60, 220], atol=3)
    half = stored.copy()
    half[..., 3] = 128
    dec2 = decode_baseline_jpeg(encode_cmyk_jpeg(half, 92,
                                                 transform=transform))
    assert np.allclose(dec2.reshape(-1, 3).mean(axis=0),
                       np.array([180, 60, 220]) * 128 / 255, atol=3)


@pytest.mark.parametrize("inverted", [False, True])
def test_image_mask_stencil(inverted):
    """/ImageMask true paints the current non-stroking color where the
    mask paints, transparent elsewhere (PDFBox stencil getImage path)."""
    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    bm = np.zeros((8, 12), np.uint8)
    bm[2:6, 3:9] = 1                   # painted region
    b = PdfBuilder(title="stencil")
    p = PageSpec()
    p.use_mask_image("Im0", bm, decode_inverted=inverted)
    p.raw(b"1 0 0 rg")                 # red non-stroking color
    p.draw_image("Im0", 100, 600, 48, 32)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert r.n_images == 1
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m
    png = decode_engine_png(base64.b64decode(m.group(1)))
    assert png.shape == (8, 12, 4)
    assert png[4, 6, 0] == 255 and png[4, 6, 3] == 255   # red, opaque
    assert png[0, 0, 3] == 0                             # transparent
