"""JPX / JPEG2000 (engine/jpx.py): lossless round-trip across shapes,
decomposition levels and code-block sizes, JP2 container unwrap,
profile-violation errors, and the JPXDecode PDF path end-to-end.

The locked property (module docstring, matching the engine's other
codecs) is decode(encode(img)) == img exactly — the profile is
reversible 5/3 + RCT, so lossless equality is the spec.
"""

import struct

import numpy as np
import pytest

from pdf2dom_ray.engine.jpx import JpxError, decode_jpx, encode_jpx


def _grad(h, w, ch=None):
    y, x = np.mgrid[0:h, 0:w]
    g = ((x * 7 + y * 13) % 256).astype(np.uint8)
    if ch is None:
        return g
    return np.stack([(g + 37 * i) % 256 for i in range(ch)],
                    axis=-1).astype(np.uint8)


@pytest.mark.parametrize("shape", [(1, 1), (5, 3), (32, 32), (33, 17),
                                   (64, 48), (2, 100)])
@pytest.mark.parametrize("ch", [None, 3])
def test_roundtrip_shapes(shape, ch):
    img = _grad(*shape, ch=ch)
    out = decode_jpx(encode_jpx(img))
    assert out.dtype == np.uint8
    assert np.array_equal(out, img)


@pytest.mark.parametrize("levels", [0, 1, 2, 3, 5])
def test_roundtrip_levels(levels):
    img = _grad(40, 29, ch=3)
    assert np.array_equal(decode_jpx(encode_jpx(img, levels=levels)), img)


@pytest.mark.parametrize("cb_exp", [2, 3, 5, 6])
def test_roundtrip_codeblock_sizes(cb_exp):
    # multiple code-blocks per band when cb < band dims
    img = _grad(37, 41)
    assert np.array_equal(decode_jpx(encode_jpx(img, cb_exp=cb_exp)), img)


def test_roundtrip_random_and_extremes():
    rng = np.random.default_rng(5)
    for img in (np.zeros((9, 9), np.uint8),
                np.full((9, 9), 255, np.uint8),
                rng.integers(0, 256, (30, 30), dtype=np.uint8),
                rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)):
        assert np.array_equal(decode_jpx(encode_jpx(img)), img)


def test_encoder_deterministic():
    img = _grad(20, 31, ch=3)
    assert encode_jpx(img) == encode_jpx(img)


def test_levels_exceeding_dims():
    # levels > log2(dim): LL collapses to 1x1 and higher bands go empty
    img = _grad(3, 2)
    assert np.array_equal(decode_jpx(encode_jpx(img, levels=4)), img)


def test_jp2_container_unwrap():
    img = _grad(12, 12)
    cs = encode_jpx(img)
    sig = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
    ftyp = struct.pack(">I", 20) + b"ftypjp2 " + struct.pack(">I", 0) \
        + b"jp2 "
    jp2c = struct.pack(">I", 8 + len(cs)) + b"jp2c" + cs
    assert np.array_equal(decode_jpx(sig + ftyp + jp2c), img)


def test_jp2_without_codestream_box_raises():
    sig = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
    ftyp = struct.pack(">I", 20) + b"ftypjp2 " + struct.pack(">I", 0) \
        + b"jp2 "
    with pytest.raises(JpxError, match="jp2c"):
        decode_jpx(sig + ftyp)


def test_not_a_codestream_raises():
    with pytest.raises(JpxError, match="SOC"):
        decode_jpx(b"\x89PNG\r\n\x1a\nnot jpeg2000 at all")


def _patch_cod(cs: bytes, offset: int, value: int) -> bytes:
    """Flip one byte inside the COD payload (offset from Scod)."""
    i = cs.index(b"\xff\x52") + 4
    out = bytearray(cs)
    out[i + offset] = value
    return bytes(out)


def test_97_without_quantization_rejected():
    # transform byte flipped to 9/7 but QCD still style 0 (reversible):
    # inconsistent codestream
    cs = encode_jpx(_grad(8, 8))
    with pytest.raises(JpxError, match="9/7"):
        decode_jpx(_patch_cod(cs, 9, 0))          # transform byte


@pytest.mark.parametrize("layers", [2, 3, 7])
def test_multi_layer_roundtrip(layers):
    img = _grad(37, 29, ch=3)
    assert np.array_equal(decode_jpx(encode_jpx(img, layers=layers)), img)


@pytest.mark.parametrize("prog", [0, 1, 2, 3, 4])
def test_progression_orders_roundtrip(prog):
    # multi-layer so the five orders actually interleave differently
    img = _grad(41, 23)
    cs = encode_jpx(img, layers=3, prog=prog)
    assert np.array_equal(decode_jpx(cs), img)


def test_progression_orders_reorder_packets():
    img = _grad(40, 40)
    streams = {encode_jpx(img, layers=3, prog=p) for p in range(5)}
    assert len(streams) >= 3                      # PCRL == CPRL here


def test_sop_eph_markers_roundtrip():
    img = _grad(33, 50, ch=3)
    cs = encode_jpx(img, layers=2, sop=True, eph=True)
    assert b"\xff\x91" in cs and b"\xff\x92" in cs
    assert np.array_equal(decode_jpx(cs), img)


@pytest.mark.parametrize("tile", [(32, 32), (32, 16), (64, 32)])
def test_tiled_roundtrip(tile):
    img = _grad(72, 96, ch=3)
    cs = encode_jpx(img, levels=2, tile_size=tile)
    assert np.array_equal(decode_jpx(cs), img)


def test_tiled_ragged_edge_roundtrip():
    # image not a multiple of the tile size: partial edge tiles
    img = _grad(52, 80)
    cs = encode_jpx(img, levels=2, tile_size=(32, 16))
    assert np.array_equal(decode_jpx(cs), img)


def test_tile_parts_roundtrip():
    img = _grad(48, 64)
    cs = encode_jpx(img, tile_size=(32, 32), tile_parts=3, layers=2)
    assert cs.count(b"\xff\x90") > cs.count(b"\xff\x51") * 4  # many SOTs
    assert np.array_equal(decode_jpx(cs), img)


def test_everything_at_once_roundtrip():
    img = _grad(72, 96, ch=3)
    cs = encode_jpx(img, levels=3, tile_size=(32, 24), tile_parts=3,
                    layers=4, prog=3, sop=True, eph=True)
    assert np.array_equal(decode_jpx(cs), img)


def test_irreversible_layered_matches_single_layer():
    # layering splits bytes but the decoder concatenates segments:
    # identical reconstruction
    img = _grad(48, 64)
    a = decode_jpx(encode_jpx(img, irreversible=True))
    b = decode_jpx(encode_jpx(img, irreversible=True, layers=3,
                              prog=1, sop=True))
    assert np.array_equal(a, b)


def test_misaligned_tile_grid_roundtrip():
    # tile size NOT a multiple of 2^levels: per-tile DWT parity differs
    # from the reference grid; B.5 absolute-grid coding handles it
    img = _grad(52, 80)
    cs = encode_jpx(img, levels=2, tile_size=(30, 16))
    assert np.array_equal(decode_jpx(cs), img)


def test_unknown_progression_rejected():
    cs = encode_jpx(_grad(8, 8))
    with pytest.raises(JpxError, match="progression"):
        decode_jpx(_patch_cod(cs, 1, 6))          # order 6 undefined


def test_precinct_flag_without_size_list_rejected():
    cs = encode_jpx(_grad(8, 8))
    with pytest.raises(JpxError, match="truncated precinct"):
        decode_jpx(_patch_cod(cs, 0, 0x01))   # Scod bit set, no bytes


@pytest.mark.parametrize("ppx", [5, 6, 8])
def test_precincts_roundtrip(ppx):
    img = _grad(61, 83)
    cs = encode_jpx(img, precincts=(ppx, ppx))
    assert b"\xff\x52" in cs
    assert np.array_equal(decode_jpx(cs), img)


def test_precincts_per_resolution_and_clamped_codeblocks():
    # precinct 2^4 < code-block 2^5: effective block size clamps (B.7)
    img = _grad(61, 83)
    cs = encode_jpx(img, levels=2, cb_exp=5,
                    precincts=[(4, 5), (5, 4), (6, 6)])
    assert np.array_equal(decode_jpx(cs), img)


@pytest.mark.parametrize("prog", [0, 1, 2, 3, 4])
def test_precincts_all_progressions(prog):
    img = _grad(72, 96, ch=3)
    cs = encode_jpx(img, layers=3, prog=prog, precincts=(6, 6))
    assert np.array_equal(decode_jpx(cs), img)


def test_precincts_with_tiles_layers_markers():
    img = _grad(72, 96, ch=3)
    cs = encode_jpx(img, levels=2, tile_size=(32, 32), tile_parts=2,
                    layers=2, prog=2, sop=True, eph=True,
                    precincts=(5, 5))
    assert np.array_equal(decode_jpx(cs), img)


def test_precincts_change_packet_structure():
    img = _grad(64, 64)
    plain = encode_jpx(img)
    prec = encode_jpx(img, precincts=(5, 5))
    assert plain != prec                       # more packets, Scod bit
    assert np.array_equal(decode_jpx(plain), decode_jpx(prec))


def test_precincts_irreversible_match():
    img = _grad(48, 64)
    a = decode_jpx(encode_jpx(img, irreversible=True))
    b = decode_jpx(encode_jpx(img, irreversible=True, precincts=(6, 6),
                              layers=2))
    assert np.array_equal(a, b)


def test_bad_precinct_exponents_rejected():
    with pytest.raises(JpxError, match="precinct"):
        encode_jpx(_grad(16, 16), levels=2,
                   precincts=[(0, 0), (0, 0), (0, 0)])
    with pytest.raises(JpxError, match="precinct pairs"):
        encode_jpx(_grad(16, 16), levels=2, precincts=[(5, 5)])


def test_undefined_codeblock_style_bit_rejected():
    cs = encode_jpx(_grad(8, 8))
    with pytest.raises(JpxError, match="code-block style"):
        decode_jpx(_patch_cod(cs, 8, 0x40))       # reserved bit


def test_quantized_qcd_with_reversible_transform_rejected():
    cs = encode_jpx(_grad(8, 8))
    i = cs.index(b"\xff\x5c") + 4
    out = bytearray(cs)
    out[i] |= 0x02                                # Sqcd: scalar expounded
    with pytest.raises(JpxError, match="reversible"):
        decode_jpx(bytes(out))


@pytest.mark.parametrize("cut", [3, 20, 60])
def test_truncated_raises(cut):
    cs = encode_jpx(_grad(16, 16))
    with pytest.raises((JpxError, struct.error, IndexError)):
        decode_jpx(cs[:cut])


def test_pdf_with_jpx_gray_image_parses():
    import base64
    import re

    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    img = _grad(16, 16)
    b = PdfBuilder(title="jpx-gray")
    p = PageSpec()
    p.use_custom_image(
        "Im0",
        "/Width 16 /Height 16 /ColorSpace /DeviceGray "
        "/BitsPerComponent 8 /Filter /JPXDecode",
        encode_jpx(img), compress=False)
    p.draw_image("Im0", 100, 600, 64, 64)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert r.n_images == 1
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m, "JPX image must produce a non-empty PNG data URI"
    png = decode_engine_png(base64.b64decode(m.group(1)))
    assert png.shape[:2] == (16, 16)
    exp = np.repeat(img[..., None], 3, axis=-1)
    assert np.array_equal(png[..., :3], exp)


def test_pdf_with_jpx_rgb_image_parses():
    import base64
    import re

    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    img = _grad(12, 9, ch=3)
    b = PdfBuilder(title="jpx-rgb")
    p = PageSpec()
    p.use_custom_image(
        "Im0",
        "/Width 9 /Height 12 /ColorSpace /DeviceRGB "
        "/BitsPerComponent 8 /Filter /JPXDecode",
        encode_jpx(img), compress=False)
    p.draw_image("Im0", 100, 600, 64, 64)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert r.n_images == 1
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m
    png = decode_engine_png(base64.b64decode(m.group(1)))
    assert np.array_equal(png[..., :3], img)


def test_pdf_with_unsupported_jpx_degrades_to_empty_src():
    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    cs = _patch_cod(encode_jpx(_grad(8, 8)), 9, 0)   # inconsistent stream
    b = PdfBuilder(title="jpx-97")
    p = PageSpec()
    p.use_custom_image(
        "Im0",
        "/Width 8 /Height 8 /ColorSpace /DeviceGray "
        "/BitsPerComponent 8 /Filter /JPXDecode",
        cs, compress=False)
    p.draw_image("Im0", 100, 600, 64, 64)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert r.n_images == 1
    assert 'src=""' in r.html_dom


def test_pdf_jpx_dims_mismatch_degrades():
    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    b = PdfBuilder(title="jpx-dims")
    p = PageSpec()
    p.use_custom_image(
        "Im0",
        "/Width 99 /Height 99 /ColorSpace /DeviceGray "
        "/BitsPerComponent 8 /Filter /JPXDecode",
        encode_jpx(_grad(8, 8)), compress=False)
    p.draw_image("Im0", 100, 600, 64, 64)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None
    assert 'src=""' in r.html_dom


# ------------------------------- 9/7 irreversible + quantization path

def test_irreversible_roundtrip_bounded_error():
    # fine quantization: reconstruction within a couple of levels
    for shape, ch in [((32, 32), None), ((33, 17), None), ((24, 31), 3)]:
        img = _grad(*shape, ch=ch)
        out = decode_jpx(encode_jpx(img, irreversible=True,
                                    delta=1.0 / 64.0))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int)).max()
        assert err <= 2, (shape, ch, err)


def test_irreversible_is_lossy_but_close_at_coarse_delta():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    cs_fine = encode_jpx(img, irreversible=True, delta=1.0 / 64.0)
    cs_coarse = encode_jpx(img, irreversible=True, delta=4.0)
    assert len(cs_coarse) < len(cs_fine)          # coarser = smaller
    out = decode_jpx(cs_coarse)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 32                        # still recognizable
    assert (err > 0).any()                        # genuinely lossy


def test_irreversible_encoder_deterministic():
    img = _grad(20, 31, ch=3)
    a = encode_jpx(img, irreversible=True)
    assert a == encode_jpx(img, irreversible=True)


def test_irreversible_levels_and_codeblocks():
    img = _grad(37, 29)
    for lv in (0, 1, 3):
        for cbe in (3, 5):
            out = decode_jpx(encode_jpx(img, levels=lv, cb_exp=cbe,
                                        irreversible=True,
                                        delta=1.0 / 64.0))
            assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_derived_quantization_style_decodes():
    # rewrite the expounded QCD (style 2) as derived (style 1): same
    # (eps0, mu) applied via eps_b = eps0 - NL + lvl_b
    import struct as _s

    img = _grad(16, 16)
    cs = bytearray(encode_jpx(img, levels=0, irreversible=True,
                              delta=1.0 / 64.0))
    i = cs.index(b"\xff\x5c")
    (ln,) = _s.unpack_from(">H", cs, i + 2)
    sqcd = cs[i + 4]
    entry = cs[i + 5:i + 7]
    # levels=0 -> single LL band: derived == expounded
    new_qcd = bytes([(sqcd & 0xE0) | 1]) + entry
    out = bytes(cs[:i + 2]) + _s.pack(">H", len(new_qcd) + 2) \
        + new_qcd + bytes(cs[i + 2 + ln:])
    dec = decode_jpx(out)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_reversible_bytes_do_not_depend_on_irreversible_flag_default():
    img = _grad(12, 12)
    assert encode_jpx(img) == encode_jpx(img, irreversible=False)


def test_pdf_with_irreversible_jpx_parses():
    import base64
    import re

    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    img = _grad(16, 16)
    b = PdfBuilder(title="jpx-97")
    p = PageSpec()
    p.use_custom_image(
        "Im0",
        "/Width 16 /Height 16 /ColorSpace /DeviceGray "
        "/BitsPerComponent 8 /Filter /JPXDecode",
        encode_jpx(img, irreversible=True, delta=1.0 / 64.0),
        compress=False)
    p.draw_image("Im0", 100, 600, 64, 64)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None and r.n_images == 1
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m, "9/7 JPX must now decode to a PNG"
    png = decode_engine_png(base64.b64decode(m.group(1)))
    err = np.abs(png[..., 0].astype(int) - img.astype(int)).max()
    assert err <= 2


# ----------------------------------------------------------- deep samples

@pytest.mark.parametrize("depth", [10, 12, 16])
def test_deep_gray_roundtrip(depth):
    rng = np.random.default_rng(depth)
    img = rng.integers(0, 1 << depth, (40, 56), dtype=np.uint16)
    out, d = decode_jpx(encode_jpx(img, depth=depth), return_depth=True)
    assert d == depth and out.dtype == np.uint16
    assert np.array_equal(out, img)


def test_deep_rgb_with_layers_and_precincts():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 4096, (40, 48, 3), dtype=np.uint16)
    cs = encode_jpx(img, depth=12, layers=2, precincts=(6, 6))
    assert np.array_equal(decode_jpx(cs), img)


def test_deep_irreversible_bounded():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 4096, (32, 32), dtype=np.uint16)
    out = decode_jpx(encode_jpx(img, depth=12, irreversible=True,
                                delta=1 / 512))
    assert out.dtype == np.uint16
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 24


def test_depth_range_validation():
    img = np.full((8, 8), 4000, np.uint16)
    with pytest.raises(JpxError, match="range"):
        encode_jpx(img, depth=10)          # 4000 >= 2^10
    with pytest.raises(JpxError, match="depth"):
        encode_jpx(img.astype(np.uint8), depth=20)


def test_pdf_with_deep_jpx_renders_scaled():
    import base64
    import re

    from pdf2dom_ray.engine.parse import parse_document
    from pdf2dom_ray.functions.multimodal import decode_engine_png
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

    rng = np.random.default_rng(7)
    img = rng.integers(0, 4096, (16, 16), dtype=np.uint16)
    b = PdfBuilder(title="jpx-12bit")
    p = PageSpec()
    p.use_custom_image(
        "Im0",
        "/Width 16 /Height 16 /ColorSpace /DeviceGray "
        "/BitsPerComponent 8 /Filter /JPXDecode",
        encode_jpx(img, depth=12), compress=False)
    p.draw_image("Im0", 100, 600, 64, 64)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None and r.n_images == 1
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m
    png = decode_engine_png(base64.b64decode(m.group(1)))
    exp8 = (img >> 4).astype(np.uint8)
    exp = np.repeat(exp8[..., None], 3, axis=-1)
    assert np.array_equal(png[..., :3], exp)


# ------------------------------------------------- component subsampling

def test_gray_subsampled_roundtrip():
    # 2x2 keeps the top-left sample of each cell; replication restores
    rng = np.random.default_rng(21)
    g = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    out = decode_jpx(encode_jpx(g, subsampling=[(2, 2)]))
    exp = np.repeat(np.repeat(g[::2, ::2], 2, 0), 2, 1)[:40, :56]
    assert np.array_equal(out, exp)


def _expected_420(img):
    from pdf2dom_ray.engine.jpx import _rct_forward, _rct_inverse
    h, w = img.shape[:2]
    r = img[..., 0].astype(np.int64) - 128
    g = img[..., 1].astype(np.int64) - 128
    b = img[..., 2].astype(np.int64) - 128
    yy, u, v = _rct_forward(r, g, b)

    def rep(p):
        return np.repeat(np.repeat(p[::2, ::2], 2, 0), 2, 1)[:h, :w]

    r2, g2, b2 = _rct_inverse(yy, rep(u), rep(v))
    return np.stack([np.clip(p + 128, 0, 255).astype(np.uint8)
                     for p in (r2, g2, b2)], -1)


def test_rgb_420_subsampling():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    sub = [(1, 1), (2, 2), (2, 2)]
    out = decode_jpx(encode_jpx(img, subsampling=sub))
    assert np.array_equal(out, _expected_420(img))


def test_rgb_420_with_tiles_precincts_layers():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    sub = [(1, 1), (2, 2), (2, 2)]
    cs = encode_jpx(img, levels=2, subsampling=sub, layers=2,
                    precincts=(5, 5), tile_size=(24, 16), tile_parts=2)
    assert np.array_equal(decode_jpx(cs), _expected_420(img))


def test_asymmetric_subsampling():
    rng = np.random.default_rng(17)
    g = rng.integers(0, 256, (30, 44), dtype=np.uint8)
    out = decode_jpx(encode_jpx(g, subsampling=[(4, 1)]))
    exp = np.repeat(g[:, ::4], 4, 1)[:, :44]
    assert np.array_equal(out, exp)


def test_subsampled_misaligned_tiles_roundtrip():
    # tile grid unaligned on the subsampled component grids: odd band
    # origins per component, parity-aware lifting
    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    cs = encode_jpx(img, levels=2, subsampling=[(1, 1), (2, 2), (2, 2)],
                    tile_size=(20, 16))
    assert np.array_equal(decode_jpx(cs), _expected_420(img))


def test_subsampling_validation():
    g = np.zeros((8, 8), np.uint8)
    with pytest.raises(JpxError, match="pairs"):
        encode_jpx(g, subsampling=[(1, 1), (2, 2)])
    with pytest.raises(JpxError, match="factors"):
        encode_jpx(g, subsampling=[(0, 1)])


# ----------------------------------------------------- code-block styles

@pytest.mark.parametrize("style", [0x02, 0x08, 0x20, 0x2A])
def test_codeblock_styles_roundtrip(style):
    # reset contexts / vertically causal / segmentation symbols
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (45, 61), dtype=np.uint8)
    assert np.array_equal(decode_jpx(encode_jpx(img, cb_style=style)),
                          img)


def test_codeblock_styles_with_everything():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    cs = encode_jpx(img, cb_style=0x28, layers=2, precincts=(5, 5),
                    tile_size=(24, 16), levels=2)
    assert np.array_equal(decode_jpx(cs), img)


def test_segsym_detects_corruption():
    # segmentation symbols exist to catch bitstream damage: flipping
    # codeword bytes must raise (or at least not decode silently to
    # the original)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    cs = bytearray(encode_jpx(img, cb_style=0x20))
    sod = cs.index(b"\xff\x93") + 2
    corrupted = 0
    for off in (20, 40, 60):
        bad = bytearray(cs)
        bad[sod + off] ^= 0x55
        try:
            out = decode_jpx(bytes(bad))
            if not np.array_equal(out, img):
                corrupted += 1
        except JpxError:
            corrupted += 1
    assert corrupted == 3


@pytest.mark.parametrize("style", [0x01, 0x04, 0x05, 0x07, 0x0D,
                                   0x25, 0x2F])
def test_bypass_and_termination_roundtrip(style):
    # selective arithmetic bypass (raw SPP/MRP from the 11th pass) and
    # per-pass termination produce multi-segment codewords
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (45, 61), dtype=np.uint8)
    assert np.array_equal(decode_jpx(encode_jpx(img, cb_style=style)),
                          img)


@pytest.mark.parametrize("style", [0x01, 0x04, 0x05])
@pytest.mark.parametrize("layers", [2, 5])
def test_terminated_codewords_across_layers(style, layers):
    # quality-layer splits snap to codeword-segment boundaries
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    cs = encode_jpx(img, cb_style=style, layers=layers)
    assert np.array_equal(decode_jpx(cs), img)


def test_bypass_with_tiles_precincts_progressions():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    cs = encode_jpx(img, cb_style=0x01, levels=2, tile_size=(32, 32),
                    layers=3, precincts=(5, 5), prog=2, sop=True,
                    eph=True)
    assert np.array_equal(decode_jpx(cs), img)


def test_bypass_identical_reconstruction_irreversible():
    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    a = decode_jpx(encode_jpx(img, irreversible=True, delta=1 / 128))
    b = decode_jpx(encode_jpx(img, irreversible=True, delta=1 / 128,
                              cb_style=0x01))
    assert np.array_equal(a, b)


@pytest.mark.parametrize("style", [0x10, 0x14, 0x15, 0x30])
def test_predictable_termination_roundtrip(style):
    # ERTERM: the deterministic FLUSH already satisfies predictable
    # termination, so encode→decode holds and the decoder's
    # unused-byte verification stays silent on clean streams
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    assert np.array_equal(decode_jpx(encode_jpx(img, cb_style=style)),
                          img)


def test_predictable_termination_decodes():
    # a stream merely claiming 0x10 (patched COD over a termall
    # encode, as real error-resilient encoders emit) must still decode
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    cs = encode_jpx(img, cb_style=0x04)
    i = cs.index(b"\xff\x52") + 4
    patched = cs[:i + 8] + bytes([cs[i + 8] | 0x10]) + cs[i + 9:]
    assert np.array_equal(decode_jpx(patched), img)


def test_pterm_flags_padded_segment():
    # the whole point of ERTERM: a codeword segment carrying bytes the
    # decoder never consumes is corrupt and must fail LOUDLY when the
    # pterm bit is set — and (bug-compat with permissive decoders)
    # pass silently when it is not
    from pdf2dom_ray.engine.jpx import _decode_cblk, _encode_cblk
    rng = np.random.default_rng(29)
    coefs = rng.integers(-100, 100, (16, 16), dtype=np.int64)
    mb = 8
    data, zbp, npasses, segs = _encode_cblk(coefs, "LL", mb, 0x14)
    chunks, off = [], 0
    for p, n in segs:
        chunks.append((p, data[off:off + n]))
        off += n
    ok = _decode_cblk(data, 16, 16, "LL", mb, zbp, npasses, 0x14,
                      chunks)
    assert np.array_equal(ok, coefs)
    bad = list(chunks)
    p0, b0 = bad[0]
    # > 2 spare bytes beyond the MQ decoder's ~2-byte read-ahead
    bad[0] = (p0, b0 + b"\x00" * 6)
    with pytest.raises(JpxError, match="predictable termination"):
        _decode_cblk(data, 16, 16, "LL", mb, zbp, npasses, 0x14, bad)
    out = _decode_cblk(data, 16, 16, "LL", mb, zbp, npasses, 0x04,
                       bad)
    assert np.array_equal(out, coefs)


# ------------------------------------ nonzero / odd canvas origins (B.5)

@pytest.mark.parametrize("origin", [(1, 0), (0, 1), (3, 5), (7, 7)])
def test_odd_origin_untiled_roundtrip(origin):
    # image anchored off (0,0): band origins become odd → parity-aware
    # lifting; single-tile case
    img = _grad(37, 53)
    cs = encode_jpx(img, levels=2, origin=origin)
    assert np.array_equal(decode_jpx(cs), img)


@pytest.mark.parametrize("origin,tile_origin,tile",
                         [((3, 5), (0, 0), (16, 16)),
                          ((5, 2), (5, 2), (20, 24)),
                          ((9, 1), (1, 1), (30, 16))])
def test_odd_origin_tiled_roundtrip(origin, tile_origin, tile):
    img = _grad(52, 80, ch=3)
    cs = encode_jpx(img, levels=2, origin=origin,
                    tile_origin=tile_origin, tile_size=tile)
    assert np.array_equal(decode_jpx(cs), img)


def test_odd_origin_irreversible_bounded_error():
    img = _grad(33, 47)
    out = decode_jpx(encode_jpx(img, irreversible=True, delta=1 / 64,
                                origin=(3, 1), tile_size=(20, 20)))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_odd_origin_subsampled_roundtrip():
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    cs = encode_jpx(img, levels=2, subsampling=[(1, 1), (2, 2), (2, 2)],
                    origin=(2, 4), tile_size=(20, 16))
    assert np.array_equal(decode_jpx(cs), _expected_420(img))


def test_odd_origin_zero_levels_roundtrip():
    img = _grad(19, 23)
    cs = encode_jpx(img, levels=0, origin=(1, 3), tile_size=(8, 8))
    assert np.array_equal(decode_jpx(cs), img)


def test_origin_styles_combined_roundtrip():
    # origin + precincts + layers + bypass + SOP/EPH + RPCL together
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (45, 61), dtype=np.uint8)
    cs = encode_jpx(img, levels=3, origin=(5, 3), tile_size=(24, 24),
                    precincts=(5, 5), layers=2, cb_style=0x01,
                    prog=2, sop=True, eph=True)
    assert np.array_equal(decode_jpx(cs), img)


# ---------------------------------------------- signed samples (Ssiz)

def test_signed_gray_roundtrip():
    rng = np.random.default_rng(37)
    g = rng.integers(-128, 128, (33, 47), dtype=np.int8)
    out = decode_jpx(encode_jpx(g))
    assert out.dtype == np.int8
    assert np.array_equal(out, g)


def test_signed_rgb_roundtrip():
    rng = np.random.default_rng(38)
    c = rng.integers(-128, 128, (24, 31, 3), dtype=np.int8)
    out = decode_jpx(encode_jpx(c, levels=3))
    assert out.dtype == np.int8
    assert np.array_equal(out, c)


def test_signed_deep_roundtrip():
    rng = np.random.default_rng(39)
    d = rng.integers(-2048, 2048, (20, 28), dtype=np.int16)
    out, dep = decode_jpx(encode_jpx(d, depth=12), return_depth=True)
    assert (out.dtype, dep) == (np.int16, 12)
    assert np.array_equal(out, d)


def test_signed_tiled_odd_origin_styles_roundtrip():
    rng = np.random.default_rng(41)
    e = rng.integers(-128, 128, (40, 52), dtype=np.int8)
    cs = encode_jpx(e, levels=2, origin=(3, 5), tile_size=(20, 24),
                    layers=2, cb_style=0x01, prog=2)
    assert np.array_equal(decode_jpx(cs), e)


def test_signed_range_validation():
    with pytest.raises(JpxError, match="signed 8-bit"):
        encode_jpx(np.array([[200]], np.int16), depth=8)


def test_mixed_signedness_rejected():
    # patch one component's Ssiz sign bit in a 3-component stream
    cs = encode_jpx(_grad(8, 8, ch=3))
    i = cs.index(b"\xff\x51") + 4 + 36        # first component Ssiz
    patched = cs[:i] + bytes([cs[i] | 0x80]) + cs[i + 1:]
    with pytest.raises(JpxError, match="signedness"):
        decode_jpx(patched)


def test_signed_flag_does_not_change_unsigned_bytes():
    img = _grad(20, 31, ch=3)
    cs = encode_jpx(img)
    i = cs.index(b"\xff\x51") + 4 + 36
    # all three Ssiz bytes carry depth-1 with the sign bit clear
    assert cs[i] == cs[i + 3] == cs[i + 6] == 7
