"""Image XObject decoding and rotation.

Replaces ``PDImageXObject.getImage()`` + ``ImageUtils.rotateImage``
(`/root/reference/src/main/java/org/fit/pdfdom/PDFBoxTree.java:544-590`,
`ImageUtils.java:11-54`). Supported pixel formats: 8-bit /DeviceRGB and
/DeviceGray rasters behind Flate/ASCIIHex (the dominant lossless
web-PDF case); 1-bit gray is expanded; DCTDecode (baseline JPEG — the
single most common image filter in real PDFs) is decoded by the
pure-numpy decoder in ``engine/jpeg.py``; CCITT G3/G4 by
``engine/ccitt.py``; JBIG2 generic regions (MMR and arithmetic,
templates 0-3 + TPGDON via the ``engine/mq.py`` MQ coder) by
``engine/jbig2.py``. JBIG2 symbol/halftone regions raise
``UnsupportedImageError`` → the walker emits the ``<img>`` element
with empty ``src``.

Rotation: the reference rotates the decoded raster by the CTM shear
angle minus the page rotation with a bilinear AffineTransformOp
(``ImageUtils.java:11-54``); this engine matches — exact ``np.rot90``
for multiples of 90°, expanded-bounds bilinear inverse mapping
(``_rotate_bilinear``) for arbitrary angles.
"""

from __future__ import annotations

import math

import numpy as np

from .cos import PdfParseError, Stream

__all__ = ["UnsupportedImageError", "decode_image", "rotate_image_90s"]


class UnsupportedImageError(Exception):
    pass


def _resolve_cs(doc, cs):
    """ColorSpace entry → ("rgb"|"gray"|"cmyk", None) or
    ("indexed", (base_kind, palette_bytes)). CalRGB/CalGray map to the
    device spaces; ICCBased maps by /N (PDFBox alternate-space path)."""
    cs = doc.resolve(cs)
    if cs is None:
        return ("gray", None)
    if isinstance(cs, str):
        if cs in ("DeviceRGB", "CalRGB"):
            return ("rgb", None)
        if cs in ("DeviceGray", "CalGray"):
            return ("gray", None)
        if cs == "DeviceCMYK":
            return ("cmyk", None)
        raise UnsupportedImageError(f"unsupported colorspace {cs}")
    if isinstance(cs, list) and cs:
        head = str(doc.resolve(cs[0]))
        if head == "ICCBased" and len(cs) >= 2:
            stm = doc.resolve(cs[1])
            n = 3
            if isinstance(stm, Stream):
                n = int(doc.resolve(stm.dict.get("N", 3)) or 3)
            kind = {1: "gray", 3: "rgb", 4: "cmyk"}.get(n)
            if kind is None:
                raise UnsupportedImageError(f"ICCBased N={n}")
            return (kind, None)
        if head == "Indexed" and len(cs) >= 4:
            base_kind, _ = _resolve_cs(doc, cs[1])
            if base_kind == "indexed":
                raise UnsupportedImageError("nested Indexed colorspace")
            lookup = doc.resolve(cs[3])
            if isinstance(lookup, Stream):
                lookup = lookup.data()
            if not isinstance(lookup, bytes):
                raise UnsupportedImageError("bad Indexed lookup")
            return ("indexed", (base_kind, lookup))
        if head == "CalRGB":
            return ("rgb", None)
        if head == "CalGray":
            return ("gray", None)
        if head in ("Lab", "Separation", "DeviceN"):
            # honest degradation: decoding these as another space would
            # render wrong colors silently
            raise UnsupportedImageError(f"unsupported colorspace {head}")
    raise UnsupportedImageError(f"unsupported colorspace {cs!r}")


_NCOMP = {"rgb": 3, "gray": 1, "cmyk": 4, "indexed": 1}


def _unpack_samples(data: bytes, w: int, h: int, ncomp: int,
                    bpc: int) -> np.ndarray:
    """Raster bytes → (h, w, ncomp) int sample array (rows padded to
    byte boundaries for bpc < 8)."""
    if bpc == 8:
        need = w * h * ncomp
        if len(data) < need:
            raise UnsupportedImageError("truncated image data")
        return np.frombuffer(data[:need], dtype=np.uint8)             .reshape(h, w, ncomp).astype(np.int32)
    if bpc in (1, 2, 4):
        row_bits = w * ncomp * bpc
        row_bytes = (row_bits + 7) // 8
        need = row_bytes * h
        if len(data) < need:
            raise UnsupportedImageError("truncated image data")
        bits = np.unpackbits(
            np.frombuffer(data[:need], dtype=np.uint8).reshape(h, row_bytes),
            axis=1)[:, :w * ncomp * bpc]
        grouped = bits.reshape(h, w * ncomp, bpc)
        weights = (1 << np.arange(bpc - 1, -1, -1)).astype(np.int32)
        vals = (grouped * weights).sum(axis=2)
        return vals.reshape(h, w, ncomp)
    raise UnsupportedImageError(f"unsupported BitsPerComponent {bpc}")


def _cmyk_to_rgb(c, m, y, k):
    """Engine-wide CMYK convention (walker._components_to_rgb parity)."""
    r = 1.0 - np.minimum(1.0, c + k)
    g = 1.0 - np.minimum(1.0, m + k)
    b = 1.0 - np.minimum(1.0, y + k)
    return np.stack([r, g, b], axis=-1)


def decode_image(doc, xobj: Stream,
                 fill_rgb: tuple[float, float, float] | None = None
                 ) -> np.ndarray:
    """Decode an Image XObject into an (H, W, 3) uint8 RGB array (or
    (H, W, 4) RGBA when an /SMask soft mask or /ImageMask stencil
    contributes alpha)."""
    img = _decode_image_base(doc, xobj, fill_rgb)
    if img.shape[2] == 4:          # stencil already carries alpha
        return img
    smask = doc.resolve(xobj.dict.get("SMask"))
    if isinstance(smask, Stream):
        try:
            alpha_img = _decode_image_base(doc, smask, None)
        except UnsupportedImageError:
            return img
        alpha = alpha_img[..., 0]
        h, w = img.shape[:2]
        if alpha.shape != (h, w):   # nearest-neighbour resize
            yi = (np.arange(h) * alpha.shape[0] // h).clip(
                0, alpha.shape[0] - 1)
            xi = (np.arange(w) * alpha.shape[1] // w).clip(
                0, alpha.shape[1] - 1)
            alpha = alpha[yi][:, xi]
        return np.concatenate([img, alpha[..., np.newaxis]], axis=2)
    return img


def _decode_image_base(doc, xobj: Stream,
                       fill_rgb: tuple[float, float, float] | None = None
                       ) -> np.ndarray:
    """Single-image decode (no soft mask): (H, W, 3) RGB, or (H, W, 4)
    RGBA for ``/ImageMask true`` stencils painted with ``fill_rgb``
    (the current non-stroking color, like PDFBox's stencil
    ``getImage`` path), transparent elsewhere."""
    d = xobj.dict
    if doc.resolve(d.get("ImageMask")) is True:
        w = int(doc.resolve(d.get("Width", 0)) or 0)
        h = int(doc.resolve(d.get("Height", 0)) or 0)
        if w <= 0 or h <= 0 or w * h > 64_000_000:
            raise UnsupportedImageError(f"bad mask dims {w}x{h}")
        try:
            data = xobj.data()
        except PdfParseError as e:
            raise UnsupportedImageError(str(e)) from e
        row_bytes = (w + 7) // 8
        if len(data) < row_bytes * h:
            raise UnsupportedImageError("truncated image mask data")
        bits = np.unpackbits(
            np.frombuffer(data[:row_bytes * h], dtype=np.uint8)
            .reshape(h, row_bytes), axis=1)[:, :w]
        dec = doc.resolve(d.get("Decode"))
        # default Decode [0 1]: sample 0 paints; [1 0] inverts
        paints = (bits == 1) if (isinstance(dec, list) and len(dec) == 2
                                 and float(dec[0]) == 1.0) else (bits == 0)
        r, g, b = fill_rgb if fill_rgb is not None else (0.0, 0.0, 0.0)
        out = np.zeros((h, w, 4), dtype=np.uint8)
        out[paints, 0] = int(r * 255) & 0xFF
        out[paints, 1] = int(g * 255) & 0xFF
        out[paints, 2] = int(b * 255) & 0xFF
        out[paints, 3] = 255
        return out
    filt = doc.resolve(d.get("Filter"))
    filters = filt if isinstance(filt, list) else ([filt] if filt else [])
    w = int(doc.resolve(d.get("Width", 0)) or 0)
    h = int(doc.resolve(d.get("Height", 0)) or 0)
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise UnsupportedImageError(f"bad image dims {w}x{h}")
    bpc = int(doc.resolve(d.get("BitsPerComponent", 8)) or 8)
    cs = doc.resolve(d.get("ColorSpace"))
    cs_name = str(cs) if cs is not None else "DeviceGray"
    try:
        data = xobj.data()
    except PdfParseError as e:
        raise UnsupportedImageError(str(e)) from e

    if "JPXDecode" in filters:
        # JPEG2000 via the engine codec (engine/jpx.py); for JPX the
        # PDF /ColorSpace is advisory — the codestream defines it
        from .jpx import JpxError, decode_jpx
        try:
            img, depth = decode_jpx(data, return_depth=True)
        except JpxError as e:
            raise UnsupportedImageError(f"JPX decode failed: {e}") from e
        if depth > 8:                  # render deep samples at 8 bits
            img = (img >> (depth - 8)).astype(np.uint8)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        if img.shape[0] != h or img.shape[1] != w:
            raise UnsupportedImageError(
                f"JPX dims {img.shape[1]}x{img.shape[0]} != /Width/Height "
                f"{w}x{h}")
        return img

    if "CCITTFaxDecode" in filters:
        # Group 4 (K<0) and Group 3 (K=0 pure 1D / K>0 mixed) via the
        # engine codec
        from .ccitt import CcittError, decode_g3, decode_g4
        parms = doc.resolve(d.get("DecodeParms")) or {}
        if isinstance(parms, list):
            parms = next((doc.resolve(x) for x in parms
                          if isinstance(doc.resolve(x), dict)), {})
        k = int(doc.resolve(parms.get("K", 0)) or 0)
        cols = int(doc.resolve(parms.get("Columns", 1728)) or 1728)
        black_is_1 = bool(doc.resolve(parms.get("BlackIs1", False)))
        byte_align = bool(doc.resolve(parms.get("EncodedByteAlign", False)))
        try:
            if k < 0:
                bitmap = decode_g4(data, cols, h)   # 1 = black
            else:
                bitmap = decode_g3(data, cols, h, k=k,
                                   byte_align=byte_align)
        except CcittError as e:
            raise UnsupportedImageError(f"CCITT decode failed: {e}") from e
        if bitmap.shape[1] < w:
            raise UnsupportedImageError(
                f"CCITT columns {bitmap.shape[1]} < /Width {w}")
        bitmap = bitmap[:h, :w]
        # decode_g4 gives semantic black=1; the filter's SAMPLE for a
        # black pixel is 1 iff /BlackIs1, and the image /Decode array
        # (default [0 1] for 1-bpc gray) maps samples to gray
        sample = bitmap if black_is_1 else (1 - bitmap)
        dec = doc.resolve(d.get("Decode"))
        d0, d1 = (float(dec[0]), float(dec[1])) if \
            isinstance(dec, list) and len(dec) == 2 else (0.0, 1.0)
        g = np.round((d0 + sample * (d1 - d0)) * 255).astype(np.uint8)
        return np.stack([g] * 3, axis=-1)

    if "JBIG2Decode" in filters:
        # MMR + arithmetic generic regions via engine/jbig2.py;
        # symbol/halftone streams degrade honestly
        from .jbig2 import Jbig2Error, decode_jbig2
        parms = doc.resolve(d.get("DecodeParms")) or {}
        if isinstance(parms, list):
            parms = next((doc.resolve(x) for x in parms
                          if isinstance(doc.resolve(x), dict)), {})
        gstream = doc.resolve(parms.get("JBIG2Globals"))
        try:
            gdata = gstream.data() if gstream is not None else b""
        except PdfParseError as e:
            raise UnsupportedImageError(str(e)) from e
        try:
            bitmap = decode_jbig2(data, globals_data=gdata,
                                  width=w, height=h)
        except Jbig2Error as e:
            raise UnsupportedImageError(f"JBIG2 decode failed: {e}") from e
        bitmap = bitmap[:h, :w]
        # JBIG2 bit 1 = black (T.88); sample semantics invert like
        # CCITT without /BlackIs1, then the /Decode array maps to gray
        sample = 1 - bitmap
        dec = doc.resolve(d.get("Decode"))
        d0, d1 = (float(dec[0]), float(dec[1])) if \
            isinstance(dec, list) and len(dec) == 2 else (0.0, 1.0)
        g = np.round((d0 + sample * (d1 - d0)) * 255).astype(np.uint8)
        return np.stack([g] * 3, axis=-1)

    if "DCTDecode" in filters:
        # baseline JPEG via the pure-numpy decoder (engine/jpeg.py);
        # mirrors PDImageXObject.getImage() handing DCT payloads to the
        # platform JPEG reader (PDFBoxTree.java:544-590)
        from .jpeg import JpegError, decode_baseline_jpeg
        try:
            img = decode_baseline_jpeg(data)
        except JpegError as e:
            raise UnsupportedImageError(f"DCT decode failed: {e}") from e
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        if img.shape[0] != h or img.shape[1] != w:
            raise UnsupportedImageError(
                f"DCT dims {img.shape[1]}x{img.shape[0]} != /Width/Height "
                f"{w}x{h}")
        return img

    kind, extra = _resolve_cs(doc, cs)
    samples = _unpack_samples(data, w, h, _NCOMP[kind], bpc)
    maxval = float((1 << bpc) - 1)
    if kind == "rgb":
        return np.round(samples * (255.0 / maxval)).astype(np.uint8)
    if kind == "gray":
        g = np.round(samples[..., 0] * (255.0 / maxval)).astype(np.uint8)
        return np.stack([g] * 3, axis=-1)
    if kind == "cmyk":
        f = samples.astype(np.float64) / maxval
        rgb = _cmyk_to_rgb(f[..., 0], f[..., 1], f[..., 2], f[..., 3])
        return np.round(rgb * 255.0).astype(np.uint8)
    # indexed: samples are palette indices into the base-space lookup
    base_kind, lookup = extra
    stride = _NCOMP[base_kind]
    pal = np.frombuffer(lookup, dtype=np.uint8)
    n_entries = len(pal) // stride
    if n_entries == 0:
        raise UnsupportedImageError("empty Indexed palette")
    idx = np.minimum(samples[..., 0], n_entries - 1)
    pal = pal[:n_entries * stride].reshape(n_entries, stride)
    looked = pal[idx]                       # (h, w, stride)
    if base_kind == "rgb":
        return looked.astype(np.uint8)
    if base_kind == "gray":
        return np.repeat(looked, 3, axis=2).astype(np.uint8)
    f = looked.astype(np.float64) / 255.0
    rgb = _cmyk_to_rgb(f[..., 0], f[..., 1], f[..., 2], f[..., 3])
    return np.round(rgb * 255.0).astype(np.uint8)


def rotate_image_90s(img: np.ndarray, theta_radians: float) -> np.ndarray:
    """Rotate the raster by ``theta`` (ImageUtils.rotateImage semantics:
    Java ``getRotateInstance(-theta)`` around the center with a bilinear
    AffineTransformOp and an expanded destination raster).

    Exact ``np.rot90`` for multiples of 90°; bilinear inverse-mapped
    resampling (numpy) for arbitrary angles.
    """
    deg = math.degrees(theta_radians)
    quarter = round(deg / 90.0) % 4
    if abs(deg - round(deg / 90.0) * 90.0) <= 1.0:
        if quarter == 0:
            return img
        # np.rot90 rotates counter-clockwise in array coords (y down),
        # which appears clockwise on screen; matches Java's -theta.
        return np.rot90(img, k=quarter)
    return _rotate_bilinear(img, -theta_radians)


def _rotate_bilinear(img: np.ndarray, theta: float) -> np.ndarray:
    """Center rotation with expanded bounds and bilinear sampling."""
    h, w = img.shape[:2]
    c, s = math.cos(theta), math.sin(theta)
    # expanded destination bounds (like AffineTransformOp.getBounds2D)
    nw = int(math.ceil(abs(w * c) + abs(h * s)))
    nh = int(math.ceil(abs(w * s) + abs(h * c)))
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ncy, ncx = (nh - 1) / 2.0, (nw - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(nh, dtype=np.float64),
                         np.arange(nw, dtype=np.float64), indexing="ij")
    # inverse map: rotate destination coords by -theta around the center
    xs = (xx - ncx) * c + (yy - ncy) * s + cx
    ys = -(xx - ncx) * s + (yy - ncy) * c + cy
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    fx = xs - x0
    fy = ys - y0
    valid = (x0 >= 0) & (x0 < w - 1) & (y0 >= 0) & (y0 < h - 1)
    x0c = np.clip(x0, 0, w - 2)
    y0c = np.clip(y0, 0, h - 2)
    p00 = img[y0c, x0c].astype(np.float64)
    p01 = img[y0c, x0c + 1].astype(np.float64)
    p10 = img[y0c + 1, x0c].astype(np.float64)
    p11 = img[y0c + 1, x0c + 1].astype(np.float64)
    fxe = fx[..., None]
    fye = fy[..., None]
    out = (p00 * (1 - fxe) * (1 - fye) + p01 * fxe * (1 - fye)
           + p10 * (1 - fxe) * fye + p11 * fxe * fye)
    out = np.where(valid[..., None], out, 0.0)
    return out.round().astype(np.uint8)
