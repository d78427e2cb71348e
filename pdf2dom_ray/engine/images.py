"""Image XObject decoding and rotation.

Replaces ``PDImageXObject.getImage()`` + ``ImageUtils.rotateImage``
(`/root/reference/src/main/java/org/fit/pdfdom/PDFBoxTree.java:544-590`,
`ImageUtils.java:11-54`). Supported pixel formats: 8-bit /DeviceRGB and
/DeviceGray rasters behind Flate/ASCIIHex (the dominant lossless
web-PDF case); 1-bit gray is expanded; DCTDecode (baseline JPEG — the
single most common image filter in real PDFs) is decoded by the
pure-numpy decoder in ``engine/jpeg.py``. JPX/JBIG2/CCITT remain
unsupported in this container and raise ``UnsupportedImageError`` →
the walker emits the ``<img>`` element with empty ``src``.

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


def decode_image(doc, xobj: Stream,
                 fill_rgb: tuple[float, float, float] | None = None
                 ) -> np.ndarray:
    """Decode an Image XObject into an (H, W, 3) uint8 RGB array —
    or, for ``/ImageMask true`` stencil masks, an (H, W, 4) RGBA array
    painted with ``fill_rgb`` (the current non-stroking color, like
    PDFBox's stencil ``getImage``/``getOpaqueImage`` path) where the
    mask paints, transparent elsewhere."""
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
    if any(f in ("JPXDecode", "JBIG2Decode") for f in filters):
        raise UnsupportedImageError(f"codec not available: {filters}")
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

    if cs_name == "DeviceRGB" and bpc == 8:
        need = w * h * 3
        if len(data) < need:
            raise UnsupportedImageError("truncated RGB image data")
        return np.frombuffer(data[:need], dtype=np.uint8).reshape(h, w, 3).copy()
    if cs_name == "DeviceGray" and bpc == 8:
        need = w * h
        if len(data) < need:
            raise UnsupportedImageError("truncated gray image data")
        g = np.frombuffer(data[:need], dtype=np.uint8).reshape(h, w)
        return np.stack([g] * 3, axis=-1)
    if cs_name == "DeviceGray" and bpc == 1:
        row_bytes = (w + 7) // 8
        need = row_bytes * h
        if len(data) < need:
            raise UnsupportedImageError("truncated 1-bit image data")
        bits = np.unpackbits(
            np.frombuffer(data[:need], dtype=np.uint8).reshape(h, row_bytes),
            axis=1)[:, :w]
        g = (bits * 255).astype(np.uint8)
        return np.stack([g] * 3, axis=-1)
    raise UnsupportedImageError(f"unsupported colorspace/bpc {cs_name}/{bpc}")


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
