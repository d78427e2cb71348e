"""Image XObject decoding and rotation.

Replaces ``PDImageXObject.getImage()`` + ``ImageUtils.rotateImage``
(`/root/reference/src/main/java/org/fit/pdfdom/PDFBoxTree.java:544-590`,
`ImageUtils.java:11-54`). Supported pixel formats: 8-bit /DeviceRGB and
/DeviceGray rasters behind Flate/ASCIIHex (what the synthetic corpus
emits, and the dominant lossless web-PDF case); 1-bit gray is expanded.
DCT/JPX payloads cannot be decoded without an image codec in this
container — they raise ``UnsupportedImageError`` and the walker emits
the ``<img>`` element with empty ``src`` (schema-correct plumbing, data
stubbed; see SURVEY.md multimodal note).

Rotation: the reference rotates the decoded raster by the CTM shear
angle minus the page rotation with a bilinear AffineTransformOp. Web
PDFs overwhelmingly use axis-aligned CTMs, so the angle is a multiple
of 90°; this engine handles those exactly via ``np.rot90`` and leaves
other angles unrotated (logged divergence).
"""

from __future__ import annotations

import math

import numpy as np

from .cos import PdfParseError, Stream

__all__ = ["UnsupportedImageError", "decode_image", "rotate_image_90s"]


class UnsupportedImageError(Exception):
    pass


def decode_image(doc, xobj: Stream) -> np.ndarray:
    """Decode an Image XObject into an (H, W, 3) uint8 RGB array."""
    d = xobj.dict
    filt = doc.resolve(d.get("Filter"))
    filters = filt if isinstance(filt, list) else ([filt] if filt else [])
    if any(f in ("DCTDecode", "JPXDecode", "JBIG2Decode", "CCITTFaxDecode")
           for f in filters):
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
    """Rotate by the nearest multiple of 90° of ``theta`` (see module doc).

    Positive ``theta`` follows Java's ``getRotateInstance(-theta)`` in
    y-down raster space: theta=+90° turns the raster clockwise.
    """
    deg = math.degrees(theta_radians)
    quarter = round(deg / 90.0) % 4
    if abs(deg - round(deg / 90.0) * 90.0) > 1.0:
        return img  # non-axis-aligned: leave unrotated (documented divergence)
    if quarter == 0:
        return img
    # np.rot90 rotates counter-clockwise in array coords (y down), which
    # appears clockwise on screen; match Java's -theta screen rotation.
    return np.rot90(img, k=quarter)
