"""Image colorspaces + soft masks: Indexed palettes, ICCBased,
DeviceCMYK rasters, sub-8-bit samples, /SMask alpha.

PDFBox decodes all of these via PDColorSpace.toRGBImage
(`PDFBoxTree.java:544-590` hands images to PDImageXObject.getImage);
the engine's raster path mirrors the sample→RGB mappings, with CMYK
following the engine-wide text-color convention
(walker._components_to_rgb parity).
"""

import base64
import re

import numpy as np
import pytest

from pdf2dom_ray.engine.parse import parse_document
from pdf2dom_ray.functions.multimodal import decode_engine_png
from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder


def _render(dict_extra, data, smask=None):
    b = PdfBuilder(title="cs")
    p = PageSpec()
    p.use_custom_image("Im0", dict_extra, data, smask=smask)
    p.draw_image("Im0", 100, 600, 48, 48)
    b.add_page(p)
    r = parse_document(b.build())
    assert r.error is None, r.error
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m, "expected a decoded image"
    return decode_engine_png(base64.b64decode(m.group(1)))


def test_indexed_rgb_palette():
    # 2x2 image, 8-bit indices into a 3-entry RGB palette
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    extra = ("/Width 2 /Height 2 /BitsPerComponent 8 "
             "/ColorSpace [/Indexed /DeviceRGB 2 <" + palette.hex() + ">]")
    img = _render(extra, bytes([0, 1, 2, 0]))
    assert img[0, 0].tolist()[:3] == [255, 0, 0]
    assert img[0, 1].tolist()[:3] == [0, 255, 0]
    assert img[1, 0].tolist()[:3] == [0, 0, 255]


def test_indexed_4bit_samples():
    # 4-bit indices: two pixels per byte, rows byte-padded
    palette = bytes([10, 20, 30, 200, 100, 50])
    extra = ("/Width 2 /Height 1 /BitsPerComponent 4 "
             "/ColorSpace [/Indexed /DeviceRGB 1 <" + palette.hex() + ">]")
    img = _render(extra, bytes([0x01]))       # indices 0, 1
    assert img[0, 0].tolist()[:3] == [10, 20, 30]
    assert img[0, 1].tolist()[:3] == [200, 100, 50]


def test_iccbased_treated_by_component_count():
    b = PdfBuilder(title="icc")
    p = PageSpec()
    # ICCBased stream with /N 3 → RGB
    import zlib as z
    icc_body = z.compress(b"\x00" * 16)
    # hand-roll: custom image referencing an ICC stream via builder forms
    # is awkward; inline the stream via use_custom_image's smask slot is
    # wrong — instead craft the PDF directly.
    data = z.compress(bytes([250, 10, 10, 10, 250, 10, 10, 10, 250, 0, 0, 0]))
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /XObject << /Im0 5 0 R >> >> /Contents 6 0 R >>"
           b"\nendobj\n"
           b"4 0 obj\n<< /N 3 /Length " + str(len(icc_body)).encode()
           + b" /Filter /FlateDecode >>\nstream\n" + icc_body
           + b"\nendstream\nendobj\n"
           b"5 0 obj\n<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
           b"/BitsPerComponent 8 /ColorSpace [/ICCBased 4 0 R] "
           b"/Filter /FlateDecode /Length " + str(len(data)).encode()
           + b" >>\nstream\n" + data + b"\nendstream\nendobj\n"
           b"6 0 obj\n<< /Length 32 >>\nstream\n"
           b"q 48 0 0 48 100 600 cm /Im0 Do Q\nendstream\nendobj\n"
           b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n")
    r = parse_document(pdf)
    assert r.error is None
    m = re.search(r'src="data:image/png;base64,([^"]+)"', r.html_dom)
    assert m
    img = decode_engine_png(base64.b64decode(m.group(1)))
    assert img[0, 0, 0] == 250 and img[0, 1, 1] == 250


def test_cmyk_raster():
    # 1x2: pure cyan (c=255) and pure black (k=255)
    extra = ("/Width 2 /Height 1 /BitsPerComponent 8 "
             "/ColorSpace /DeviceCMYK")
    img = _render(extra, bytes([255, 0, 0, 0, 0, 0, 0, 255]))
    assert img[0, 0].tolist()[:3] == [0, 255, 255]     # cyan
    assert img[0, 1].tolist()[:3] == [0, 0, 0]         # black


def test_smask_alpha():
    # 2x2 gray image with an SMask making the right column transparent
    extra = "/Width 2 /Height 2 /BitsPerComponent 8 /ColorSpace /DeviceGray"
    smask_extra = ("/Width 2 /Height 2 /BitsPerComponent 8 "
                   "/ColorSpace /DeviceGray")
    img = _render(extra, bytes([100, 100, 100, 100]),
                  smask=(smask_extra, bytes([255, 0, 255, 0])))
    assert img.shape[2] == 4
    assert img[0, 0, 3] == 255
    assert img[0, 1, 3] == 0
    assert img[0, 0, 0] == 100


def test_2bit_gray():
    extra = "/Width 4 /Height 1 /BitsPerComponent 2 /ColorSpace /DeviceGray"
    # samples 0,1,2,3 → 0, 85, 170, 255
    img = _render(extra, bytes([0b00011011]))
    assert [int(img[0, i, 0]) for i in range(4)] == [0, 85, 170, 255]
