"""Deterministic minimal PDF writer for the synthetic corpus.

The engine's test inputs are Parquet tables of Common-Crawl-style pages
whose ``html`` column carries document payload bytes (BASELINE.json
input_hint). This module synthesizes those payloads: small, valid,
fully deterministic PDFs exercising the reference's feature surface
(text runs, rendering modes, rects/lines/polygons, images, embedded
fonts, page rotation, multi-page docs — mirroring the reference's
conformance corpus, see FIXTURES.md §2). No external data; a given
spec always produces identical bytes.

The writer emits classic xref PDFs with uncompressed content streams
(images are FlateDecoded). The engine's parser does not special-case
these files — it runs its normal object scan.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["PdfBuilder", "PageSpec", "escape_pdf_string", "tiny_ttf",
           "CORE_FONTS"]

CORE_FONTS = [
    "Helvetica", "Helvetica-Bold", "Helvetica-Oblique",
    "Times-Roman", "Times-Bold", "Times-Italic",
    "Courier", "Courier-Bold",
]


def escape_pdf_string(s: str) -> bytes:
    out = bytearray()
    for ch in s.encode("latin-1", errors="replace"):
        if ch in b"()\\":
            out.append(0x5C)
        out.append(ch)
    return bytes(out)


def tiny_ttf(seed: int) -> bytes:
    """A deterministic sfnt-shaped blob used as an embedded TTF payload.

    Structurally a TrueType header + table directory (head/hhea/maxp)
    with deterministic contents varying by ``seed``. The engine's font
    path treats embedded TTF bytes as opaque (passthrough normalize,
    see engine.fonts), so structural plausibility is all that matters.
    """
    rng = np.random.default_rng(seed)
    head = struct.pack(">IHHIIHHQQhhhhHHhhh", 0x00010000, 0, 0, 0x5F0F3CF5,
                       0, 16, 2048, 0, 0, -100, -200, 1000, 900, 0, 8, 2, 0, 0)
    hhea = struct.pack(">IhhhHhhhhhhhhhhhH", 0x00010000, 800, -200, 90, 1000,
                       0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 3)
    maxp = struct.pack(">IH", 0x00005000, 3) + bytes(rng.integers(0, 255, 26,
                                                                  dtype=np.uint8))
    tables = [(b"head", head), (b"hhea", hhea), (b"maxp", maxp)]
    n = len(tables)
    search_range = 16 * (2 ** (n.bit_length() - 1))
    out = struct.pack(">IHHHH", 0x00010000, n, search_range,
                      n.bit_length() - 1, 16 * n - search_range)
    offset = 12 + 16 * n
    directory = b""
    payload = b""
    for tag, data in tables:
        pad = (-len(data)) % 4
        directory += struct.pack(">4sIII", tag, zlib.crc32(data), offset,
                                 len(data))
        payload += data + b"\0" * pad
        offset += len(data) + pad
    return out + directory + payload


def tiny_cff(name: str, n_glyphs: int = 4) -> bytes:
    """A minimal bare-CFF program (header + Name/TopDICT/String/GSubr
    INDEXes + CharStrings INDEX) — enough structure for the engine's
    CFF→WOFF converter and any CFF header parser."""
    def index(items: list[bytes]) -> bytes:
        if not items:
            return struct.pack(">H", 0)
        offs = [1]
        for it in items:
            offs.append(offs[-1] + len(it))
        return (struct.pack(">HB", len(items), 4)
                + b"".join(struct.pack(">I", o) for o in offs)
                + b"".join(items))

    header = bytes([1, 0, 4, 4])
    name_idx = index([name.encode("latin-1")])
    charstrings = index([bytes([139, 14])] * n_glyphs)  # "0 endchar"
    # TopDICT: CharStrings offset (op 17) — offset filled after layout
    def top_dict(cs_off: int) -> bytes:
        return index([b"\x1d" + struct.pack(">i", cs_off) + b"\x11"])
    # two-pass: dict size is constant (5-byte int operand)
    dummy = top_dict(0)
    string_idx = index([])
    gsubr_idx = index([])
    cs_off = len(header) + len(name_idx) + len(dummy) + len(string_idx) \
        + len(gsubr_idx)
    return header + name_idx + top_dict(cs_off) + string_idx + gsubr_idx \
        + charstrings


class PageSpec:
    """One page: content-stream source + resource declarations."""

    def __init__(self, width: float = 612, height: float = 792,
                 rotate: int = 0):
        self.width = width
        self.height = height
        self.rotate = rotate
        self.ops: list[bytes] = []
        self.fonts: dict[str, dict] = {}     # resource name -> font spec
        self.images: dict[str, dict] = {}    # resource name -> image spec

    # -- resources -----------------------------------------------------
    def use_core_font(self, res_name: str, base_font: str) -> None:
        self.fonts[res_name] = {"kind": "core", "base": base_font}

    def use_embedded_ttf(self, res_name: str, base_font: str, seed: int,
                         widths: list[int] | None = None,
                         first_char: int = 32) -> None:
        self.fonts[res_name] = {"kind": "ttf", "base": base_font,
                                "seed": seed, "widths": widths,
                                "first_char": first_char}

    def use_type1c_font(self, res_name: str, base_font: str,
                        n_glyphs: int = 4) -> None:
        """Type1 font whose program is a bare-CFF FontFile3 (/Type1C) —
        the reference's CFF→WOFF conversion path (fonts/bare-cff.pdf)."""
        self.fonts[res_name] = {"kind": "type1c", "base": base_font,
                                "n_glyphs": n_glyphs}

    def use_type0_font(self, res_name: str, base_font: str, seed: int,
                       cid_width: int = 600) -> None:
        """Composite font: Type0 + Identity-H + CIDFontType2 descendant
        with an embedded TTF and a ToUnicode CMap covering ASCII
        (2-byte codes = codepoints)."""
        self.fonts[res_name] = {"kind": "type0", "base": base_font,
                                "seed": seed, "cid_width": cid_width}

    def use_form(self, res_name: str, content: bytes,
                 matrix: tuple = (1, 0, 0, 1, 0, 0),
                 fonts: dict | None = None) -> None:
        """Form XObject with its own content stream (+ optional fonts)."""
        self.images[res_name] = {"form": content, "matrix": matrix,
                                 "fonts": fonts or {}}

    def use_image(self, res_name: str, rgb: np.ndarray) -> None:
        self.images[res_name] = {"rgb": np.ascontiguousarray(rgb, np.uint8)}

    def use_jpeg_image(self, res_name: str, rgb: np.ndarray,
                       quality: int = 85, subsampling: str = "444",
                       progressive: bool = False) -> None:
        """Embed an image XObject with /Filter /DCTDecode (baseline or
        progressive JPEG via engine.jpeg — deterministic, no codec
        libs)."""
        self.images[res_name] = {
            "jpeg": np.ascontiguousarray(rgb, np.uint8),
            "quality": quality, "subsampling": subsampling,
            "progressive": progressive}

    def use_jpx_image(self, res_name: str, rgb: np.ndarray) -> None:
        """Embed an image XObject with /Filter /JPXDecode (lossless
        JPEG2000 via engine.jpx — deterministic, decoded pixels are
        bit-identical to ``rgb``)."""
        self.images[res_name] = {"jpx": np.ascontiguousarray(rgb, np.uint8)}

    def use_custom_image(self, res_name: str, dict_extra: str,
                         data: bytes, compress: bool = True,
                         smask: tuple | None = None) -> None:
        """Escape hatch: image XObject with caller-supplied dictionary
        entries (colorspace tests: Indexed palettes, ICCBased, CMYK,
        SMask references). ``dict_extra`` is spliced into the dict;
        /Length and /Filter (when ``compress``) are added. ``smask`` =
        (dict_extra, data) builds a soft-mask stream object and splices
        an /SMask reference."""
        self.images[res_name] = {"custom": data, "extra": dict_extra,
                                 "compress": compress, "smask": smask}

    def use_mask_image(self, res_name: str, bitmap: np.ndarray,
                       decode_inverted: bool = False) -> None:
        """Embed an /ImageMask true stencil (1-bit; sample 0 paints by
        default, Decode [1 0] when ``decode_inverted``)."""
        self.images[res_name] = {
            "mask": np.ascontiguousarray(bitmap, np.uint8),
            "inverted": decode_inverted}

    def use_ccitt_image(self, res_name: str, bitmap: np.ndarray,
                        k: int = -1) -> None:
        """Embed a 1-bit image XObject with /Filter /CCITTFaxDecode
        (K=-1 Group 4, K=0 pure-1D G3, K>0 mixed G3; nonzero = black)
        via engine.ccitt."""
        self.images[res_name] = {
            "ccitt": np.ascontiguousarray(bitmap, np.uint8), "k": k}

    # -- content helpers ----------------------------------------------
    def raw(self, op: bytes) -> None:
        self.ops.append(op)

    def text_block(self, font_res: str, size: float, x: float, y: float,
                   lines: list[str], leading: float = 14.0,
                   color=None, mode: int | None = None,
                   stroke_color=None, tm: tuple | None = None) -> None:
        b = [b"BT"]
        b.append(f"/{font_res} {size:g} Tf".encode())
        if color is not None:
            b.append(f"{color[0]:g} {color[1]:g} {color[2]:g} rg".encode())
        if stroke_color is not None:
            b.append((f"{stroke_color[0]:g} {stroke_color[1]:g} "
                      f"{stroke_color[2]:g} RG").encode())
        if mode is not None:
            b.append(f"{mode} Tr".encode())
        if tm is not None:
            b.append((" ".join(f"{v:g}" for v in tm) + " Tm").encode())
        else:
            b.append(f"1 0 0 1 {x:g} {y:g} Tm".encode())
        b.append(f"{leading:g} TL".encode())
        for i, line in enumerate(lines):
            if i > 0:
                b.append(b"T*")
            b.append(b"(" + escape_pdf_string(line) + b") Tj")
        b.append(b"ET")
        self.ops.append(b"\n".join(b))

    def rect(self, x, y, w, h, fill=None, stroke=None, line_width=None) -> None:
        b = []
        if line_width is not None:
            b.append(f"{line_width:g} w".encode())
        if fill is not None:
            b.append(f"{fill[0]:g} {fill[1]:g} {fill[2]:g} rg".encode())
        if stroke is not None:
            b.append(f"{stroke[0]:g} {stroke[1]:g} {stroke[2]:g} RG".encode())
        b.append(f"{x:g} {y:g} {w:g} {h:g} re".encode())
        if fill is not None and stroke is not None:
            b.append(b"B")
        elif fill is not None:
            b.append(b"f")
        else:
            b.append(b"S")
        self.ops.append(b"\n".join(b))

    def line(self, x1, y1, x2, y2, stroke=(0, 0, 0), line_width=1.0) -> None:
        self.ops.append(
            f"{line_width:g} w\n{stroke[0]:g} {stroke[1]:g} {stroke[2]:g} RG\n"
            f"{x1:g} {y1:g} m\n{x2:g} {y2:g} l\nS".encode())

    def polygon(self, pts: list[tuple], fill=(0.85, 0.85, 0.85)) -> None:
        b = [f"{fill[0]:g} {fill[1]:g} {fill[2]:g} rg".encode()]
        b.append(f"{pts[0][0]:g} {pts[0][1]:g} m".encode())
        for px, py in pts[1:]:
            b.append(f"{px:g} {py:g} l".encode())
        b.append(b"h")
        b.append(b"f")
        self.ops.append(b"\n".join(b))

    def draw_image(self, res_name: str, x, y, w, h) -> None:
        self.ops.append(
            f"q\n{w:g} 0 0 {h:g} {x:g} {y:g} cm\n/{res_name} Do\nQ".encode())

    def draw_form(self, res_name: str) -> None:
        self.ops.append(f"/{res_name} Do".encode())

    def text_hex(self, font_res: str, size: float, x: float, y: float,
                 text: str) -> None:
        """Show text with 2-byte hex codes (Type0/Identity-H fonts)."""
        hexstr = "".join(f"{ord(c):04X}" for c in text)
        self.ops.append(
            f"BT /{font_res} {size:g} Tf 1 0 0 1 {x:g} {y:g} Tm "
            f"<{hexstr}> Tj ET".encode())

    def content(self) -> bytes:
        return b"\n".join(self.ops) + b"\n"


class PdfBuilder:
    """Assembles PageSpecs into deterministic classic-xref PDF bytes."""

    def __init__(self, title: str | None = None):
        self.title = title
        self.pages: list[PageSpec] = []

    def add_page(self, page: PageSpec) -> PageSpec:
        self.pages.append(page)
        return page

    def build(self) -> bytes:
        objects: list[bytes] = []  # 1-indexed object bodies

        def add(body: bytes) -> int:
            objects.append(body)
            return len(objects)

        font_obj_cache: dict[tuple, int] = {}

        def font_object(spec: dict) -> int:
            if spec["kind"] == "core":
                key = ("core", spec["base"])
                if key not in font_obj_cache:
                    font_obj_cache[key] = add(
                        f"<< /Type /Font /Subtype /Type1 /BaseFont /{spec['base']} >>"
                        .encode())
                return font_obj_cache[key]
            if spec["kind"] == "type1c":
                key = ("type1c", spec["base"], spec["n_glyphs"])
                if key in font_obj_cache:
                    return font_obj_cache[key]
                cff = tiny_cff(spec["base"], spec["n_glyphs"])
                ff_num = add(
                    f"<< /Length {len(cff)} /Subtype /Type1C >>".encode()
                    + b"\nstream\n" + cff + b"\nendstream")
                desc_num = add((
                    f"<< /Type /FontDescriptor /FontName /{spec['base']} "
                    f"/Flags 4 /FontBBox [-100 -200 1000 900] /ItalicAngle 0 "
                    f"/Ascent 800 /Descent -200 /CapHeight 700 /StemV 80 "
                    f"/FontFile3 {ff_num} 0 R >>").encode())
                num = add((
                    f"<< /Type /Font /Subtype /Type1 /BaseFont /{spec['base']} "
                    f"/FirstChar 32 /LastChar 126 "
                    f"/Widths [{' '.join(['500'] * 95)}] "
                    f"/FontDescriptor {desc_num} 0 R >>").encode())
                font_obj_cache[key] = num
                return num
            if spec["kind"] == "type0":
                key = ("type0", spec["base"], spec["seed"])
                if key in font_obj_cache:
                    return font_obj_cache[key]
                ttf = tiny_ttf(spec["seed"])
                ff_num = add(
                    f"<< /Length {len(ttf)} /Length1 {len(ttf)} >>".encode()
                    + b"\nstream\n" + ttf + b"\nendstream")
                desc_num = add((
                    f"<< /Type /FontDescriptor /FontName /{spec['base']} "
                    f"/Flags 4 /FontBBox [-100 -200 1000 900] /ItalicAngle 0 "
                    f"/Ascent 800 /Descent -200 /CapHeight 700 /StemV 80 "
                    f"/FontFile2 {ff_num} 0 R >>").encode())
                cw = spec["cid_width"]
                cid_num = add((
                    f"<< /Type /Font /Subtype /CIDFontType2 "
                    f"/BaseFont /{spec['base']} "
                    f"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
                    f"/Supplement 0 >> /FontDescriptor {desc_num} 0 R "
                    f"/DW {cw} /CIDToGIDMap /Identity >>").encode())
                # ToUnicode: identity for the BMP ASCII range
                cmap = (b"/CIDInit /ProcSet findresource begin\n"
                        b"begincmap\n1 begincodespacerange <0000> <FFFF> "
                        b"endcodespacerange\n1 beginbfrange\n"
                        b"<0020> <007E> <0020>\nendbfrange\nendcmap\nend")
                tu_num = add(f"<< /Length {len(cmap)} >>".encode()
                             + b"\nstream\n" + cmap + b"\nendstream")
                num = add((
                    f"<< /Type /Font /Subtype /Type0 /BaseFont /{spec['base']} "
                    f"/Encoding /Identity-H /DescendantFonts [{cid_num} 0 R] "
                    f"/ToUnicode {tu_num} 0 R >>").encode())
                font_obj_cache[key] = num
                return num
            # embedded TTF
            key = ("ttf", spec["base"], spec["seed"])
            if key in font_obj_cache:
                return font_obj_cache[key]
            ttf = tiny_ttf(spec["seed"])
            ff_num = add(
                f"<< /Length {len(ttf)} /Length1 {len(ttf)} >>".encode()
                + b"\nstream\n" + ttf + b"\nendstream")
            desc_num = add((
                f"<< /Type /FontDescriptor /FontName /{spec['base']} /Flags 32 "
                f"/FontBBox [-100 -200 1000 900] /ItalicAngle 0 /Ascent 800 "
                f"/Descent -200 /CapHeight 700 /StemV 80 "
                f"/FontFile2 {ff_num} 0 R >>").encode())
            widths = spec["widths"] or [500] * 95
            warr = "[" + " ".join(str(w) for w in widths) + "]"
            fc = spec["first_char"]
            key_num = add((
                f"<< /Type /Font /Subtype /TrueType /BaseFont /{spec['base']} "
                f"/FirstChar {fc} /LastChar {fc + len(widths) - 1} "
                f"/Widths {warr} /FontDescriptor {desc_num} 0 R >>").encode())
            font_obj_cache[key] = key_num
            return key_num

        page_nums: list[int] = []
        pages_obj_placeholder = None
        # reserve the Pages object number up front: catalog → pages → kids
        # (we append bodies in dependency order and patch refs textually)
        kids_entries = []

        built_pages = []
        for p in self.pages:
            res_parts = []
            if p.fonts:
                fonts = " ".join(f"/{name} {font_object(spec)} 0 R"
                                 for name, spec in p.fonts.items())
                res_parts.append(f"/Font << {fonts} >>")
            if p.images:
                xo = []
                for name, spec in p.images.items():
                    if "form" in spec:
                        fres = ""
                        if spec["fonts"]:
                            ff = " ".join(f"/{n} {font_object(s)} 0 R"
                                          for n, s in spec["fonts"].items())
                            fres = f" /Resources << /Font << {ff} >> >>"
                        mtx = " ".join(f"{v:g}" for v in spec["matrix"])
                        body = spec["form"]
                        num = add((
                            f"<< /Type /XObject /Subtype /Form "
                            f"/BBox [0 0 612 792] /Matrix [{mtx}]{fres} "
                            f"/Length {len(body)} >>").encode()
                            + b"\nstream\n" + body + b"\nendstream")
                    elif "custom" in spec:
                        extra = spec["extra"]
                        if spec.get("smask"):
                            sm_extra, sm_data = spec["smask"]
                            sm_payload = zlib.compress(sm_data, 6)
                            sm_num = add((
                                f"<< /Type /XObject /Subtype /Image "
                                f"{sm_extra} /Filter /FlateDecode "
                                f"/Length {len(sm_payload)} >>").encode()
                                + b"\nstream\n" + sm_payload
                                + b"\nendstream")
                            extra = f"{extra} /SMask {sm_num} 0 R"
                        payload = spec["custom"]
                        filt = ""
                        if spec["compress"]:
                            payload = zlib.compress(payload, 6)
                            filt = " /Filter /FlateDecode"
                        num = add((
                            f"<< /Type /XObject /Subtype /Image "
                            f"{extra}{filt} "
                            f"/Length {len(payload)} >>").encode()
                            + b"\nstream\n" + payload + b"\nendstream")
                    elif "mask" in spec:
                        bm = spec["mask"]      # 1 = painted sample
                        h, w = bm.shape[:2]
                        # pack bits: default Decode → sample 0 paints
                        samples = (bm == 0).astype(np.uint8) if \
                            not spec["inverted"] else bm.astype(np.uint8)
                        row_bytes = (w + 7) // 8
                        padded = np.zeros((h, row_bytes * 8), np.uint8)
                        padded[:, :w] = samples
                        data = zlib.compress(
                            np.packbits(padded, axis=1).tobytes(), 6)
                        dec = " /Decode [1 0]" if spec["inverted"] else ""
                        num = add((
                            f"<< /Type /XObject /Subtype /Image /Width {w} "
                            f"/Height {h} /ImageMask true "
                            f"/BitsPerComponent 1{dec} "
                            f"/Filter /FlateDecode "
                            f"/Length {len(data)} >>").encode()
                            + b"\nstream\n" + data + b"\nendstream")
                    elif "ccitt" in spec:
                        from ..engine.ccitt import encode_g3, encode_g4
                        bm = spec["ccitt"]
                        kk = spec.get("k", -1)
                        h, w = bm.shape[:2]
                        data = encode_g4(bm) if kk < 0 else \
                            encode_g3(bm, k=kk)
                        num = add((
                            f"<< /Type /XObject /Subtype /Image /Width {w} "
                            f"/Height {h} /ColorSpace /DeviceGray "
                            f"/BitsPerComponent 1 /Filter /CCITTFaxDecode "
                            f"/DecodeParms << /K {kk} /Columns {w} "
                            f"/Rows {h} >> "
                            f"/Length {len(data)} >>").encode()
                            + b"\nstream\n" + data + b"\nendstream")
                    elif "jpx" in spec:
                        from ..engine.jpx import encode_jpx
                        rgb = spec["jpx"]
                        h, w = rgb.shape[:2]
                        data = encode_jpx(rgb)
                        cs = "/DeviceGray" if rgb.ndim == 2 else "/DeviceRGB"
                        num = add((
                            f"<< /Type /XObject /Subtype /Image /Width {w} "
                            f"/Height {h} /ColorSpace {cs} "
                            f"/BitsPerComponent 8 /Filter /JPXDecode "
                            f"/Length {len(data)} >>").encode()
                            + b"\nstream\n" + data + b"\nendstream")
                    elif "jpeg" in spec:
                        from ..engine.jpeg import (encode_baseline_jpeg,
                                                   encode_progressive_jpeg)
                        rgb = spec["jpeg"]
                        h, w = rgb.shape[:2]
                        gray = rgb.ndim == 2
                        if spec.get("progressive"):
                            data = encode_progressive_jpeg(
                                rgb, spec["quality"], spec["subsampling"])
                        else:
                            data = encode_baseline_jpeg(
                                rgb, spec["quality"], spec["subsampling"])
                        cs = "/DeviceGray" if gray else "/DeviceRGB"
                        num = add((
                            f"<< /Type /XObject /Subtype /Image /Width {w} "
                            f"/Height {h} /ColorSpace {cs} "
                            f"/BitsPerComponent 8 /Filter /DCTDecode "
                            f"/Length {len(data)} >>").encode()
                            + b"\nstream\n" + data + b"\nendstream")
                    else:
                        rgb = spec["rgb"]
                        h, w = rgb.shape[:2]
                        data = zlib.compress(rgb.tobytes(), 6)
                        num = add((
                            f"<< /Type /XObject /Subtype /Image /Width {w} "
                            f"/Height {h} /ColorSpace /DeviceRGB "
                            f"/BitsPerComponent 8 /Filter /FlateDecode "
                            f"/Length {len(data)} >>").encode()
                            + b"\nstream\n" + data + b"\nendstream")
                    xo.append(f"/{name} {num} 0 R")
                res_parts.append(f"/XObject << {' '.join(xo)} >>")
            resources = "<< " + " ".join(res_parts) + " >>" if res_parts else "<< >>"
            content = p.content()
            content_num = add(f"<< /Length {len(content)} >>".encode()
                              + b"\nstream\n" + content + b"\nendstream")
            built_pages.append((p, resources, content_num))

        pages_num_holder = len(objects) + len(built_pages) + 1
        for p, resources, content_num in built_pages:
            rot = f" /Rotate {p.rotate}" if p.rotate else ""
            num = add((
                f"<< /Type /Page /Parent {pages_num_holder} 0 R "
                f"/MediaBox [0 0 {p.width:g} {p.height:g}]{rot} "
                f"/Resources {resources} /Contents {content_num} 0 R >>").encode())
            page_nums.append(num)
            kids_entries.append(f"{num} 0 R")

        pages_num = add((
            f"<< /Type /Pages /Count {len(page_nums)} "
            f"/Kids [{' '.join(kids_entries)}] >>").encode())
        assert pages_num == pages_num_holder
        catalog_num = add(f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode())
        info_num = None
        if self.title is not None:
            info_num = add(b"<< /Title (" + escape_pdf_string(self.title)
                           + b") >>")

        # assemble with classic xref
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0]
        for i, body in enumerate(objects, start=1):
            offsets.append(len(out))
            out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_off = len(out)
        n = len(objects) + 1
        out += f"xref\n0 {n}\n".encode()
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += f"{off:010d} 00000 n \n".encode()
        trailer = f"trailer\n<< /Size {n} /Root {catalog_num} 0 R"
        if info_num is not None:
            trailer += f" /Info {info_num} 0 R"
        trailer += f" >>\nstartxref\n{xref_off}\n%%EOF\n"
        out += trailer.encode()
        return bytes(out)
