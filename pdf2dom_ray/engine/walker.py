"""Content-stream walker: PDF operators → positioned boxes → DOM.

This is the per-document kernel of the engine — the from-scratch
re-expression of the reference's ``PDFBoxTree`` + ``PDFDomTree``
(`/root/reference/src/main/java/org/fit/pdfdom/PDFBoxTree.java`,
`PDFDomTree.java`). One forward pass over each page's content stream
with mutable graphics/text state; glyphs are accumulated into text
boxes split by the reference's predicate
(``distx>1.0 ∨ distx<−6.0 ∨ |disty|>1.0 ∨ directionality flip ∨ style
change`` — PDFBoxTree.java:632-637); paths, rectangles, lines and
images are emitted in content-stream order.

Behavioral notes pinned to the reference:

* ``processTextPosition`` is overridden there without calling super
  (PDFBoxTree.java:593-656), so PDFBox's sort-by-position and
  duplicate-overlap suppression (set at PDFBoxTree.java:157-158) never
  run — glyph order is content-stream order. This walker replicates
  that.
* Whitespace-only glyphs are dropped (Java ``trim`` = chars <= U+0020,
  PDFBoxTree.java:599); word gaps therefore split boxes via distx.
* ``finishBox`` runs when the *next* box starts or at page end, so a
  path/image drawn between two text runs can precede the earlier text
  box in the DOM (PDFBoxTree.java:639-648, 200-210).
* Invisible text (rendering mode 3) still produces boxes with
  transparent color (PDFBoxTree.java:766-791).
* Bézier operators (c/v/y) are not registered in the reference and are
  silently ignored; curved filled paths degrade at the rasterizer.
"""

from __future__ import annotations

import math
import unicodedata

import numpy as np

from .cos import (Name, PdfDocument, PdfParseError, Stream, float_value)
from .fonts import FontTable, PdfFont, load_font
from .images import UnsupportedImageError, decode_image, rotate_image_90s
from .metrics import TextMetrics
from .path import PathSegment
from .style import BoxStyle, TRANSPARENT_COLOR

f32 = np.float32

UNIT = "pt"  # PDFBoxTree.java:88

# Known font names (PDFBoxTree.java:91-98) — order matters
CSS_FONT_FAMILY = ["Times New Roman", "Times", "Garamond", "Helvetica",
                   "Arial Narrow", "Arial", "Verdana", "Courier New",
                   "MS Sans Serif"]
PD_FONT_TYPE = ["normal", "roman", "bold", "italic", "bolditalic"]
CSS_FONT_WEIGHT = ["normal", "normal", "bold", "normal", "bold"]
CSS_FONT_STYLE = ["normal", "normal", "normal", "italic", "italic"]

# rendering modes (PDF 32000 9.3.6)
_FILL_MODES = {0, 2, 4, 6}
_STROKE_MODES = {1, 2, 5, 6}

_RTL_BIDI = {"R", "AL", "RLE", "RLO"}  # isReversed classes, PDFBoxTree.java:686-699

# test hook: disable the vectorized ASCII path to exercise the glyph loop
FAST_ASCII = True

__all__ = ["Matrix", "GraphicsState", "TextPosition", "Walker", "colorstr"]


class Matrix:
    """PDF matrix [a b 0; c d 0; e f 1], row-vector convention."""

    __slots__ = ("a", "b", "c", "d", "e", "f")

    def __init__(self, a=1.0, b=0.0, c=0.0, d=1.0, e=0.0, f=0.0):
        self.a, self.b, self.c, self.d, self.e, self.f = (
            float(a), float(b), float(c), float(d), float(e), float(f))

    def multiply(self, o: "Matrix") -> "Matrix":
        """self · o in PDF terms: apply self first, then o."""
        return Matrix(
            self.a * o.a + self.b * o.c,
            self.a * o.b + self.b * o.d,
            self.c * o.a + self.d * o.c,
            self.c * o.b + self.d * o.d,
            self.e * o.a + self.f * o.c + o.e,
            self.e * o.b + self.f * o.d + o.f,
        )

    def transform(self, x: float, y: float) -> tuple[float, float]:
        return (x * self.a + y * self.c + self.e,
                x * self.b + y * self.d + self.f)

    def scaling_factor_x(self) -> float:
        # PDFBox Matrix.getScalingFactorX: sqrt(a^2+b^2) when b != 0 else a
        if self.b != 0.0:
            return math.sqrt(self.a * self.a + self.b * self.b)
        return self.a

    def scaling_factor_y(self) -> float:
        if self.c != 0.0:
            return math.sqrt(self.c * self.c + self.d * self.d)
        return self.d

    @staticmethod
    def translate(tx, ty) -> "Matrix":
        return Matrix(1, 0, 0, 1, tx, ty)

    @staticmethod
    def scale(sx, sy) -> "Matrix":
        return Matrix(sx, 0, 0, sy, 0, 0)

    def copy(self) -> "Matrix":
        return Matrix(self.a, self.b, self.c, self.d, self.e, self.f)


class Affine:
    """java.awt.geom.AffineTransform column-vector semantics subset."""

    __slots__ = ("m",)

    def __init__(self):
        self.m = np.eye(3, dtype=np.float64)

    def translate(self, tx, ty) -> "Affine":
        t = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], dtype=np.float64)
        self.m = self.m @ t
        return self

    def rotate(self, theta) -> "Affine":
        c, s = math.cos(theta), math.sin(theta)
        r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float64)
        self.m = self.m @ r
        return self

    def scale(self, sx, sy) -> "Affine":
        t = np.diag([sx, sy, 1.0])
        self.m = self.m @ t
        return self

    def apply(self, x, y) -> tuple[float, float]:
        v = self.m @ np.array([x, y, 1.0])
        return float(v[0]), float(v[1])


def _java_trim_empty(s: str) -> bool:
    """Java String.trim().isEmpty(): strips only chars <= U+0020."""
    return all(ord(ch) <= 0x20 for ch in s)


def _is_reversed(ch: str) -> bool:
    return bool(ch) and unicodedata.bidirectional(ch[0]) in _RTL_BIDI


def _is_diacritic(ch: str) -> bool:
    """TextPosition.isDiacritic: combining-mark categories."""
    if len(ch) != 1:
        return False
    return unicodedata.category(ch) in ("Mn", "Mc", "Me")


def colorstr_rgb255(ir: int, ig: int, ib: int) -> str:
    """``#%02x%02x%02x`` (PDFBoxTree.java:915-918)."""
    return "#%02x%02x%02x" % (ir & 0xFF, ig & 0xFF, ib & 0xFF)


def colorstr_rgbf(r: float, g: float, b: float) -> str:
    """float→255 **truncation**, not rounding (PDFBoxTree.java:927-930)."""
    return colorstr_rgb255(int(r * 255), int(g * 255), int(b * 255))


def _components_to_rgb(cs: str, comps: tuple) -> tuple[float, float, float] | None:
    n = len(comps)
    if cs == "Pattern":
        return None  # colorString exception path → null (PDFBoxTree.java:937-950)
    if cs in ("DeviceRGB",) or (cs not in ("DeviceGray", "DeviceCMYK") and n == 3):
        if n >= 3:
            return comps[0], comps[1], comps[2]
    if cs in ("DeviceGray",) or n == 1:
        g = comps[0] if n >= 1 else 0.0
        return g, g, g
    if cs in ("DeviceCMYK",) or n == 4:
        if n >= 4:
            c, m, y, k = comps
            return (1 - min(1.0, c + k), 1 - min(1.0, m + k), 1 - min(1.0, y + k))
    if n == 0:
        return 0.0, 0.0, 0.0
    return None


def colorstr(cs: str, comps: tuple) -> str | None:
    rgb = _components_to_rgb(cs, comps)
    if rgb is None:
        return None
    return colorstr_rgbf(*rgb)


class TextState:
    __slots__ = ("font", "font_size", "char_spacing", "word_spacing",
                 "h_scale", "leading", "rise", "rendering_mode")

    def __init__(self):
        self.font: PdfFont | None = None
        self.font_size = 0.0
        self.char_spacing = 0.0
        self.word_spacing = 0.0
        self.h_scale = 1.0
        self.leading = 0.0
        self.rise = 0.0
        self.rendering_mode = 0

    def copy(self) -> "TextState":
        t = TextState()
        for k in self.__slots__:
            setattr(t, k, getattr(self, k))
        return t


class GraphicsState:
    __slots__ = ("ctm", "stroke_cs", "stroke_comps", "nonstroke_cs",
                 "nonstroke_comps", "line_width", "text")

    def __init__(self):
        self.ctm = Matrix()
        self.stroke_cs = "DeviceGray"
        self.stroke_comps: tuple = (0.0,)
        self.nonstroke_cs = "DeviceGray"
        self.nonstroke_comps: tuple = (0.0,)
        self.line_width = 1.0
        self.text = TextState()

    def copy(self) -> "GraphicsState":
        g = GraphicsState()
        g.ctm = self.ctm.copy()
        g.stroke_cs = self.stroke_cs
        g.stroke_comps = self.stroke_comps
        g.nonstroke_cs = self.nonstroke_cs
        g.nonstroke_comps = self.nonstroke_comps
        g.line_width = self.line_width
        g.text = self.text.copy()
        return g

    def stroke_color_str(self) -> str | None:
        return colorstr(self.stroke_cs, self.stroke_comps)

    def nonstroke_color_str(self) -> str | None:
        return colorstr(self.nonstroke_cs, self.nonstroke_comps)

    def stroke_rgb255(self) -> tuple[int, int, int]:
        rgb = _components_to_rgb(self.stroke_cs, self.stroke_comps) or (0, 0, 0)
        return tuple(int(v * 255) for v in rgb)

    def nonstroke_rgb255(self) -> tuple[int, int, int]:
        rgb = _components_to_rgb(self.nonstroke_cs, self.nonstroke_comps) or (0, 0, 0)
        return tuple(int(v * 255) for v in rgb)


class TextPosition:
    """The glyph record consumed by the box state machine (the subset of
    PDFBox's TextPosition the reference reads)."""

    __slots__ = ("x", "y", "width", "height", "x_scale", "y_scale",
                 "unicode", "font", "font_size_pt", "code")

    def __init__(self, x, y, width, height, x_scale, y_scale, unicode,
                 font, font_size_pt, code):
        self.x = f32(x)
        self.y = f32(y)
        self.width = f32(width)
        self.height = f32(height)
        self.x_scale = f32(x_scale)
        self.y_scale = f32(y_scale)
        self.unicode = unicode
        self.font = font
        self.font_size_pt = f32(font_size_pt)
        self.code = code

    @classmethod
    def raw(cls, x, y, width, height, x_scale, y_scale, unicode, font,
            font_size_pt, code):
        """Cast-free constructor for values already in float32 (the
        vectorized path) — same field semantics, no per-field np calls."""
        tp = cls.__new__(cls)
        tp.x = x
        tp.y = y
        tp.width = width
        tp.height = height
        tp.x_scale = x_scale
        tp.y_scale = y_scale
        tp.unicode = unicode
        tp.font = font
        tp.font_size_pt = font_size_pt
        tp.code = code
        return tp


class Walker:
    """One instance per document parse (cheap; heavy caches live on the
    actor that owns the parser — see stages.parser_stage)."""

    def __init__(self, doc: PdfDocument, emitter, config):
        self.doc = doc
        self.emitter = emitter
        self.config = config
        self.font_table = FontTable()
        self.font_cache: dict[int, PdfFont] = {}
        self._style_cache: dict[int, tuple] = {}

        # per-document walker state (PDFBoxTree.java:118-150)
        self.style = BoxStyle(UNIT)
        self.curstyle = BoxStyle(UNIT)
        self.text_line: list[str] = []
        self.text_metrics: TextMetrics | None = None
        self.last_text: TextPosition | None = None
        self.last_dia: TextPosition | None = None
        self.graphics_path: list[PathSegment] = []
        self.path_x = self.path_y = 0.0
        self.path_start_x = self.path_start_y = 0.0

        self.page = None
        self.page_rotation = 0
        self.crop = (0.0, 0.0, 612.0, 792.0)

        self.gs = GraphicsState()
        self.gs_stack: list[GraphicsState] = []
        self.tm = Matrix()
        self.tlm = Matrix()

        # cooperative per-document wall-clock budget: checked at page
        # boundaries and every ~4096 operators; exceeded → error row
        # (a pathological document must never hang a worker — SURVEY §4)
        import time as _time
        self._deadline = (_time.monotonic() + config.timeout_s
                          if getattr(config, "timeout_s", 0) else None)
        self._op_count = 0

    def _check_deadline(self) -> None:
        if self._deadline is not None:
            import time as _time
            if _time.monotonic() > self._deadline:
                raise PdfParseError("document timeout exceeded")

    # ------------------------------------------------------------------
    def process_document(self) -> None:
        self.emitter.start_document(self.doc)
        start = self.config.start_page
        end = self.config.end_page
        for pageno, page in enumerate(self.doc.pages, start=1):
            if pageno < start or pageno > end:
                continue
            self._check_deadline()
            self.page = page
            self.page_rotation = page.rotation
            self.crop = tuple(page.crop_box)
            self._update_font_table(page)
            self.emitter.start_new_page(self)
            self._process_page_content(page)
            self.finish_box()
        self.emitter.end_document(self.doc, self)

    # -- font table (PDFBoxTree.java:353-406) --------------------------
    def _update_font_table(self, page) -> None:
        if getattr(self.config, "skip_fonts", False):
            return  # ignore-fonts fast path (PDFDomTree.java:456-462)
        try:
            self._process_font_resources(page.resources, set(), 0)
        except PdfParseError:
            pass

    def _process_font_resources(self, resources, seen_ids: set, depth: int) -> None:
        if depth > 8:
            return
        res = self.doc.resolve(resources)
        if not isinstance(res, dict) or id(res) in seen_ids:
            return
        seen_ids.add(id(res))
        fonts = self.doc.resolve(res.get("Font")) or {}
        if isinstance(fonts, dict):
            for key in fonts:
                try:
                    font = self._get_font(fonts, key)
                except PdfParseError:
                    continue
                if font is None:
                    continue
                # admission rules, PDFBoxTree.java:368-392
                if font.pd_type == "TrueType":
                    self.font_table.add_entry(font)
                elif font.is_type0 and font.descendant_is_cid2:
                    self.font_table.add_entry(font)
                elif font.is_type1c:
                    self.font_table.add_entry(font)
        xobjs = self.doc.resolve(res.get("XObject")) or {}
        if isinstance(xobjs, dict):
            for key in xobjs:
                xo = self.doc.resolve(xobjs[key])
                if isinstance(xo, Stream) and xo.dict.get("Subtype") == "Form":
                    sub = xo.dict.get("Resources")
                    if sub is not None:
                        self._process_font_resources(sub, seen_ids, depth + 1)

    def _get_font(self, fonts_dict: dict, key) -> PdfFont | None:
        ref = fonts_dict[key]
        cache_key = id(ref) if not isinstance(ref, tuple) else hash(ref)
        if cache_key not in self.font_cache:
            fd = self.doc.resolve(ref)
            if not isinstance(fd, dict):
                return None
            self.font_cache[cache_key] = load_font(self.doc, fd)
        return self.font_cache[cache_key]

    # -- page transform (PDFBoxTree.java:831-855) ----------------------
    def page_transform(self) -> Affine:
        llx, lly, urx, ury = self.crop
        w = urx - llx
        h = ury - lly
        t = Affine()
        rot = self.page_rotation
        if rot == 90:
            t.translate(h, 0)
        elif rot == 180:
            t.translate(w, h)
        elif rot == 270:
            t.translate(0, w)
        t.rotate(math.radians(rot))
        t.translate(0, h)
        t.scale(1, -1)
        t.translate(-llx, -lly)
        return t

    def transform_position(self, x: float, y: float) -> tuple[float, float]:
        dx, dy = self.gs.ctm.transform(x, y)
        return self.page_transform().apply(dx, dy)

    def transform_width(self, width: float) -> float:
        """PDFStreamEngine.transformWidth."""
        m = self.gs.ctm
        x = m.a + m.c
        y = m.b + m.d
        return float(f32(width * math.sqrt((x * x + y * y) * 0.5)))

    # -- content interpretation ----------------------------------------
    def _process_page_content(self, page) -> None:
        try:
            content = page.content_bytes()
        except PdfParseError:
            return
        self._execute(content, page.resources, depth=0)

    def _execute(self, content: bytes, resources, depth: int) -> None:
        if depth > 8:
            return
        from .cos import Lexer
        lex = Lexer(content)
        operands: list = []
        while True:
            lex.skip_ws()
            if lex.pos >= lex.end:
                break
            c = lex.buf[lex.pos]
            if c == 0x2F or c == 0x28 or c == 0x3C or c == 0x5B or c in b"+-.0123456789":
                try:
                    operands.append(lex.parse_object(allow_ref=False))
                except PdfParseError:
                    break
                continue
            start = lex.pos
            while lex.pos < lex.end and lex.buf[lex.pos] not in b"\x00\t\n\x0c\r ()<>[]{}/%":
                lex.pos += 1
            op = lex.buf[start:lex.pos].decode("latin-1")
            if not op:
                lex.pos += 1
                continue
            if op == "BI":
                endidx = content.find(b"EI", lex.pos)
                lex.pos = lex.end if endidx < 0 else endidx + 2
                operands = []
                continue
            self._op_count += 1
            if self._op_count % 4096 == 0:
                self._check_deadline()
            try:
                self._op(op, operands, resources, depth)
            except PdfParseError as e:
                if "timeout" in str(e):
                    raise
            operands = []

    def _op(self, op: str, args: list, resources, depth: int) -> None:
        gs = self.gs
        cfg = self.config
        if op == "Tw":
            if args:
                self.style.set_word_spacing(float_value(args[0]))
            gs.text.word_spacing = float_value(args[0]) if args else 0.0
        elif op == "Tc":
            if args:
                self.style.set_letter_spacing(float_value(args[0]))
            gs.text.char_spacing = float_value(args[0]) if args else 0.0
        elif op == "m":
            if not cfg.disable_graphics and len(args) == 2:
                pos = self.transform_position(float_value(args[0]), float_value(args[1]))
                self.path_x, self.path_y = pos
                self.path_start_x, self.path_start_y = pos
        elif op == "l":
            if not cfg.disable_graphics and len(args) == 2:
                pos = self.transform_position(float_value(args[0]), float_value(args[1]))
                self.graphics_path.append(
                    PathSegment(self.path_x, self.path_y, pos[0], pos[1]))
                self.path_x, self.path_y = pos
        elif op == "h":
            if not cfg.disable_graphics:
                self.graphics_path.append(PathSegment(
                    self.path_x, self.path_y, self.path_start_x, self.path_start_y))
        elif op == "re":
            if not cfg.disable_graphics and len(args) == 4:
                x = float_value(args[0])
                y = float_value(args[1])
                w = float_value(args[2])
                h = float_value(args[3])
                p1 = self.transform_position(x, y)
                p2 = self.transform_position(x + w, y + h)
                self.graphics_path.append(PathSegment(p1[0], p1[1], p2[0], p1[1]))
                self.graphics_path.append(PathSegment(p2[0], p1[1], p2[0], p2[1]))
                self.graphics_path.append(PathSegment(p2[0], p2[1], p1[0], p2[1]))
                self.graphics_path.append(PathSegment(p1[0], p2[1], p1[0], p1[1]))
        elif op in ("f", "F", "f*"):
            self._render_path(stroke=False, fill=True)
        elif op == "S":
            self._render_path(stroke=True, fill=False)
        elif op == "s":
            self.graphics_path.append(PathSegment(
                self.path_x, self.path_y, self.path_start_x, self.path_start_y))
            self._render_path(stroke=True, fill=False)
        elif op in ("B", "B*"):
            self._render_path(stroke=True, fill=True)
        elif op in ("b", "b*"):
            self.graphics_path.append(PathSegment(
                self.path_x, self.path_y, self.path_start_x, self.path_start_y))
            self._render_path(stroke=True, fill=True)
        elif op == "n":
            self.graphics_path.clear()
        elif op == "Do":
            self._op_do(args, resources, depth)
        # ---- graphics state (registered operators, PDFBoxTree.java:161-180)
        elif op == "q":
            self.gs_stack.append(gs.copy())
        elif op == "Q":
            if self.gs_stack:
                self.gs = self.gs_stack.pop()
        elif op == "cm":
            if len(args) == 6:
                m = Matrix(*[float_value(a) for a in args])
                self.gs.ctm = m.multiply(self.gs.ctm)
        elif op == "w":
            if args:
                gs.line_width = float_value(args[0])
        elif op == "g":
            if args:
                gs.nonstroke_cs = "DeviceGray"
                gs.nonstroke_comps = (float_value(args[0]),)
        elif op == "G":
            if args:
                gs.stroke_cs = "DeviceGray"
                gs.stroke_comps = (float_value(args[0]),)
        elif op == "rg":
            if len(args) == 3:
                gs.nonstroke_cs = "DeviceRGB"
                gs.nonstroke_comps = tuple(float_value(a) for a in args)
        elif op == "RG":
            if len(args) == 3:
                gs.stroke_cs = "DeviceRGB"
                gs.stroke_comps = tuple(float_value(a) for a in args)
        elif op == "k":
            if len(args) == 4:
                gs.nonstroke_cs = "DeviceCMYK"
                gs.nonstroke_comps = tuple(float_value(a) for a in args)
        elif op == "K":
            if len(args) == 4:
                gs.stroke_cs = "DeviceCMYK"
                gs.stroke_comps = tuple(float_value(a) for a in args)
        elif op == "cs":
            if args:
                gs.nonstroke_cs = self._resolve_cs_name(args[0], resources)
                gs.nonstroke_comps = _initial_color(gs.nonstroke_cs)
        elif op == "CS":
            if args:
                gs.stroke_cs = self._resolve_cs_name(args[0], resources)
                gs.stroke_comps = _initial_color(gs.stroke_cs)
        elif op in ("sc", "scn"):
            gs.nonstroke_comps = tuple(float_value(a) for a in args
                                       if isinstance(a, (int, float)))
        elif op in ("SC", "SCN"):
            gs.stroke_comps = tuple(float_value(a) for a in args
                                    if isinstance(a, (int, float)))
        elif op == "gs":
            self._op_gs(args, resources)
        # ---- text object / positioning ops (PDFTextStripper-registered)
        elif op == "BT":
            self.tm = Matrix()
            self.tlm = Matrix()
        elif op == "ET":
            pass
        elif op == "Tf":
            if len(args) == 2:
                fonts = self.doc.resolve(
                    (self.doc.resolve(resources) or {}).get("Font")) or {}
                fname = args[0]
                font = None
                if isinstance(fonts, dict) and isinstance(fname, Name) and fname in fonts:
                    font = self._get_font(fonts, fname)
                gs.text.font = font
                gs.text.font_size = float_value(args[1])
        elif op == "Td":
            if len(args) == 2:
                self.tlm = Matrix.translate(
                    float_value(args[0]), float_value(args[1])).multiply(self.tlm)
                self.tm = self.tlm.copy()
        elif op == "TD":
            if len(args) == 2:
                gs.text.leading = -float_value(args[1])
                self.tlm = Matrix.translate(
                    float_value(args[0]), float_value(args[1])).multiply(self.tlm)
                self.tm = self.tlm.copy()
        elif op == "Tm":
            if len(args) == 6:
                self.tlm = Matrix(*[float_value(a) for a in args])
                self.tm = self.tlm.copy()
        elif op == "T*":
            self.tlm = Matrix.translate(0, -gs.text.leading).multiply(self.tlm)
            self.tm = self.tlm.copy()
        elif op == "TL":
            if args:
                gs.text.leading = float_value(args[0])
        elif op == "Tz":
            if args:
                gs.text.h_scale = float_value(args[0]) / 100.0
        elif op == "Ts":
            if args:
                gs.text.rise = float_value(args[0])
        elif op == "Tr":
            if args:
                gs.text.rendering_mode = int(float_value(args[0]))
        elif op == "Tj":
            if args and isinstance(args[-1], bytes):
                self._show_text(args[-1])
        elif op == "'":
            self.tlm = Matrix.translate(0, -gs.text.leading).multiply(self.tlm)
            self.tm = self.tlm.copy()
            if args and isinstance(args[-1], bytes):
                self._show_text(args[-1])
        elif op == '"':
            if len(args) == 3 and isinstance(args[2], bytes):
                gs.text.word_spacing = float_value(args[0])
                gs.text.char_spacing = float_value(args[1])
                self.style.set_word_spacing(float_value(args[0]))
                self.style.set_letter_spacing(float_value(args[1]))
                self.tlm = Matrix.translate(0, -gs.text.leading).multiply(self.tlm)
                self.tm = self.tlm.copy()
                self._show_text(args[2])
        elif op == "TJ":
            if args and isinstance(args[-1], list):
                for item in args[-1]:
                    if isinstance(item, bytes):
                        self._show_text(item)
                    elif isinstance(item, (int, float)):
                        tx = (-float_value(item) / 1000.0 * gs.text.font_size
                              * gs.text.h_scale)
                        self.tm = Matrix.translate(tx, 0).multiply(self.tm)

    def _resolve_cs_name(self, name, resources) -> str:
        if name in ("DeviceRGB", "DeviceGray", "DeviceCMYK", "Pattern"):
            return str(name)
        res = self.doc.resolve(resources) or {}
        spaces = self.doc.resolve(res.get("ColorSpace")) or {}
        if isinstance(spaces, dict) and name in spaces:
            cs = self.doc.resolve(spaces[name])
            if isinstance(cs, list) and cs:
                head = str(cs[0])
                if head == "ICCBased":
                    st = self.doc.resolve(cs[1]) if len(cs) > 1 else None
                    n = (self.doc.resolve(st.dict.get("N"))
                         if isinstance(st, Stream) else 3)
                    return {1: "DeviceGray", 4: "DeviceCMYK"}.get(n, "DeviceRGB")
                if head in ("CalRGB", "Lab"):
                    return "DeviceRGB"
                if head == "CalGray":
                    return "DeviceGray"
                return head
            if isinstance(cs, Name):
                return str(cs)
        return str(name)

    def _op_gs(self, args, resources) -> None:
        res = self.doc.resolve(resources) or {}
        egs = self.doc.resolve(res.get("ExtGState")) or {}
        if not (args and isinstance(egs, dict) and args[0] in egs):
            return
        g = self.doc.resolve(egs[args[0]])
        if not isinstance(g, dict):
            return
        if "LW" in g:
            self.gs.line_width = float_value(self.doc.resolve(g["LW"]))
        fnt = self.doc.resolve(g.get("Font"))
        if isinstance(fnt, list) and len(fnt) == 2:
            fd = self.doc.resolve(fnt[0])
            if isinstance(fd, dict):
                try:
                    self.gs.text.font = load_font(self.doc, fd)
                    self.gs.text.font_size = float_value(self.doc.resolve(fnt[1]))
                except PdfParseError:
                    pass

    # -- Do: images and forms (PDFBoxTree.java:535-590) ---------------
    def _op_do(self, args, resources, depth: int) -> None:
        res = self.doc.resolve(resources) or {}
        xobjs = self.doc.resolve(res.get("XObject")) or {}
        if not (args and isinstance(xobjs, dict) and args[0] in xobjs):
            return
        xo = self.doc.resolve(xobjs[args[0]])
        if not isinstance(xo, Stream):
            return
        subtype = xo.dict.get("Subtype")
        if subtype == "Image":
            if not self.config.disable_images:
                self._process_image(xo)
        elif subtype == "Form":
            saved = self.gs.copy()
            self.gs_stack.append(saved)
            mtx = self.doc.resolve(xo.dict.get("Matrix"))
            if isinstance(mtx, list) and len(mtx) == 6:
                self.gs.ctm = Matrix(*[float_value(self.doc.resolve(v))
                                       for v in mtx]).multiply(self.gs.ctm)
            sub_res = xo.dict.get("Resources", resources)
            try:
                self._execute(xo.data(), sub_res, depth + 1)
            except PdfParseError:
                pass
            self.gs = self.gs_stack.pop()

    def _process_image(self, xo: Stream) -> None:
        try:
            fill = _components_to_rgb(self.gs.nonstroke_cs,
                                      self.gs.nonstroke_comps) or (0, 0, 0)
            img = decode_image(self.doc, xo, fill_rgb=fill)
        except UnsupportedImageError:
            img = None
        ctm = self.gs.ctm
        # rotation angle (PDFBoxTree.java:564-575): atan2(shearY, scaleY)
        # minus page rotation; b/c/d in row-vector terms: shearY = c? Java
        # AffineTransform(ctm): getShearY = ctm.b, getScaleY = ctm.d
        rotate = math.atan2(ctm.b, ctm.d) - math.radians(self.page_rotation)
        if img is not None and rotate != 0.0:
            img = rotate_image_90s(img, rotate)
        # position (PDFBoxTree.java:577-590): the reference maps the raster
        # bounds through CTM·scale(1/w,−1/h)·translate(0,−h), which is
        # exactly the CTM image of the unit square — transform its corners
        # and take the bounding box
        pt = self.page_transform()
        corners = []
        for ux, uy in ((0, 0), (1, 0), (0, 1), (1, 1)):
            dx, dy = ctm.transform(ux, uy)
            corners.append(pt.apply(dx, dy))
        xs = [c[0] for c in corners]
        ys = [c[1] for c in corners]
        x, y = min(xs), min(ys)
        w, h = max(xs) - x, max(ys) - y
        self.emitter.render_image(self, f32(x), f32(y), f32(w), f32(h), img)

    def _render_path(self, stroke: bool, fill: bool) -> None:
        path = self.graphics_path
        self.graphics_path = []
        if self.config.disable_graphics:
            return
        self.emitter.render_path(self, path, stroke, fill)

    # -- text showing --------------------------------------------------
    def _show_text(self, raw: bytes) -> None:
        ts = self.gs.text
        font = ts.font
        if font is None:
            return
        fs = ts.font_size
        hs = ts.h_scale
        rise = ts.rise

        # vectorized fast path: every code in the run maps to a single
        # non-combining, non-RTL char (covers ASCII, Latin-1, CJK via
        # ToUnicode) and no diacritic is pending. Bit-identical to the
        # glyph loop below (same float op order; see _show_text_vec).
        # FAST_ASCII is a test hook for equivalence checks.
        if FAST_ASCII and raw and self.last_dia is None:
            if font.is_type0:
                codes = (np.frombuffer(raw[:len(raw) - len(raw) % 2],
                                       dtype=">u2").astype(np.int64)
                         if len(raw) >= 2 else None)
            else:
                codes = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
            if codes is not None and len(codes):
                uni, clean, is_ws, rtl = font.fast_tables()
                if clean[codes].all() and self._show_text_vec(
                        codes, uni[codes], is_ws[codes], rtl[codes],
                        ts, font, fs, hs, rise):
                    return

        params = Matrix(fs * hs, 0, 0, fs, 0, rise)
        llx, lly, urx, ury = self.crop
        crop_w = urx - llx
        crop_h = ury - lly
        rot = self.page_rotation

        # glyph height factor (PDFBox LegacyPDFStreamEngine.showGlyph)
        bbox_h = font.bbox_ury - font.bbox_lly
        glyph_height = bbox_h / 2.0
        cap = font.cap_height
        if cap != 0 and (cap < glyph_height or glyph_height == 0):
            glyph_height = cap

        for code, uni in font.decode(raw):
            trm = params.multiply(self.tm).multiply(self.gs.ctm)
            w0 = font.width(code)
            # pen advance in text space INCLUDES char/word spacing...
            adv = (w0 / 1000.0 * fs + ts.char_spacing
                   + (ts.word_spacing if (code == 32 and not font.is_type0) else 0.0)) * hs

            # display coords per PDFBox TextPosition.getXRot/getY rotation
            # cases (crop-box-relative, y measured from the top)
            tx_dev = trm.e - llx
            ty_dev = trm.f - lly
            if rot == 0:
                gx, gy = tx_dev, crop_h - ty_dev
            elif rot == 90:
                gx, gy = ty_dev, crop_w - tx_dev
            elif rot == 180:
                gx, gy = crop_w - tx_dev, ty_dev
            else:  # 270
                gx, gy = crop_h - ty_dev, tx_dev

            sx = trm.scaling_factor_x()
            sy = trm.scaling_factor_y()
            # ...but TextPosition.width is the glyph displacement ONLY
            # (PDFBox LegacyPDFStreamEngine: dxDisplay from displacement,
            # not from the Tc/Tw-augmented pen advance) — this is what
            # makes letter-spaced text split per glyph in the reference
            disp_w = w0 / 1000.0 * sx
            disp_h = glyph_height / 1000.0 * sy
            tp = TextPosition(gx, gy, disp_w, disp_h, sx, sy, uni, font,
                              fs * self.tm.scaling_factor_x(), code)
            self.process_text_position(tp)
            self.tm = Matrix.translate(adv, 0).multiply(self.tm)

    def _glyph_height_factor(self, font: PdfFont) -> float:
        # PDFBox LegacyPDFStreamEngine.showGlyph height heuristic
        bbox_h = font.bbox_ury - font.bbox_lly
        glyph_height = bbox_h / 2.0
        cap = font.cap_height
        if cap != 0 and (cap < glyph_height or glyph_height == 0):
            glyph_height = cap
        return glyph_height

    def _show_text_vec(self, codes: np.ndarray, uni: np.ndarray,
                       ws_mask: np.ndarray, rtl_mask: np.ndarray,
                       ts, font: PdfFont,
                       fs: float, hs: float, rise: float) -> bool:
        """Vectorized glyph processing for clean single-char runs of
        uniform directionality (LTR or RTL). Returns False when the
        run mixes directions (caller falls back to the glyph loop).

        Replicates the per-glyph loop's float64 operation order exactly:
        the Tm translation recurrence becomes a cumsum seeded with the
        current tm.e/f (identical sequential rounding), and per-glyph
        display coords are computed with the same expression shapes.
        Within one run the style (font, scale, colors, spacing) is
        constant, so the style update + equality check run once and box
        splits reduce to a vectorized distx/disty predicate.
        """
        tm = self.tm
        ctm = self.gs.ctm
        n = len(codes)
        w0 = font.widths[codes]                      # float64 (n,)
        if font.is_type0:
            tw = 0.0  # Tw applies to 1-byte code 32 only (PDF 9.3.3)
        else:
            tw = np.where(codes == 32, float(ts.word_spacing), 0.0)
        adv = (w0 / 1000.0 * fs + float(ts.char_spacing) + tw) * hs

        # tm.e/f sequence BEFORE each glyph's advance (loop-order cumsum)
        ce = np.cumsum(np.concatenate(([tm.e], adv * tm.a)))
        cf = np.cumsum(np.concatenate(([tm.f], adv * tm.b)))
        tme = ce[:-1]
        tmf = cf[:-1]

        # m1 = params·Tm (params = [fs*hs 0; 0 fs; 0 rise])
        m1a = fs * hs * tm.a
        m1b = fs * hs * tm.b
        m1c = fs * tm.c
        m1d = fs * tm.d
        m1e = rise * tm.c + tme
        m1f = rise * tm.d + tmf
        # trm = m1·CTM
        tra = m1a * ctm.a + m1b * ctm.c
        trb = m1a * ctm.b + m1b * ctm.d
        trc = m1c * ctm.a + m1d * ctm.c
        trd = m1c * ctm.b + m1d * ctm.d
        tre = m1e * ctm.a + m1f * ctm.c + ctm.e
        trf = m1e * ctm.b + m1f * ctm.d + ctm.f

        sx = math.sqrt(tra * tra + trb * trb) if trb != 0.0 else tra
        sy = math.sqrt(trc * trc + trd * trd) if trc != 0.0 else trd
        fpt = fs * tm.scaling_factor_x()
        disp_h = f32(self._glyph_height_factor(font) / 1000.0 * sy)

        llx, lly, urx, ury = self.crop
        crop_w = urx - llx
        crop_h = ury - lly
        rot = self.page_rotation
        txd = tre - llx
        tyd = trf - lly
        if rot == 0:
            gx, gy = txd, crop_h - tyd
        elif rot == 90:
            gx, gy = tyd, crop_w - txd
        elif rot == 180:
            gx, gy = crop_w - txd, tyd
        else:
            gx, gy = crop_h - tyd, txd

        kept = ~ws_mask                     # whitespace glyphs are skipped
        if kept.any():
            idx0 = np.flatnonzero(kept)
            krtl = rtl_mask[idx0]
            run_rtl = bool(krtl[0])
            if not (krtl == run_rtl).all():
                return False  # mixed directionality → per-glyph loop
        # advance the text matrix past the whole run (only once committed)
        tm.e = float(ce[-1])
        tm.f = float(cf[-1])
        if not kept.any():
            return True
        idx = idx0
        kcodes = codes[idx]
        kuni = uni[idx]
        xk = gx[idx].astype(np.float32)
        yk = gy[idx].astype(np.float32)
        wk = (w0[idx] / 1000.0 * sx).astype(np.float32)

        sx32 = f32(sx)
        sy32 = f32(sy)
        fpt32 = f32(fpt)

        def make_tp(i: int) -> TextPosition:
            return TextPosition.raw(xk[i], yk[i], wk[i], disp_h, sx32, sy32,
                                    chr(kuni[i]), font, fpt32,
                                    int(kcodes[i]))

        # style once per run (constant: same font/scale/colors throughout)
        first_tp = make_tp(0)
        self.update_style(self.style, first_tp)
        style_changed = not self.style.style_eq(self.curstyle)

        lt = self.last_text
        if lt is None:
            split0 = True
        else:
            distx0 = float(xk[0]) - (float(lt.x) + float(lt.width))
            disty0 = float(yk[0]) - float(lt.y)
            split0 = (distx0 > 1.0 or distx0 < -6.0 or abs(disty0) > 1.0
                      or _is_reversed(lt.unicode) != run_rtl)
        if style_changed:
            split0 = True

        xd = xk.astype(np.float64)
        yd = yk.astype(np.float64)
        wd = wk.astype(np.float64)
        distx = xd[1:] - (xd[:-1] + wd[:-1])
        disty = yd[1:] - yd[:-1]
        internal = (distx > 1.0) | (distx < -6.0) | (np.abs(disty) > 1.0)
        bounds = np.flatnonzero(internal) + 1
        frag_starts = np.concatenate(([0], bounds))
        frag_ends = np.concatenate((bounds, [len(idx)]))

        chars = kuni.astype("<u4").tobytes().decode("utf-32-le")
        for s, e in zip(frag_starts, frag_ends):
            if s == 0 and not split0:
                # continuation of the current box
                if self.text_metrics is None:
                    self.text_metrics = TextMetrics(make_tp(s))
                    if e - s > 1:
                        self.text_metrics.append(make_tp(e - 1))
                else:
                    self.text_metrics.append(make_tp(e - 1))
            else:
                if self.last_text is not None:
                    self.finish_box()
                self.curstyle = self.style.copy()
                self.text_metrics = TextMetrics(make_tp(s))
                if e - s > 1:
                    self.text_metrics.append(make_tp(e - 1))
            self.text_line.append(chars[s:e])
            self.last_text = make_tp(e - 1)
        return True

    # -- box state machine (PDFBoxTree.java:593-679) -------------------
    def process_text_position(self, text: TextPosition) -> None:
        if _is_diacritic(text.unicode):
            self.last_dia = text
            return
        if _java_trim_empty(text.unicode):
            return
        if self.last_dia is not None:
            # merge when the diacritic overlaps this glyph horizontally
            d = self.last_dia
            if d.x < text.x + text.width and d.x + d.width > text.x:
                text.unicode = text.unicode + d.unicode
            self.last_dia = None

        distx = 0.0
        disty = 0.0
        lt = self.last_text
        if lt is not None:
            distx = float(text.x) - (float(lt.x) + float(lt.width))
            disty = float(text.y) - float(lt.y)

        split = (lt is None or distx > 1.0 or distx < -6.0
                 or abs(disty) > 1.0
                 or _is_reversed(text.unicode) != _is_reversed(lt.unicode))
        self.update_style(self.style, text)
        if not self.style.style_eq(self.curstyle):
            split = True

        if split:
            if lt is not None:
                self.finish_box()
            self.curstyle = self.style.copy()
        self.text_line.append(text.unicode)
        if self.text_metrics is None:
            self.text_metrics = TextMetrics(text)
        else:
            self.text_metrics.append(text)
        self.last_text = text

    def finish_box(self) -> None:
        if self.text_line:
            joined = "".join(self.text_line)
            if _is_reversed(joined[0]):
                s = joined[::-1]
            else:
                s = joined
            m = self.text_metrics
            self.curstyle.set_left(m.get_x())
            self.curstyle.set_top(m.get_top())
            self.curstyle.set_line_height(m.get_height())
            self.emitter.render_text(self, s, m)
            self.text_line = []
            self.text_metrics = None
        # note: the reference does NOT reset lastText here
        # (PDFBoxTree.java:661-679) — a page boundary flushes the box but
        # the next page's first glyph still compares against the previous
        # page's last glyph; replicated for bug-compatibility.

    # -- style update (PDFBoxTree.java:706-791) ------------------------
    def _font_style_triple(self, font: PdfFont) -> tuple:
        """(weight, style, family) for a font — cached per document
        (pure function of the font name + font table, PDFBoxTree.java:706-764)."""
        cached = self._style_cache.get(id(font))
        if cached is not None:
            return cached
        font_name = font.name
        lower = font_name.lower()
        weight = None
        fstyle = None
        for i, t in enumerate(PD_FONT_TYPE):
            if lower.rfind(t) >= 0:
                weight = CSS_FONT_WEIGHT[i]
                fstyle = CSS_FONT_STYLE[i]
                break
        weight = weight if weight is not None else CSS_FONT_WEIGHT[0]
        fstyle = fstyle if fstyle is not None else CSS_FONT_STYLE[0]
        family = ""
        for fam in CSS_FONT_FAMILY:
            if lower.rfind(fam.lower().replace(" ", "")) >= 0:
                family = fam
                break
        cacheable = True
        if not family:
            family = self.font_table.get_used_name(font)
            if family is None:
                # raw-name fallback: a later page may still admit this font
                # to the table (reference recomputes per glyph) — don't cache
                family = font_name
                cacheable = False
        triple = (weight, fstyle, family)
        if cacheable:
            self._style_cache[id(font)] = triple
        return triple

    def update_style(self, bstyle: BoxStyle, text: TextPosition) -> None:
        font_name = text.font.name
        bstyle.set_font_size(text.x_scale)
        bstyle.set_line_height(text.height)

        if font_name is not None:
            weight, fstyle, family = self._font_style_triple(text.font)
            bstyle.font_weight = weight
            bstyle.font_style = fstyle
            if family:
                bstyle.font_family = family

        # rendering mode → colors (PDFBoxTree.java:766-791)
        mode = self.gs.text.rendering_mode
        fill_color = self.gs.nonstroke_color_str()
        stroke_color = self.gs.stroke_color_str()
        bstyle.color = fill_color if mode in _FILL_MODES else TRANSPARENT_COLOR
        bstyle.stroke_color = (stroke_color if mode in _STROKE_MODES
                               else TRANSPARENT_COLOR)

    def get_title(self) -> str:
        t = self.doc.title()
        if t is None or t == "":
            return "PDF Document"
        return t


def _initial_color(cs: str) -> tuple:
    if cs == "DeviceRGB":
        return (0.0, 0.0, 0.0)
    if cs == "DeviceCMYK":
        return (0.0, 0.0, 0.0, 1.0)
    return (0.0,)
