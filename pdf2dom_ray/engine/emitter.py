"""DOM + spans emitter — the renderer half of the reference's
``PDFDomTree`` (`/root/reference/src/main/java/org/fit/pdfdom/PDFDomTree.java`).

Builds the XHTML document shell (PDFDomTree.java:118-143), page divs
(266-297), text divs (303-325), rectangle/line divs (337-397), path
images (399-409), image elements (421-441) and the global style with
``@font-face`` blocks (447-492). Simultaneously collects the engine's
side outputs: ``extracted_text`` (box texts joined with ``" "`` within
a line and ``"\\n"`` across lines/pages — an engine-defined contract,
the reference has no text sink) and the ``spans`` rows with character
offsets into ``extracted_text``.

The user-extension surface of the reference (subclass with
startNewPage/renderText/renderPath/renderImage —
``PDFBoxTree.java:296-323``) maps to this class's methods: provide any
object with the same five methods to the Walker for custom rendering.
"""

from __future__ import annotations

import base64

import numpy as np

from ..config import EMBED_BASE64, IGNORE, SAVE_TO_DIR, PdfDomConfig
from .dom import (Document, Element, EntityRef, RawInline, TextNode,
                  escape_attr, escape_text, serialize)
from .javafloat import jfloat_str, jdouble_str
from .path import HtmlDivLine, to_rectangle
from .pathdrawer import draw_path
from .png import encode_png

f32 = np.float32

UNIT = "pt"

# default stylesheet (PDFDomTree.java:56-62)
DEFAULT_STYLE = (
    ".page{position:relative; border:1px solid blue;margin:0.5em}\n"
    ".p,.r{position:absolute;}\n"
    ".p{white-space:nowrap;}\n"
    "@supports(-webkit-text-stroke: 1px black) {"
    ".p{text-shadow:none !important;}"
    "}"
)

__all__ = ["DomEmitter", "SpanRecord"]


class SpanRecord(dict):
    """One row of the spans list<struct> column (SURVEY.md §1.3)."""


class DomEmitter:
    def __init__(self, config: PdfDomConfig):
        self.config = config
        self.doc: Document | None = None
        self.head = self.body = self.title_el = self.global_style = None
        self.curpage: Element | None = None
        self.textcnt = 0
        self.pagecnt = 0
        # side outputs
        self.text_parts: list[str] = []
        self.spans: list[SpanRecord] = []
        self.resources: list[dict] = []   # save-to-dir style resource rows
        self._char_pos = 0
        self._prev_top: float | None = None
        self._prev_page = -1
        self._saved_names: list[str] = []
        self._css_tail_cache: dict[tuple, str] = {}
        self.n_images = 0  # raster images placed via Do (not path rasters)

    # -- document shell (PDFDomTree.java:118-174) ----------------------
    def start_document(self, pdf) -> None:
        d = Document()
        self.doc = d
        self.head = d.root.append(Element("head"))
        meta = self.head.append(Element("meta"))
        meta.set("http-equiv", "content-type")
        meta.set("content", "text/html;charset=utf-8")
        self.title_el = self.head.append(Element("title"))
        self.title_el.set_text("PDF Document")
        self.global_style = self.head.append(Element("style"))
        self.global_style.set("type", "text/css")
        self.body = d.root.append(Element("body"))

    def end_document(self, pdf, walker) -> None:
        doctitle = pdf.title()
        if doctitle is not None and doctitle.strip():
            self.title_el.set_text(doctitle)
        self.global_style.set_text(self._create_global_style(walker))

    def _create_global_style(self, walker) -> str:
        return self._create_font_faces(walker) + "\n" + DEFAULT_STYLE

    def _create_font_faces(self, walker) -> str:
        # PDFDomTree.java:464-492
        out = []
        for entry in walker.font_table.entries:
            # resource NAME is the raw font name (HtmlResource ctor gets
            # fontName — FontTable.java:131-135; the save-to-dir file is
            # e.g. "EKCFJL+Omsym2.woff", TestFonts.java:76), while the
            # @font-face family uses the deduped usedName
            src = self._handle_resource(entry.get_data(), entry.get_mime_type(),
                                        entry.font_name, entry.get_file_ending(),
                                        self.config.font_handler)
            if src is not None and src.strip():
                out.append('@font-face {font-family:"' + entry.used_name
                           + "\";src:url('" + src + "');}\n")
        return "".join(out)

    # -- resource handlers (resource/*.java) ---------------------------
    def _handle_resource(self, data: bytes | None, mime: str, name: str,
                         ending: str | None, handler: str) -> str | None:
        if handler == IGNORE:
            return ""  # IgnoreResourceHandler.java:22-28
        if handler == EMBED_BASE64:
            # EmbedAsBase64Handler.java:24-32
            b64 = base64.b64encode(data).decode("ascii") if data else ""
            return f"data:{mime};base64,{b64}"
        if handler == SAVE_TO_DIR:
            # SaveResourceToDirHandler.java:44-71 — the engine emits a
            # resource ROW instead of writing a file (the Ray sink owns IO)
            used = name
            i = 1
            while used in self._saved_names:
                used = f"{name}{i}"
                i += 1
            self._saved_names.append(used)
            path = f"resources/{used}.{ending or 'bin'}"
            self.resources.append({"name": used, "path": path, "mime": mime,
                                   "data": data or b""})
            return path
        return ""

    # -- page (PDFDomTree.java:221-226, 266-297) -----------------------
    def start_new_page(self, walker) -> None:
        llx, lly, urx, ury = walker.crop
        w = f32(urx - llx)
        h = f32(ury - lly)
        if walker.page_rotation in (90, 270):
            w, h = h, w
        pstyle = (f"width:{jfloat_str(w)}{UNIT};height:{jfloat_str(h)}{UNIT};"
                  "overflow:hidden;")
        el = Element("div")
        el.set("id", f"page_{self.pagecnt}")
        self.pagecnt += 1
        el.set("class", "page")
        el.set("style", pstyle)
        self.curpage = self.body.append(el)

    # -- text boxes (PDFDomTree.java:228-232, 303-325) -----------------
    def render_text(self, walker, data: str, metrics) -> None:
        box_id = f"p{self.textcnt}"
        self.textcnt += 1
        style = walker.curstyle
        # cache the rendered CSS tail per frozen curstyle instance (the
        # split copies never mutate tail fields), with a per-document
        # fallback dict keyed on style identity
        tail = style._tail
        if tail is None:
            tk = style.tail_key()
            tail = self._css_tail_cache.get(tk)
            if tail is None:
                tail = style.css_tail()
                self._css_tail_cache[tk] = tail
            style._tail = tail
        css = (style.css_head() + tail
               + f"width:{jfloat_str(metrics.get_width())}{UNIT};")
        # pre-rendered leaf (hot path): byte-identical to the Element form
        self.curpage.append(RawInline(
            f'<div id="{box_id}" class="p" style="{escape_attr(css)}">'
            f"{escape_text(data)}</div>", data))

        # side outputs: extracted_text joining rule + span offsets
        page_idx = self.pagecnt - 1
        top = float(style.top)
        if self.text_parts:
            if page_idx != self._prev_page or self._prev_top is None \
                    or abs(top - self._prev_top) > 0.5:
                sep = "\n"
            else:
                sep = " "
            self.text_parts.append(sep)
            self._char_pos += len(sep)
        start = self._char_pos
        self.text_parts.append(data)
        self._char_pos += len(data)
        self._prev_top = top
        self._prev_page = page_idx
        if self.config.emit_spans:
            self.spans.append(SpanRecord(
                page=page_idx,
                id=f"p{self.textcnt - 1}",
                text=data,
                left=float(style.left),
                top=top,
                width=float(metrics.get_width()),
                line_height=float(style.line_height),
                font_family=style.font_family,
                font_size=float(style.font_size),
                font_weight=style.font_weight or "normal",
                font_style=style.font_style or "normal",
                word_spacing=float(style.word_spacing),
                letter_spacing=float(style.letter_spacing),
                color=style.color,
                stroke_color=style.stroke_color,
                char_start=start,
                char_end=self._char_pos,
            ))

    # -- paths (PDFDomTree.java:234-252, 337-409) ----------------------
    def render_path(self, walker, path, stroke: bool, fill: bool) -> None:
        rect = to_rectangle(path)
        if rect is not None:
            self.curpage.append(self._create_rectangle(
                walker, rect[0], rect[1], f32(rect[2] - rect[0]),
                f32(rect[3] - rect[1]), stroke, fill))
        elif stroke:
            for seg in path:
                self.curpage.append(self._create_line(
                    walker, seg.x1, seg.y1, seg.x2, seg.y2))
        else:
            el = self._create_path_image(walker, path)
            if el is not None:
                self.curpage.append(el)

    def _create_rectangle(self, walker, x, y, width, height,
                          stroke: bool, fill: bool) -> Element:
        # PDFDomTree.java:337-368
        line_width = f32(walker.transform_width(walker.gs.line_width))
        wcor = line_width if stroke else f32(0)
        stroke_offset = f32(0) if wcor == 0 else f32(wcor / 2)
        width = f32(1) if width - wcor < 0 else f32(width - wcor)
        height = f32(1) if height - wcor < 0 else f32(height - wcor)

        fl = walker.curstyle.format_length
        p = [f"left:{fl(f32(x - stroke_offset))};",
             f"top:{fl(f32(y - stroke_offset))};",
             f"width:{fl(width)};",
             f"height:{fl(height)};"]
        if stroke:
            color = walker.gs.stroke_color_str()
            p.append(f"border:{fl(line_width)} solid {color};")
        if fill:
            fcolor = walker.gs.nonstroke_color_str()
            p.append(f"background-color:{fcolor};")
        return RawInline(
            f'<div class="r" style="{escape_attr("".join(p))}">&nbsp;</div>',
            " ")

    def _create_line(self, walker, x1, y1, x2, y2) -> Element:
        # PDFDomTree.java:378-397
        line = HtmlDivLine(x1, y1, x2, y2,
                           f32(walker.transform_width(walker.gs.line_width)))
        color = walker.gs.stroke_color_str()
        fl = walker.curstyle.format_length
        p = [f"left:{fl(line.get_left())};",
             f"top:{fl(line.get_top())};",
             f"width:{fl(line.get_width())};",
             f"height:{fl(line.get_height())};",
             f"{line.get_border_side()}:{fl(line.get_line_stroke_width())}"
             f" solid {color};"]
        angle = line.get_angle_degrees()
        if angle != 0:
            p.append(f"transform:rotate({jdouble_str(angle)}deg);")
        return RawInline(
            f'<div class="r" style="{escape_attr("".join(p))}">&nbsp;</div>',
            " ")

    def _create_path_image(self, walker, path) -> Element | None:
        # PDFDomTree.java:399-409 + PathDrawer
        pimg = draw_path(path, walker.gs.nonstroke_rgb255())
        if pimg is None:
            return None
        return self._create_image_element(
            walker, f32(pimg.x), f32(pimg.y), f32(pimg.width),
            f32(pimg.height), pimg.rgba, name="PathImage")

    # -- images (PDFDomTree.java:254-258, 421-441) ---------------------
    def render_image(self, walker, x, y, width, height, img) -> None:
        self.n_images += 1
        self.curpage.append(self._create_image_element(
            walker, x, y, width, height, img, name=walker.get_title()))

    def _create_image_element(self, walker, x, y, width, height, img,
                              name: str) -> Element:
        p = ("position:absolute;"
             f"left:{jfloat_str(x)}{UNIT};"
             f"top:{jfloat_str(y)}{UNIT};"
             f"width:{jfloat_str(width)}{UNIT};"
             f"height:{jfloat_str(height)}{UNIT};")
        if img is not None and not self.config.disable_image_data:
            png = encode_png(img)
            src = self._handle_resource(png, "image/png", name, "png",
                                        self.config.image_handler)
            src = src if src else ""
        else:
            src = ""
        return RawInline(
            f'<img style="{escape_attr(p)}" src="{escape_attr(src)}"/>')

    # -- final outputs -------------------------------------------------
    def html(self) -> str:
        return serialize(self.doc)

    def extracted_text(self) -> str:
        return "".join(self.text_parts)
