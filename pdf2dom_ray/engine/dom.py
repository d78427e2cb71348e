"""Minimal DOM + deterministic pretty-print serializer.

The reference builds a W3C DOM (XHTML 1.1 doctype, html/head/body —
`/root/reference/src/main/java/org/fit/pdfdom/PDFDomTree.java:118-143`)
and serializes it with Xerces' ``LSSerializer`` with
``format-pretty-print`` (`PDFDomTree.java:180-202`). No JVM exists in
this engine, so the serializer below *defines* the engine's canonical
byte layout, mirroring LSSerializer's documented pretty-print rules:

* ``<?xml version="1.0" encoding="UTF-8"?>`` declaration line,
* doctype line,
* one element per line, children indented 4 spaces per depth,
* an element whose children are only text / entity references is
  rendered inline on one line,
* childless elements self-close (``<img .../>``),
* attributes in insertion order; text escapes ``& < >``, attributes
  additionally ``"``,
* entity references are preserved (``&nbsp;`` — `PDFDomTree.java:366`).

The output is byte-deterministic per document, which is the invariant
the north rule requires (byte-identical ``html_dom`` per url).
"""

from __future__ import annotations

__all__ = ["Element", "TextNode", "EntityRef", "Document", "serialize"]

_INDENT = "    "


def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;").replace('"', "&quot;"))


class TextNode:
    __slots__ = ("data",)

    def __init__(self, data: str):
        self.data = data


class RawInline:
    """A pre-rendered leaf element (one line of markup, already escaped).

    Emitters use this for the hot leaf nodes (text boxes, rects, lines,
    images) to skip per-node Element construction; the serializer emits
    ``indent + markup`` exactly as the equivalent Element would have
    produced. ``text`` carries the logical text content for the
    ``text_content`` helper."""

    __slots__ = ("markup", "text")

    def __init__(self, markup: str, text: str = ""):
        self.markup = markup
        self.text = text


class EntityRef:
    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name


class Element:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None):
        self.tag = tag
        self.attrs: dict[str, str] = dict(attrs) if attrs else {}
        self.children: list = []

    def set(self, name: str, value: str) -> None:
        self.attrs[name] = value

    def append(self, child) -> "Element":
        self.children.append(child)
        return child

    def set_text(self, data: str) -> None:
        self.children = [TextNode(data)]

    # -- convenience used by tests -------------------------------------
    def iter(self, tag: str | None = None):
        if tag is None or self.tag == tag:
            yield self
        for c in self.children:
            if isinstance(c, Element):
                yield from c.iter(tag)

    def text_content(self) -> str:
        out = []
        for c in self.children:
            if isinstance(c, TextNode):
                out.append(c.data)
            elif isinstance(c, EntityRef):
                out.append(" " if c.name == "nbsp" else f"&{c.name};")
            elif isinstance(c, RawInline):
                out.append(c.text)
            elif isinstance(c, Element):
                out.append(c.text_content())
        return "".join(out)


class Document:
    """XHTML 1.1 document shell (PDFDomTree.java:118-143)."""

    def __init__(self):
        self.root = Element("html", {"xmlns": "http://www.w3.org/1999/xhtml"})
        self.doctype = ('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.1//EN" '
                        '"http://www.w3.org/TR/xhtml11/DTD/xhtml11.dtd">')


def _inline_only(el: Element) -> bool:
    return all(isinstance(c, (TextNode, EntityRef)) for c in el.children)


def escape_text(s: str) -> str:
    """Public text escaper for RawInline builders."""
    return _esc_text(s)


def escape_attr(s: str) -> str:
    """Public attribute escaper for RawInline builders."""
    return _esc_attr(s)


def _render_inline_children(el: Element) -> str:
    parts = []
    for c in el.children:
        if isinstance(c, TextNode):
            parts.append(_esc_text(c.data))
        else:
            parts.append(f"&{c.name};")
    return "".join(parts)


def _open_tag(el: Element) -> str:
    attrs = "".join(f' {k}="{_esc_attr(v)}"' for k, v in el.attrs.items())
    return f"<{el.tag}{attrs}"


def _serialize_el(el: Element, depth: int, out: list[str]) -> None:
    pad = _INDENT * depth
    if not el.children:
        out.append(f"{pad}{_open_tag(el)}/>")
        return
    if _inline_only(el):
        out.append(f"{pad}{_open_tag(el)}>{_render_inline_children(el)}</{el.tag}>")
        return
    out.append(f"{pad}{_open_tag(el)}>")
    child_pad = _INDENT * (depth + 1)
    for c in el.children:
        if isinstance(c, RawInline):
            out.append(child_pad + c.markup)
        elif isinstance(c, Element):
            _serialize_el(c, depth + 1, out)
        elif isinstance(c, TextNode):
            out.append(f"{child_pad}{_esc_text(c.data)}")
        else:
            out.append(f"{child_pad}&{c.name};")
    out.append(f"{pad}</{el.tag}>")


def serialize(doc: Document) -> str:
    out = ['<?xml version="1.0" encoding="UTF-8"?>', doc.doctype]
    _serialize_el(doc.root, 0, out)
    return "\n".join(out) + "\n"
