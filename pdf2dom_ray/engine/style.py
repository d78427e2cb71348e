"""Text-box style value object.

Re-expresses the reference's ``BoxStyle`` (`/root/reference/src/main/java/org/fit/pdfdom/BoxStyle.java:26-150`):
a mutable bag of font / color / position properties whose ``toString``
produces an inline CSS declaration with a **fixed property order** and
default-suppression rules, and whose equality compares only the
style-identity fields (color, strokeColor, fontFamily, fontSize,
fontStyle, fontWeight, letterSpacing, wordSpacing — ``BoxStyle.java:347-405``;
top/left/lineHeight are *not* part of equality, which is what makes the
box-split predicate work).

All lengths are Java ``float`` (float32) and are formatted with
``Float.toString`` semantics (``BoxStyle.java:132-136``).
"""

from __future__ import annotations

import struct as _struct

import numpy as np

from .javafloat import jfloat_str

_PACK_f = _struct.Struct("<f")
_UNPACK_i = _struct.Struct("<i")

DEFAULT_COLOR = "#000000"            # BoxStyle.java:28
DEFAULT_FONT_WEIGHT = "normal"       # BoxStyle.java:29
DEFAULT_FONT_STYLE = "normal"        # BoxStyle.java:30
DEFAULT_POSITION = "absolute"        # BoxStyle.java:31
TRANSPARENT_COLOR = "rgba(0,0,0,0)"  # BoxStyle.java:32

_F32_ZERO = np.float32(0)

# text-shadow fallback template, BoxStyle.java:138-150
_TEXT_STROKE_CSS = (
    "-webkit-text-stroke: {c} 1px ;"
    "text-shadow:"
    "-1px -1px 0 {c}, "
    "1px -1px 0 {c},"
    "-1px 1px 0 {c}, "
    "1px 1px 0 {c};"
)

__all__ = ["BoxStyle", "DEFAULT_COLOR", "TRANSPARENT_COLOR"]


class BoxStyle:
    __slots__ = (
        "units", "font_family", "font_size", "font_weight", "font_style",
        "line_height", "word_spacing", "letter_spacing", "color",
        "stroke_color", "position", "left", "top", "_tail",
    )

    def __init__(self, units: str = "pt"):
        self.units = units
        self.font_family: str | None = None
        self.font_size = _F32_ZERO
        self.font_weight: str | None = None
        self.font_style: str | None = None
        self.line_height = _F32_ZERO
        self.word_spacing = _F32_ZERO
        self.letter_spacing = _F32_ZERO
        self.color: str | None = None
        self.stroke_color: str | None = None
        self.position: str | None = None
        self.left = _F32_ZERO
        self.top = _F32_ZERO
        self._tail = None  # memoized css_tail for frozen copies

    def copy(self) -> "BoxStyle":
        # BoxStyle copy constructor, BoxStyle.java:71-86
        c = BoxStyle(self.units)
        for k in self.__slots__:
            setattr(c, k, getattr(self, k))
        c._tail = None
        return c

    # -- setters coerce to float32 like Java float fields --------------
    def set_font_size(self, v) -> None:
        self.font_size = np.float32(v)

    def set_line_height(self, v) -> None:
        self.line_height = np.float32(v)

    def set_word_spacing(self, v) -> None:
        self.word_spacing = np.float32(v)

    def set_letter_spacing(self, v) -> None:
        self.letter_spacing = np.float32(v)

    def set_left(self, v) -> None:
        self.left = np.float32(v)

    def set_top(self, v) -> None:
        self.top = np.float32(v)

    def format_length(self, length) -> str:
        """``formatLength``: Java Float.toString + units (BoxStyle.java:132-136)."""
        return jfloat_str(length) + self.units

    def tail_key(self) -> tuple:
        """Identity of the non-positional CSS properties (everything after
        line-height in the fixed order) — used by emitters to cache the
        formatted tail across boxes sharing a style."""
        return (self.font_family, self._fbits(self.font_size),
                self.font_weight, self.font_style,
                self._fbits(self.word_spacing), self._fbits(self.letter_spacing),
                self.color, self.stroke_color)

    def css_head(self) -> str:
        """position/top/left/line-height prefix (per-box values)."""
        out: list[str] = []
        if self.position is not None and self.position != DEFAULT_POSITION:
            out.append(f"position:{self.position};")
        out.append(f"top:{self.format_length(self.top)};")
        out.append(f"left:{self.format_length(self.left)};")
        out.append(f"line-height:{self.format_length(self.line_height)};")
        return "".join(out)

    def css_tail(self) -> str:
        """font/spacing/color suffix (style-identity values)."""
        out: list[str] = []
        if self.font_family is not None:
            out.append(f"font-family:{self.font_family};")
        if self.font_size != 0:
            out.append(f"font-size:{self.format_length(self.font_size)};")
        if self.font_weight is not None and self.font_weight != DEFAULT_FONT_WEIGHT:
            out.append(f"font-weight:{self.font_weight};")
        if self.font_style is not None and self.font_style != DEFAULT_FONT_STYLE:
            out.append(f"font-style:{self.font_style};")
        if self.word_spacing != 0:
            out.append(f"word-spacing:{self.format_length(self.word_spacing)};")
        if self.letter_spacing != 0:
            out.append(f"letter-spacing:{self.format_length(self.letter_spacing)};")
        if self.color is not None and self.color != DEFAULT_COLOR:
            out.append(f"color:{self.color};")
        if self.stroke_color is not None and self.stroke_color != TRANSPARENT_COLOR:
            out.append(_TEXT_STROKE_CSS.format(c=self.stroke_color))
        return "".join(out)

    def to_css(self) -> str:
        """``BoxStyle.toString`` property order and suppression (BoxStyle.java:88-114)."""
        return self.css_head() + self.css_tail()

    # equality over style-identity fields only (BoxStyle.java:366-405);
    # Java compares floats via floatToIntBits, i.e. bit equality (NaN==NaN,
    # 0.0 != -0.0) — replicated with float32 byte views.
    @staticmethod
    def _fbits(v) -> int:
        # struct round-trip: ~4x faster than numpy scalar + .view;
        # pack raises on float32 overflow where the cast gives ±inf
        try:
            return _UNPACK_i.unpack(_PACK_f.pack(v))[0]
        except OverflowError:
            return 0x7F800000 if v > 0 else -8388608  # ±inf bits

    def style_eq(self, other: "BoxStyle | None") -> bool:
        if other is None:
            return False
        return (
            self.color == other.color
            and self.stroke_color == other.stroke_color
            and self.font_family == other.font_family
            and self._fbits(self.font_size) == self._fbits(other.font_size)
            and self.font_style == other.font_style
            and self.font_weight == other.font_weight
            and self._fbits(self.letter_spacing) == self._fbits(other.letter_spacing)
            and self._fbits(self.word_spacing) == self._fbits(other.word_spacing)
        )
