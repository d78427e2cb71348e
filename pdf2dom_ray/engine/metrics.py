"""Per-box text metrics accumulator.

Re-expresses the reference's ``TextMetrics``
(`/root/reference/src/main/java/org/fit/pdfdom/TextMetrics.java:10-136`):
per text box, track x (left of first glyph), baseline (y of first
glyph), accumulated width, max height, max ascent, min descent; derive
``top = baseline - ascent`` (falling back to the font bounding box when
the descriptor ascent is 0) and ``height = bottom - top``.

Engine note: the reference accumulates ``width`` with a per-glyph
float32 recurrence ``width += tp.x - (x + width) + tp.width``
(TextMetrics.java:30) which telescopes to ``last.x + last.width -
first.x`` in exact arithmetic. The engine uses the closed form (in
float32) so the box pass can be vectorized with numpy over glyph
arrays; this is deterministic and equal up to float32 rounding of the
Java recurrence.
"""

from __future__ import annotations

import numpy as np

f32 = np.float32

__all__ = ["TextMetrics"]


from functools import lru_cache


import math
from functools import lru_cache


@lru_cache(maxsize=8192)
def _scaled_1000(v: float, font_size: float, _sv: float,
                 _ss: float) -> np.float32:
    """f32((f32(v) / 1000) * font_size) — pure in (v, font_size), so
    memoized: fonts and sizes repeat per document (hot per glyph).
    ``_sv``/``_ss`` carry the zero signs (0.0 and -0.0 hash equal but
    scale to differently-signed zeros)."""
    try:
        return f32(f32(f32(v) / f32(1000)) * f32(font_size))
    except Exception:
        return f32(0)


def _scaled(v, font_size) -> np.float32:
    v = float(v)
    fs = float(font_size)
    return _scaled_1000(v, fs, math.copysign(1.0, v),
                        math.copysign(1.0, fs))


def _ascent(font, font_size) -> np.float32:
    # (descriptor.ascent / 1000) * fontSize — TextMetrics.java:107-115
    try:
        return _scaled(font.ascent, font_size)
    except Exception:
        return f32(0)


def _descent(font, font_size) -> np.float32:
    # TextMetrics.java:117-126
    try:
        return _scaled(font.descent, font_size)
    except Exception:
        return f32(0)


class TextMetrics:
    """Accumulates metrics for one box from its glyphs.

    ``font`` objects must expose ``ascent``, ``descent``, ``bbox_lly``,
    ``bbox_ury`` in 1000-unit glyph space (see engine.fonts).
    """

    __slots__ = ("x", "baseline", "width", "height", "point_size",
                 "descent", "ascent", "font_size", "font", "_last_x",
                 "_last_w")

    def __init__(self, tp):
        self.x = f32(tp.x)
        self.baseline = f32(tp.y)
        self.font = tp.font
        self.width = f32(tp.width)
        self.height = f32(tp.height)
        self.point_size = f32(tp.font_size_pt)
        self.font_size = f32(tp.y_scale)
        self.ascent = self.get_ascent()
        self.descent = self.get_descent()
        self._last_x = f32(tp.x)
        self._last_w = f32(tp.width)

    def append(self, tp) -> None:
        # TextMetrics.java:28-34 (closed-form width, see module docstring)
        self._last_x = f32(tp.x)
        self._last_w = f32(tp.width)
        self.width = f32(f32(self._last_x + self._last_w) - self.x)
        self.height = max(self.height, f32(tp.height))
        self.ascent = max(self.ascent, _ascent(tp.font, tp.y_scale))
        self.descent = min(self.descent, _descent(tp.font, tp.y_scale))

    def get_ascent(self) -> np.float32:
        return _ascent(self.font, self.font_size)

    def get_descent(self) -> np.float32:
        d = _descent(self.font, self.font_size)
        return f32(-d) if d > 0 else d  # positive descent not allowed, TextMetrics.java:67-71

    def get_bounding_box_ascent(self) -> np.float32:
        try:
            return f32(f32(f32(self.font.bbox_ury) / f32(1000)) * self.font_size)
        except Exception:
            return f32(0)

    def get_bounding_box_descent(self) -> np.float32:
        try:
            return f32(f32(f32(self.font.bbox_lly) / f32(1000)) * self.font_size)
        except Exception:
            return f32(0)

    def get_top(self) -> np.float32:
        # TextMetrics.java:41-47
        if self.ascent != 0:
            return f32(self.baseline - self.ascent)
        return f32(self.baseline - self.get_bounding_box_ascent())

    def get_bottom(self) -> np.float32:
        # TextMetrics.java:49-55
        if self.descent != 0:
            return f32(self.baseline - self.descent)
        return f32(self.baseline - self.get_bounding_box_descent())

    def get_height(self) -> np.float32:
        return f32(self.get_bottom() - self.get_top())

    def get_width(self) -> np.float32:
        return self.width

    def get_x(self) -> np.float32:
        return self.x
