"""Vector-graphics primitives: path segments, rectangle classifier,
HTML div-line mapping.

Re-expresses ``PathSegment``
(`/root/reference/src/main/java/org/fit/pdfdom/PathSegment.java:26-78`),
the 4-segment rectangle classifier (`PDFBoxTree.java:325-348`) and
``HtmlDivLine`` (`HtmlDivLine.java:11-99`). All arithmetic is Java
``float`` (float32) except the rotation angle, which Java computes as
``Math.toDegrees(Math.atan(float_ratio))`` in double
(`HtmlDivLine.java:69-75`).
"""

from __future__ import annotations

import math

import numpy as np

f32 = np.float32

__all__ = ["PathSegment", "to_rectangle", "HtmlDivLine"]


class PathSegment:
    __slots__ = ("x1", "y1", "x2", "y2")

    def __init__(self, x1, y1, x2, y2):
        self.x1 = f32(x1)
        self.y1 = f32(y1)
        self.x2 = f32(x2)
        self.y2 = f32(y2)


def to_rectangle(path: list[PathSegment]) -> list | None:
    """4 segments with exactly 2 distinct x and 2 distinct y
    → [minx, miny, maxx, maxy] else None (PDFBoxTree.java:325-348)."""
    if len(path) != 4:
        return None
    xc = set()
    yc = set()
    for s in path:
        xc.add(float(s.x1))
        xc.add(float(s.x2))
        yc.add(float(s.y1))
        yc.add(float(s.y2))
    if len(xc) == 2 and len(yc) == 2:
        return [f32(min(xc)), f32(min(yc)), f32(max(xc)), f32(max(yc))]
    return None


class HtmlDivLine:
    """Maps a line segment to a border-styled div (HtmlDivLine.java:24-98)."""

    def __init__(self, x1, y1, x2, y2, line_width):
        self.x1 = f32(x1)
        self.y1 = f32(y1)
        self.x2 = f32(x2)
        self.y2 = f32(y2)
        self.line_width = f32(line_width)
        self.width = f32(abs(self.x2 - self.x1))
        self.height = f32(abs(self.y2 - self.y1))
        self.horizontal = bool(self.height < 0.5)
        self.vertical = bool(self.width < 0.5)

    def get_height(self) -> np.float32:
        return self.height if self.vertical else f32(0)

    def get_width(self) -> np.float32:
        if self.vertical:
            return f32(0)
        if self.horizontal:
            return self.width
        return f32(math.sqrt(float(
            f32(f32(self.x1 - self.x2) * f32(self.x1 - self.x2))
            + f32(f32(self.y1 - self.y2) * f32(self.y1 - self.y2)))))

    def get_left(self) -> np.float32:
        if self.horizontal or self.vertical:
            return min(self.x1, self.x2)
        return f32(abs(f32(f32(self.x2 + self.x1) / f32(2))) - f32(self.get_width() / f32(2)))

    def get_top(self) -> np.float32:
        if self.horizontal or self.vertical:
            return min(self.y1, self.y2)
        return f32(abs(f32(f32(self.y2 + self.y1) / f32(2)))
                   - f32(f32(self.get_line_stroke_width() + self.get_height()) / f32(2)))

    def get_angle_degrees(self) -> float:
        """double result (feeds Double.toString — PDFDomTree.java:390)."""
        if self.horizontal or self.vertical:
            return 0.0
        ratio = f32(self.y2 - self.y1) / f32(self.x2 - self.x1)  # float32 division
        return math.degrees(math.atan(float(ratio)))

    def get_line_stroke_width(self) -> np.float32:
        lw = self.line_width
        return f32(0.5) if lw < 0.5 else lw

    def get_border_side(self) -> str:
        return "border-right" if self.vertical else "border-bottom"
