"""Rasterizer for filled non-rectangular paths.

Re-expresses ``PathDrawer``
(`/root/reference/src/main/java/org/fit/pdfdom/PathDrawer.java:43-136`):
integer-truncated path bounds, an ARGB raster of exactly the bounds
size, the polygon filled from each segment's (x1, y1) vertex with the
current non-stroking color, and the crop offsets (bounds x/y) kept for
CSS placement. Degenerate bounds (curved paths dropped by the operator
layer) collapse to a 1×1 image exactly like the reference
(`PathDrawer.java:49-53``).

The polygon fill is an even-odd scanline fill at pixel centers —
equivalent to Java ``Graphics2D.fillPolygon``'s even-odd insideness
rule (crossing counts at y+0.5 scanlines).
"""

from __future__ import annotations

import numpy as np

from .path import PathSegment

__all__ = ["PathImage", "draw_path"]


class PathImage:
    """Rendered path raster + crop offsets (ImageResource with x/y)."""

    __slots__ = ("rgba", "x", "y")

    def __init__(self, rgba: np.ndarray, x: float, y: float):
        self.rgba = rgba
        self.x = x
        self.y = y

    @property
    def width(self) -> int:
        return self.rgba.shape[1]

    @property
    def height(self) -> int:
        return self.rgba.shape[0]


def _path_bounds(path: list[PathSegment]) -> tuple[int, int, int, int]:
    # int-truncated min/max over both endpoints (PathDrawer.java:109-131)
    xs = [int(s.x1) for s in path] + [int(s.x2) for s in path]
    ys = [int(s.y1) for s in path] + [int(s.y2) for s in path]
    return min(xs), min(ys), max(xs) - min(xs), max(ys) - min(ys)


def _fill_polygon(h: int, w: int, xs: np.ndarray, ys: np.ndarray,
                  color: tuple[int, int, int]) -> np.ndarray:
    """Even-odd scanline polygon fill into an RGBA raster."""
    img = np.zeros((h, w, 4), dtype=np.uint8)
    n = len(xs)
    if n < 3:
        return img
    x1 = xs.astype(np.float64)
    y1 = ys.astype(np.float64)
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    rows = np.arange(h, dtype=np.float64) + 0.5
    # for each edge and scanline: does the edge cross the scanline?
    ymin = np.minimum(y1, y2)[:, None]
    ymax = np.maximum(y1, y2)[:, None]
    crosses = (rows[None, :] >= ymin) & (rows[None, :] < ymax)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (rows[None, :] - y1[:, None]) / (y2 - y1)[:, None]
        xcross = x1[:, None] + t * (x2 - x1)[:, None]
    cols = np.arange(w, dtype=np.float64) + 0.5
    for yi in range(h):
        edge_x = np.sort(xcross[:, yi][crosses[:, yi]])
        if edge_x.size < 2:
            continue
        # even-odd: pixels between pairs of crossings are inside
        inside = np.zeros(w, dtype=bool)
        for i in range(0, edge_x.size - 1, 2):
            inside |= (cols >= edge_x[i]) & (cols < edge_x[i + 1])
        img[yi, inside, 0] = color[0]
        img[yi, inside, 1] = color[1]
        img[yi, inside, 2] = color[2]
        img[yi, inside, 3] = 255
    return img


def draw_path(path: list[PathSegment], fill_rgb: tuple[int, int, int]) -> PathImage:
    """Rasterize a filled polygon path (PathDrawer.drawPath)."""
    if not path:
        return PathImage(np.zeros((1, 1, 4), dtype=np.uint8), 0.0, 0.0)
    x, y, w, h = _path_bounds(path)
    if w <= 0 or h <= 0:
        w = h = 1  # curved/degenerate paths degrade to 1×1 (PathDrawer.java:49-53)
    xs = np.array([int(s.x1) - x for s in path], dtype=np.int64)
    ys = np.array([int(s.y1) - y for s in path], dtype=np.int64)
    rgba = _fill_polygon(h, w, xs, ys, fill_rgb)
    return PathImage(rgba, float(x), float(y))
