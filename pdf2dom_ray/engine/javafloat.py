"""Java ``Float.toString`` / ``Double.toString`` emulation.

The reference engine serializes every CSS length through Java's
float-to-string conversion (``BoxStyle.java:132-136`` ``formatLength``:
``(float) length + units``; page/image builders concatenate floats
directly, ``PDFDomTree.java:286,424-427``; the oblique-line rotation
angle goes through ``Double.toString``, ``PDFDomTree.java:390`` +
``HtmlDivLine.java:69-75``). Byte-identical output therefore requires
reproducing Java's published conversion rules (JLS / java.lang.Float):

* shortest decimal that uniquely round-trips the binary value,
* plain decimal notation when ``1e-3 <= |v| < 1e7``, always with at
  least one digit after the point (``5`` -> ``"5.0"``),
* otherwise scientific ``d.dddEn`` with mantissa in [1,10) and a bare
  exponent (no ``+``, no leading zeros),
* ``0.0`` / ``-0.0`` keep the sign; NaN -> ``"NaN"``; infinities ->
  ``"Infinity"`` / ``"-Infinity"``.

numpy's dragon4 implementation provides the shortest-round-trip digit
generation for both float32 and float64.
"""

from __future__ import annotations

import math
import struct as _struct
from functools import lru_cache

import numpy as np

__all__ = ["jfloat_str", "jdouble_str", "f32"]


def f32(x) -> np.float32:
    """Cast to IEEE float32 (Java ``float`` semantics)."""
    return np.float32(x)


def _java_format(v: float, dtype) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    tv = dtype(v)
    if tv == 0:
        # preserve the sign of zero like Java does
        return "-0.0" if math.copysign(1.0, float(tv)) < 0 else "0.0"
    a = abs(float(tv))
    if 1e-3 <= a < 1e7:
        # plain decimal, shortest unique digits, >=1 fractional digit
        s = np.format_float_positional(tv, unique=True, trim="0")
        if s.endswith("."):  # numpy never does this with trim="0", be safe
            s += "0"
        return s
    # scientific: numpy gives e.g. '1.e+07' / '1.2345e-05' with trim variants
    s = np.format_float_scientific(tv, unique=True, trim="0")
    mant, exp = s.split("e")
    if "." not in mant:
        mant += ".0"
    expi = int(exp)
    return f"{mant}E{expi}"


_PACK_F = _struct.Struct("<f")
_UNPACK_I = _struct.Struct("<I")


@lru_cache(maxsize=1 << 16)
def _jfloat_cached(bits: int) -> str:
    # keyed on raw float32 bits: -0.0 and 0.0 hash equal as floats but
    # must format differently
    return _java_format(_PACK_F.unpack(_UNPACK_I.pack(bits))[0],
                        np.float32)


def jfloat_str(v) -> str:
    """Java ``Float.toString(float)`` (memoized — CSS lengths repeat).

    struct round-trips the double→float32 conversion ~4x faster than
    a numpy scalar + .view (hot: every CSS length in every box);
    pack raises on float32 overflow where the cast gives ±inf."""
    try:
        bits = _UNPACK_I.unpack(_PACK_F.pack(v))[0]
    except OverflowError:
        bits = 0x7F800000 if v > 0 else 0xFF800000
    return _jfloat_cached(bits)


def jdouble_str(v) -> str:
    """Java ``Double.toString(double)``."""
    return _java_format(float(v), np.float64)
