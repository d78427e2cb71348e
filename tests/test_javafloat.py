"""Unit tests for Java Float/Double.toString emulation (F3 in SURVEY §2.8)."""

import math

import numpy as np
import pytest

from pdf2dom_ray.engine.javafloat import jdouble_str, jfloat_str


@pytest.mark.parametrize("value,expected", [
    (0.0, "0.0"),
    (-0.0, "-0.0"),
    (5, "5.0"),
    (0.1, "0.1"),
    (12.0, "12.0"),
    (612.0, "612.0"),
    (-6.0, "-6.0"),
    (0.001, "0.001"),
    (0.0001, "1.0E-4"),
    (1e7, "1.0E7"),
    (1.23e8, "1.23E8"),
    (9999999.0, "9999999.0"),
    (float("nan"), "NaN"),
    (float("inf"), "Infinity"),
    (float("-inf"), "-Infinity"),
])
def test_jfloat_known_values(value, expected):
    assert jfloat_str(value) == expected


def test_jfloat_roundtrip_is_shortest():
    # the emitted string must parse back to the exact same float32
    rng = np.random.default_rng(42)
    for v in rng.uniform(-1e6, 1e6, 500).astype(np.float32):
        s = jfloat_str(v)
        assert np.float32(float(s)) == v


def test_jdouble_angles():
    assert jdouble_str(45.0) == "45.0"
    assert jdouble_str(26.56505117707799) == "26.56505117707799"


def test_jfloat_trailing_fraction():
    # Java always keeps >= 1 fractional digit in plain notation
    for v in (1.0, 2.0, 100.0, 4096.0):
        assert jfloat_str(v).endswith(".0")


def test_boundary_to_scientific():
    assert "E" in jfloat_str(1.0000001e7)
    assert "E" not in jfloat_str(9999998.0)
    assert "E" in jfloat_str(9.999e-4) or jfloat_str(9.999e-4) == "9.999E-4"
    assert math.isclose(float(jfloat_str(3.3000002).replace("E", "e")),
                        3.3000002, rel_tol=1e-6)
