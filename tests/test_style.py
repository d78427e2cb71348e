"""BoxStyle CSS serialization + equality (M16/F8; BoxStyle.java)."""

from pdf2dom_ray.engine.style import BoxStyle, TRANSPARENT_COLOR


def make_style():
    s = BoxStyle("pt")
    s.set_top(33.384)
    s.set_left(36.0)
    s.set_line_height(11.1)
    s.font_family = "Helvetica"
    s.set_font_size(12.0)
    s.font_weight = "normal"
    s.font_style = "normal"
    s.color = "#336699"
    return s


def test_property_order_and_suppression():
    css = make_style().to_css()
    # fixed property order (BoxStyle.java:88-114); defaults suppressed
    assert css == ("top:33.384pt;left:36.0pt;line-height:11.1pt;"
                   "font-family:Helvetica;font-size:12.0pt;color:#336699;")


def test_zero_lengths_still_printed():
    s = BoxStyle("pt")
    css = s.to_css()
    assert css.startswith("top:0.0pt;left:0.0pt;line-height:0.0pt;")
    # font-size 0 is suppressed
    assert "font-size" not in css


def test_bold_and_spacing():
    s = make_style()
    s.font_weight = "bold"
    s.set_word_spacing(1.5)
    s.set_letter_spacing(0.25)
    css = s.to_css()
    assert "font-weight:bold;" in css
    assert "word-spacing:1.5pt;" in css
    assert "letter-spacing:0.25pt;" in css
    assert css.index("font-weight") < css.index("word-spacing") < css.index(
        "letter-spacing")


def test_default_color_suppressed():
    s = make_style()
    s.color = "#000000"
    assert "color" not in s.to_css()


def test_text_stroke_css():
    s = make_style()
    s.stroke_color = "#ff00ff"
    css = s.to_css()
    assert "-webkit-text-stroke: #ff00ff 1px ;" in css
    assert css.count("#ff00ff") == 5  # stroke + 4 shadow fallbacks


def test_transparent_stroke_suppressed():
    s = make_style()
    s.stroke_color = TRANSPARENT_COLOR
    assert "text-stroke" not in s.to_css()


def test_style_equality_ignores_position():
    a = make_style()
    b = make_style()
    b.set_top(999)
    b.set_left(-5)
    b.set_line_height(50)
    assert a.style_eq(b)  # position fields not part of equality
    b.set_font_size(13.0)
    assert not a.style_eq(b)


def test_style_equality_color():
    a = make_style()
    b = make_style()
    b.color = "#000001"
    assert not a.style_eq(b)
