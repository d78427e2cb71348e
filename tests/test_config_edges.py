"""Config and geometry edges: per-document timeout, nonzero crop-box
origin, media-vs-crop box, zero-size pages."""

from pdf2dom_ray.config import PdfDomConfig
from pdf2dom_ray.engine.parse import parse_document
from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder


def test_timeout_yields_error_row():
    """A tiny wall-clock budget turns a (legitimate) document into an
    error row instead of hanging the worker (SURVEY §4 straggler cap)."""
    b = PdfBuilder()
    for _ in range(40):
        p = PageSpec()
        p.use_core_font("F1", "Courier")
        p.text_block("F1", 10, 36, 750,
                     [f"w{i} " * 9 for i in range(40)])
        b.add_page(p)
    data = b.build()
    r = parse_document(data, PdfDomConfig(timeout_s=0.000001))
    assert r.error is not None
    assert "timeout" in r.error
    ok = parse_document(data, PdfDomConfig(timeout_s=60))
    assert ok.error is None
    assert ok.num_pages == 40


def test_nonzero_cropbox_origin():
    """Coordinates are crop-box-relative: a nonzero lower-left shifts
    text/graphics positions (PDFBoxTree.java:852 translate(-llx,-lly))."""
    raw = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
           b"/MediaBox [0 0 700 900] /CropBox [50 100 650 892] "
           b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>\nendobj\n"
           b"5 0 obj\n<< /Length 48 >>\nstream\n"
           b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (shifted) Tj ET\nendstream\nendobj\n")
    r = parse_document(raw)
    assert r.error is None
    s = r.spans[0]
    # crop 600x792; x = 100 - llx(50) = 50; baseline y = (ury 892) - 700 = 192
    assert abs(s["left"] - 50.0) < 0.01
    assert "width:600.0pt;height:792.0pt;" in r.html_dom
    assert abs((s["top"] + 0) - (192 - 6.29)) < 0.5  # baseline - ascent


def test_zero_area_page_tolerated():
    raw = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 0 0] "
           b"/Resources << >> >>\nendobj\n")
    r = parse_document(raw)
    assert r.error is None
    assert r.num_pages == 1
    assert "width:0.0pt;height:0.0pt;" in r.html_dom


def test_page_without_contents():
    raw = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
           b"/MediaBox [0 0 612 792] >>\nendobj\n")
    r = parse_document(raw)
    assert r.error is None
    assert r.extracted_text == ""
    assert r.num_pages == 1
