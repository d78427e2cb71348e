"""CLI driver parity (S6; PDFToHTML.java:41-164)."""

import os

from pdf2dom_ray.cli import main
from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder


def make_pdf(tmp_path, with_image=False):
    b = PdfBuilder(title="CliDoc")
    p = PageSpec()
    p.use_core_font("F1", "Helvetica")
    p.text_block("F1", 12, 36, 750, ["cli test text"])
    if with_image:
        import numpy as np
        p.use_image("Im0", np.zeros((4, 4, 3), np.uint8))
        p.draw_image("Im0", 100, 600, 32, 32)
    b.add_page(p)
    path = tmp_path / "doc.pdf"
    path.write_bytes(b.build())
    return str(path)


def test_single_file_conversion(tmp_path):
    pdf = make_pdf(tmp_path)
    out = str(tmp_path / "doc.html")
    assert main([pdf, out]) == 0
    html = open(out).read()
    assert "<title>CliDoc</title>" in html
    assert "cli" in html


def test_single_file_save_to_dir(tmp_path):
    pdf = make_pdf(tmp_path, with_image=True)
    out = str(tmp_path / "doc.html")
    assert main([pdf, out, "--im", "save_to_dir"]) == 0
    html = open(out).read()
    assert 'src="resources/CliDoc.png"' in html
    assert os.path.exists(tmp_path / "resources" / "CliDoc.png")


def test_page_range_flag(tmp_path):
    pdf = make_pdf(tmp_path)
    out = str(tmp_path / "doc.html")
    assert main([pdf, out, "--end-page", "1"]) == 0
    assert "cli" in open(out).read()
