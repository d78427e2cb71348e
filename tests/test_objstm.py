"""PDF 1.5 compressed object streams (/ObjStm) and encryption guard.

Modern web PDFs keep their document dictionaries inside FlateDecoded
object streams; the loader must surface those objects even though the
top-level scan only sees the ObjStm container."""

import zlib

import pytest

from pdf2dom_ray.engine.cos import PdfDocument, PdfParseError
from pdf2dom_ray.engine.parse import parse_document


def build_objstm_pdf(compress: bool = True) -> bytes:
    """Catalog/Pages/Page/Font dicts packed into one /ObjStm; the
    content stream stays top-level (streams cannot live in an ObjStm)."""
    inner_objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents 6 0 R >>"),
        (4, b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"),
    ]
    body = b""
    header = b""
    for num, objbytes in inner_objs:
        header += f"{num} {len(body)} ".encode()
        body += objbytes + b" "
    payload = header + body
    first = len(header)
    data = zlib.compress(payload) if compress else payload
    filt = b" /Filter /FlateDecode" if compress else b""

    content = b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (compressed objects) Tj ET"
    pdf = (b"%PDF-1.5\n"
           b"5 0 obj\n<< /Type /ObjStm /N " + str(len(inner_objs)).encode()
           + b" /First " + str(first).encode()
           + b" /Length " + str(len(data)).encode() + filt
           + b" >>\nstream\n" + data + b"\nendstream\nendobj\n"
           b"6 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
           b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n")
    return pdf


@pytest.mark.parametrize("compress", [True, False])
def test_objstm_document_parses(compress):
    r = parse_document(build_objstm_pdf(compress))
    assert r.error is None
    assert r.extracted_text == "compressed objects"
    assert r.num_pages == 1
    assert r.spans[0]["font_family"] == "Courier"


def test_objstm_objects_resolvable():
    doc = PdfDocument(build_objstm_pdf())
    assert doc.get_object(1)["Type"] == "Catalog"
    assert doc.get_object(4)["BaseFont"] == "Courier"


def test_top_level_definition_wins_over_objstm():
    pdf = build_objstm_pdf()
    # append a top-level redefinition of the font object
    patch = (b"4 0 obj\n<< /Type /Font /Subtype /Type1 "
             b"/BaseFont /Helvetica >>\nendobj\n")
    pdf = pdf.replace(b"trailer\n", patch + b"trailer\n")
    r = parse_document(pdf)
    assert r.spans[0]["font_family"] == "Helvetica"


def test_encrypted_pdf_rejected_cleanly():
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Count 0 /Kids [] >>\nendobj\n"
           b"3 0 obj\n<< /Filter /Standard /V 2 >>\nendobj\n"
           b"trailer\n<< /Size 4 /Root 1 0 R /Encrypt 3 0 R >>\n%%EOF\n")
    r = parse_document(pdf)
    assert r.error is not None
    assert "encrypt" in r.error.lower()
