"""Committed-golden byte-identity: locks the serializer + kernel output
(the engine's equivalent of the reference's golden-HTML debug dumps,
TestUtils.java:25-40, made mandatory). Any change to serialization,
float formatting, box splitting or styling fails here loudly."""

import os

import pyarrow.parquet as pq
import pytest

from pdf2dom_ray.engine.parse import parse_document
from pdf2dom_ray.synth.corpus import doc_to_pdf

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
GOLDEN_IDS = (0, 3, 5, 2, 16)  # plain / image / embedded-font / rect / mix


@pytest.mark.parametrize("doc_id", GOLDEN_IDS)
def test_golden_byte_identity(doc_id, sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    text = t.column("text")[list(t.column("doc_id").to_pylist()).index(doc_id)].as_py()
    r = parse_document(doc_to_pdf(doc_id, text))
    assert r.error is None
    with open(os.path.join(GOLDEN_DIR, f"doc_{doc_id}.html")) as f:
        assert r.html_dom == f.read()
    with open(os.path.join(GOLDEN_DIR, f"doc_{doc_id}.txt")) as f:
        assert r.extracted_text == f.read()


def _rotation_doc():
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder
    b = PdfBuilder()
    p = PageSpec(612, 792, rotate=90)
    p.use_core_font("F1", "Helvetica")
    p.rect(50, 50, 100, 40, fill=(1, 0, 0))
    p.text_block("F1", 12, 36, 750, ["rotated page"])
    b.add_page(p)
    return b.build()


def _type0_doc():
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder
    b = PdfBuilder()
    p = PageSpec()
    p.use_type0_font("F1", "AAAAAA+CidFont", seed=5)
    p.text_hex("F1", 12, 100, 700, "Golden CID text")
    b.add_page(p)
    return b.build()


def _cff_doc():
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder
    b = PdfBuilder()
    p = PageSpec()
    p.use_type1c_font("F1", "EKCFJL+Omsym2")
    p.text_block("F1", 12, 36, 750, ["golden cff"])
    b.add_page(p)
    return b.build()


def _polygon_doc():
    from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder
    b = PdfBuilder()
    p = PageSpec()
    p.polygon([(100, 100), (150, 200), (200, 100)], fill=(0.85, 0.85, 0.85))
    p.use_core_font("F1", "Courier")
    p.text_block("F1", 10, 36, 750, ["poly page"])
    b.add_page(p)
    return b.build()


@pytest.mark.parametrize("name,builder", [
    ("rotation90", _rotation_doc), ("type0", _type0_doc),
    ("cff", _cff_doc), ("polygon", _polygon_doc)])
def test_fixture_golden_byte_identity(name, builder):
    """Feature-surface goldens: rotation transform, Type0/CID decode,
    CFF→WOFF payload, polygon rasterization — any byte drift fails."""
    r = parse_document(builder())
    assert r.error is None
    with open(os.path.join(GOLDEN_DIR, f"fixture_{name}.html")) as f:
        assert r.html_dom == f.read()
