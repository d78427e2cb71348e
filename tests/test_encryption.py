"""Encrypted-PDF support (standard security handler, empty user
password) — mirrors PDFBox's transparent decryption on load
(`PDFToHTML.java:73`). Byte-identity invariant: an encrypted fixture
must produce EXACTLY the html_dom/extracted_text of its plaintext
original. Password-protected files degrade to clean error rows.
"""

import numpy as np
import pytest

from pdf2dom_ray.engine.parse import parse_document
from pdf2dom_ray.synth.corpus import doc_to_pdf
from pdf2dom_ray.synth.encrypt import encrypt_pdf
from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder

METHODS = ["rc4", "aesv2", "aesv3"]


@pytest.mark.parametrize("method", METHODS)
def test_encrypted_matches_plaintext_byte_identical(method):
    plain = doc_to_pdf(3, "secret words survive standard encryption intact")
    base = parse_document(plain)
    r = parse_document(encrypt_pdf(plain, method))
    assert r.error is None
    assert r.extracted_text == base.extracted_text
    assert r.html_dom == base.html_dom


@pytest.mark.parametrize("method", METHODS)
def test_encrypted_title_string_decrypted(method):
    b = PdfBuilder(title="Classified Report")
    p = PageSpec()
    p.use_core_font("F1", "Helvetica")
    p.text_block("F1", 12, 36, 750, ["body text"])
    b.add_page(p)
    r = parse_document(encrypt_pdf(b.build(), method))
    assert r.error is None
    assert "<title>Classified Report</title>" in r.html_dom


def test_encrypted_with_image_and_font_streams():
    b = PdfBuilder(title="imgs")
    p = PageSpec()
    img = np.full((4, 4, 3), 99, np.uint8)
    p.use_image("Im0", img)
    p.draw_image("Im0", 100, 600, 32, 32)
    p.use_core_font("F1", "Helvetica")
    p.text_block("F1", 12, 36, 750, ["with image"])
    b.add_page(p)
    plain = b.build()
    base = parse_document(plain)
    r = parse_document(encrypt_pdf(plain, "aesv2"))
    assert r.error is None
    assert r.n_images == 1
    assert r.html_dom == base.html_dom


@pytest.mark.parametrize("method", METHODS)
def test_password_protected_degrades_to_error_row(method):
    plain = doc_to_pdf(5, "locked away")
    r = parse_document(encrypt_pdf(plain, method, user_password=b"hunter2"))
    assert r.error is not None
    assert "encrypted" in r.error
    assert r.extracted_text == ""


def test_unsupported_handler_degrades_to_error_row():
    plain = doc_to_pdf(5, "drm text")
    epdf = encrypt_pdf(plain, "rc4")
    # corrupt the handler name → UnsupportedEncryptionError path
    epdf = epdf.replace(b"/Filter /Standard", b"/Filter /FooDRMv9")
    r = parse_document(epdf)
    assert r.error is not None
    assert "encrypted" in r.error or "security" in r.error


@pytest.mark.parametrize("method", METHODS)
def test_encrypted_objstm_document(method):
    """Encryption applies to the ObjStm CONTAINER stream; objects
    inside it are not individually encrypted — the loader must decrypt
    the container before the compressed-object scan."""
    from tests.test_objstm import build_objstm_pdf
    plain = build_objstm_pdf(compress=True)
    base = parse_document(plain)
    r = parse_document(encrypt_pdf(plain, method))
    assert r.error is None
    assert r.extracted_text == base.extracted_text
    assert r.html_dom == base.html_dom


def test_encryption_roundtrip_property():
    """Property sweep: many corpus documents × all methods decode to
    byte-identical output."""
    for doc_id in (0, 3, 11, 40):
        text = f"property doc {doc_id} " + "word " * (10 + doc_id * 3)
        plain = doc_to_pdf(doc_id, text.strip())
        base = parse_document(plain)
        for method in METHODS:
            r = parse_document(encrypt_pdf(plain, method))
            assert r.error is None, (doc_id, method, r.error)
            assert r.html_dom == base.html_dom, (doc_id, method)
