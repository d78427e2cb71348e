"""Robustness fuzzing: parse_document must NEVER raise — any input,
including mutations of valid PDFs, must yield either a result or an
``error`` row (the worker-never-dies contract, SURVEY.md §4)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf2dom_ray.engine.parse import parse_document
from pdf2dom_ray.synth.pdfgen import PageSpec, PdfBuilder


def base_pdf() -> bytes:
    b = PdfBuilder(title="Fuzz")
    p = PageSpec()
    p.use_core_font("F1", "Helvetica")
    p.text_block("F1", 12, 36, 750, ["fuzz target text here"])
    p.rect(100, 100, 50, 20, fill=(1, 0, 0))
    b.add_page(p)
    return b.build()


_BASE = base_pdf()


@settings(max_examples=120, deadline=None)
@given(data=st.binary(max_size=400))
def test_random_bytes_never_raise(data):
    r = parse_document(data)
    assert r.error is not None or r.num_pages >= 0


@settings(max_examples=120, deadline=None)
@given(
    pos=st.integers(0, len(_BASE) - 1),
    length=st.integers(1, 64),
    junk=st.binary(min_size=1, max_size=64),
)
def test_mutated_pdf_never_raises(pos, length, junk):
    mutated = _BASE[:pos] + junk + _BASE[pos + length:]
    r = parse_document(mutated)
    # parse either succeeds (deterministically) or isolates the error
    if r.error is None:
        r2 = parse_document(mutated)
        assert r2.html_dom == r.html_dom


@settings(max_examples=60, deadline=None)
@given(cut=st.integers(0, len(_BASE)))
def test_truncations_never_raise(cut):
    r = parse_document(_BASE[:cut])
    assert isinstance(r.extracted_text, str)


# -- round-2 codecs: garbage must yield TYPED errors, never hangs or
# foreign tracebacks ---------------------------------------------------------

@settings(max_examples=80, deadline=None)
@given(data=st.binary(max_size=300))
def test_jpeg_decoder_typed_errors(data):
    from pdf2dom_ray.engine.jpeg import JpegError, decode_baseline_jpeg
    try:
        decode_baseline_jpeg(b"\xff\xd8" + data)
    except JpegError:
        pass


@settings(max_examples=80, deadline=None)
@given(data=st.binary(max_size=200))
def test_ccitt_decoder_typed_errors(data):
    from pdf2dom_ray.engine.ccitt import CcittError, decode_g3, decode_g4
    for fn in (lambda d: decode_g4(d, 64, 4),
               lambda d: decode_g3(d, 64, 4, k=0)):
        try:
            fn(data)
        except CcittError:
            pass


@settings(max_examples=80, deadline=None)
@given(data=st.binary(max_size=200))
def test_lzw_decoder_typed_errors(data):
    from pdf2dom_ray.engine.cos import PdfParseError, _lzw_decode
    try:
        _lzw_decode(data)
    except PdfParseError:
        pass


@settings(max_examples=60, deadline=None)
@given(data=st.binary(max_size=160))
def test_mutated_encrypted_pdf_never_raises(data):
    """Splice junk into an encrypted PDF: parse_document must produce a
    row (possibly an error row), never a traceback."""
    from pdf2dom_ray.synth.corpus import doc_to_pdf
    from pdf2dom_ray.synth.encrypt import encrypt_pdf
    base = encrypt_pdf(doc_to_pdf(3, "fuzzable encrypted body"), "aesv2")
    pos = (sum(data) * 131) % max(len(base) - len(data), 1)
    mutated = base[:pos] + data + base[pos + len(data):]
    r = parse_document(mutated)
    assert r is not None
