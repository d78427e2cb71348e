"""Synthetic Common-Crawl-style pages corpus.

Derives the authoritative input table (url, warc_ts, html, text, lang —
BASELINE.json input_hint) deterministically from the driver's
``documents.parquet`` table: each document row becomes one web-page row
whose ``html`` column carries a synthetic PDF payload rendering exactly
that document's text (10 words per line, 40 lines per page). The
derivation rules are simple modular functions of ``doc_id`` so DuckDB
oracles can predict pipeline outputs (word/span counts, page counts,
image counts, error rows) in pure SQL.

Rules (all deterministic, seedless):
* font          = CORE_FONTS[doc_id % 8]; size = 10 + doc_id % 4
* color         = PALETTE[doc_id % 5]
* embedded TTF  = used when doc_id % 11 == 5 (exercises the FontTable)
* bare CFF      = when doc_id % 13 == 7 (and not TTF) — WOFF conversion
* image         = one 8×8 RGB image when doc_id % 7 == 3
  (stored as DCT/baseline-JPEG when additionally doc_id % 3 == 1 —
  exercises engine/jpeg.py; as lossless JPEG2000/JPXDecode when
  doc_id % 3 == 2 — exercises engine/jpx.py; Flate raster otherwise.
  JPX decode is bit-exact so its <img> PNG is byte-identical to the
  Flate form; the DCT one differs only by the JPEG quantization
  roundtrip. n_images is unchanged by the codec choice)
* filled rect   = when doc_id % 5 == 2
* malformed     = truncated garbage payload when doc_id % 97 == 13
* encrypted     = standard security handler, empty user password:
  RC4-128 when doc_id % 29 == 11, AES-128 when doc_id % 29 == 23
  (transparent decrypt — extracted text/html byte-identical to the
  unencrypted form, so the SQL oracles are unaffected)
* title         = "Doc {doc_id}"
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .pdfgen import CORE_FONTS, PageSpec, PdfBuilder

__all__ = ["WORDS_PER_LINE", "LINES_PER_PAGE", "URL_PREFIX",
           "doc_to_pdf", "pages_batch_from_documents", "PAGES_SCHEMA"]

WORDS_PER_LINE = 10
LINES_PER_PAGE = 40
URL_PREFIX = "https://docs.synth.test/"
CORPUS_VERSION = 4  # bump when generation rules change (bench cache key)
_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z

PALETTE = [(0, 0, 0), (0.2, 0.4, 0.6), (0.8, 0.1, 0.1),
           (0.1, 0.5, 0.2), (0.3, 0.3, 0.3)]

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def is_malformed(doc_id: int) -> bool:
    return doc_id % 97 == 13


def has_image(doc_id: int) -> bool:
    return doc_id % 7 == 3


def has_rect(doc_id: int) -> bool:
    return doc_id % 5 == 2


def uses_embedded_font(doc_id: int) -> bool:
    return doc_id % 11 == 5


def uses_cff_font(doc_id: int) -> bool:
    # bare-CFF (FontFile3/Type1C → WOFF) docs; embedded-TTF rule wins
    return doc_id % 13 == 7 and not uses_embedded_font(doc_id)


def uses_dct_image(doc_id: int) -> bool:
    return has_image(doc_id) and doc_id % 3 == 1


def uses_jpx_image(doc_id: int) -> bool:
    return has_image(doc_id) and doc_id % 3 == 2


def encryption_method(doc_id: int) -> str | None:
    if doc_id % 29 == 11:
        return "rc4"
    if doc_id % 29 == 23:
        return "aesv2"
    return None


def synth_image(doc_id: int) -> np.ndarray:
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    r = np.full((8, 8), doc_id % 251, dtype=np.uint8)
    b = np.full((8, 8), (doc_id * 7) % 251, dtype=np.uint8)
    return np.stack([r, g * 3, b], axis=-1)


def doc_to_pdf(doc_id: int, text: str) -> bytes:
    """Render one document's text into deterministic PDF bytes."""
    if is_malformed(doc_id):
        return (b"%PDF-1.4\n1 0 obj\n<< /Type /Garbage" +
                text.encode("latin-1", "replace")[:64] + b"\xff\xfe trunc")

    words = text.split(" ")
    lines = [" ".join(words[i:i + WORDS_PER_LINE])
             for i in range(0, len(words), WORDS_PER_LINE)]
    pages = [lines[i:i + LINES_PER_PAGE]
             for i in range(0, len(lines), LINES_PER_PAGE)] or [[""]]

    b = PdfBuilder(title=f"Doc {doc_id}")
    size = 10 + doc_id % 4
    color = PALETTE[doc_id % 5]
    for pi, page_lines in enumerate(pages):
        p = PageSpec(612, 792)
        if uses_embedded_font(doc_id):
            p.use_embedded_ttf("F1", f"AAAAAA+SynthFont{doc_id % 3}", doc_id % 17)
        elif uses_cff_font(doc_id):
            p.use_type1c_font("F1", f"BBBBBB+SynthCff{doc_id % 3}",
                              n_glyphs=3 + doc_id % 5)
        else:
            p.use_core_font("F1", CORE_FONTS[doc_id % 8])
        if pi == 0 and has_rect(doc_id):
            p.rect(400, 80, 60 + doc_id % 40, 25, fill=(0.9, 0.9, 0.2))
        if pi == 0 and has_image(doc_id):
            if uses_dct_image(doc_id):
                p.use_jpeg_image("Im0", synth_image(doc_id), quality=90)
            elif uses_jpx_image(doc_id):
                p.use_jpx_image("Im0", synth_image(doc_id))
            else:
                p.use_image("Im0", synth_image(doc_id))
            p.draw_image("Im0", 480, 700, 64, 64)
        p.text_block("F1", size, 36, 750, page_lines, leading=16.0,
                     color=color if color != (0, 0, 0) else None)
        b.add_page(p)
    pdf = b.build()
    method = encryption_method(doc_id)
    if method is not None:
        from .encrypt import encrypt_pdf
        pdf = encrypt_pdf(pdf, method)
    return pdf


def pages_batch_from_documents(batch: pa.Table) -> pa.Table:
    """Vectorized-per-batch pages-table builder (documents → pages).

    Runs inside ``map_batches`` with ``batch_format="pyarrow"``; each
    row is independent so the stage is embarrassingly parallel.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    urls = [f"{URL_PREFIX}{d}" for d in doc_ids]
    ts = pa.array([_EPOCH_US + int(d) * 1_000_000 for d in doc_ids],
                  type=pa.timestamp("us"))
    html = pa.array([doc_to_pdf(d, t) for d, t in zip(doc_ids, texts)],
                    type=pa.binary())
    return pa.Table.from_arrays(
        [pa.array(urls), ts, html, pa.array(texts), pa.array(langs)],
        schema=PAGES_SCHEMA)
