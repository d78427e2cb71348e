"""The hot stage: actor-pool PDF→DOM parser for ``map_batches``.

Replaces the reference's warm single parser instance
(`/root/reference/src/main/java/org/fit/pdfdom/PDFBoxTree.java:154-197`
constructed once and reused per document) with a Ray actor pool: the
callable class is instantiated once per actor (``__init__`` holds the
config and any warm caches), each ``__call__`` parses a batch of
document payloads from a zero-copy Arrow batch and returns an Arrow
batch. All reference state (font table, graphics state, counters —
SURVEY.md §2.3) is per-document inside the kernel, so the stage is
embarrassingly parallel and deterministic → Ray task retries are safe.

Per-document wall-clock budget: a signal-free soft timeout is enforced
by the kernel's bounded structures; pathological documents surface as
``error`` rows rather than hung workers (giant-page guards live in
engine.cos / engine.images).
"""

from __future__ import annotations

import time

import pyarrow as pa

from ..config import DEFAULT_CONFIG, PdfDomConfig
from ..engine.parse import parse_document

__all__ = ["PdfDomParser", "SPANS_TYPE", "OUTPUT_SCHEMA", "parse_batch"]

SPANS_TYPE = pa.list_(pa.struct([
    ("page", pa.int32()),
    ("id", pa.string()),
    ("text", pa.string()),
    ("left", pa.float32()),
    ("top", pa.float32()),
    ("width", pa.float32()),
    ("line_height", pa.float32()),
    ("font_family", pa.string()),
    ("font_size", pa.float32()),
    ("font_weight", pa.string()),
    ("font_style", pa.string()),
    ("word_spacing", pa.float32()),
    ("letter_spacing", pa.float32()),
    ("color", pa.string()),
    ("stroke_color", pa.string()),
    ("char_start", pa.int64()),
    ("char_end", pa.int64()),
]))

OUTPUT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("html_dom", pa.string()),
    ("extracted_text", pa.string()),
    ("spans", SPANS_TYPE),
    ("num_pages", pa.int32()),
    ("n_spans", pa.int32()),
    ("n_images", pa.int32()),
    ("payload_bytes", pa.int64()),
    ("parse_ms", pa.float32()),
    ("error", pa.string()),
])


def parse_batch(batch: pa.Table, config: PdfDomConfig = DEFAULT_CONFIG,
                emit_html: bool = True) -> pa.Table:
    """Parse every payload in an Arrow batch → output Arrow batch."""
    urls = batch.column("url").to_pylist()
    payloads = batch.column("html").to_pylist()

    html_out: list[str] = []
    text_out: list[str] = []
    spans_out: list[list | None] = []
    pages_out: list[int] = []
    nspans_out: list[int] = []
    nimgs_out: list[int] = []
    bytes_out: list[int] = []
    ms_out: list[float] = []
    err_out: list[str | None] = []

    for url, payload in zip(urls, payloads):
        t0 = time.perf_counter()
        r = parse_document(payload if payload is not None else b"", config)
        ms = (time.perf_counter() - t0) * 1000.0
        html_out.append(r.html_dom if emit_html else "")
        text_out.append(r.extracted_text)
        spans_out.append(r.spans if config.emit_spans else [])
        pages_out.append(r.num_pages)
        nspans_out.append(r.n_boxes)
        nimgs_out.append(r.n_images)
        bytes_out.append(len(payload) if payload is not None else 0)
        ms_out.append(ms)
        err_out.append(r.error)

    return pa.Table.from_arrays([
        pa.array(urls, pa.string()),
        pa.array(html_out, pa.string()),
        pa.array(text_out, pa.string()),
        pa.array(spans_out, SPANS_TYPE),
        pa.array(pages_out, pa.int32()),
        pa.array(nspans_out, pa.int32()),
        pa.array(nimgs_out, pa.int32()),
        pa.array(bytes_out, pa.int64()),
        pa.array(ms_out, pa.float32()),
        pa.array(err_out, pa.string()),
    ], schema=OUTPUT_SCHEMA)


class PdfDomParser:
    """Callable class for ``ds.map_batches(PdfDomParser, concurrency=N,
    batch_format="pyarrow", batch_size=B)``.

    Skew routing happens INSIDE the stage (single input scan — a
    dataset-level filter fork would re-execute the upstream read once
    per branch): rows below ``skew_threshold`` bytes are parsed and
    yielded first as one block, then each giant row is parsed alone and
    yielded as its own block. Downstream consumers therefore never wait
    on a giant document to see the small rows of the same batch, and a
    giant never inflates an output block past its own size.
    """

    def __init__(self, config: PdfDomConfig | None = None,
                 emit_html: bool = True,
                 skew_threshold: int = 1024 * 1024):
        # once per actor: config + warm state (compiled regexes and the
        # standard-14 metric tables are module-level singletons, loaded
        # at import time in this worker process)
        self.config = config or DEFAULT_CONFIG
        self.emit_html = emit_html
        self.skew_threshold = skew_threshold

    def __call__(self, batch: pa.Table):
        import pyarrow.compute as pc
        lens = pc.binary_length(batch.column("html"))
        small_mask = pc.fill_null(pc.less(lens, self.skew_threshold), True)
        small = batch.filter(small_mask)
        if small.num_rows:
            yield parse_batch(small, self.config, self.emit_html)
        giant = batch.filter(pc.invert(small_mask))
        for i in range(giant.num_rows):
            yield parse_batch(giant.slice(i, 1), self.config, self.emit_html)
