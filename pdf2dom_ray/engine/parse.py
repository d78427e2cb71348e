"""Pure per-document kernel: ``parse_document(bytes, config) -> ParseResult``.

The Ray-free equivalent of the reference's library entry point
``PDFDomTree.createDOM(PDDocument)``
(`/root/reference/src/main/java/org/fit/pdfdom/PDFDomTree.java:210-217`)
plus serialization (``writeText``, PDFDomTree.java:180-202). Pure and
deterministic: same bytes + same config → byte-identical outputs, which
is what makes Ray task retries safe (SURVEY.md §4).
"""

from __future__ import annotations

import traceback
from dataclasses import dataclass, field

from ..config import DEFAULT_CONFIG, PdfDomConfig
from .cos import PdfDocument, PdfParseError
from .emitter import DomEmitter
from .walker import Walker

__all__ = ["ParseResult", "parse_document"]


@dataclass
class ParseResult:
    html_dom: str = ""
    extracted_text: str = ""
    spans: list = field(default_factory=list)
    resources: list = field(default_factory=list)
    num_pages: int = 0
    n_images: int = 0
    n_boxes: int = 0
    error: str | None = None


def parse_document(data: bytes, config: PdfDomConfig = DEFAULT_CONFIG) -> ParseResult:
    """Parse one document; never raises — failures land in ``error``."""
    try:
        doc = PdfDocument(data)
        emitter = DomEmitter(config)
        walker = Walker(doc, emitter, config)
        walker.process_document()
        return ParseResult(
            html_dom=emitter.html(),
            extracted_text=emitter.extracted_text(),
            spans=emitter.spans,
            resources=emitter.resources,
            num_pages=emitter.pagecnt,
            n_images=emitter.n_images,
            n_boxes=emitter.textcnt,
            error=None,
        )
    except PdfParseError as e:
        return ParseResult(error=f"parse: {e}")
    except RecursionError:
        return ParseResult(error="parse: recursion limit")
    except MemoryError:
        return ParseResult(error="parse: memory limit")
    except Exception as e:  # defensive: malformed input must not kill a worker
        tb = traceback.format_exc(limit=3)
        return ParseResult(error=f"internal: {type(e).__name__}: {e} | {tb}")
