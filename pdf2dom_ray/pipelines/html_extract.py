"""HTML main-content extraction pipeline (boilerplate strip).

The HTML twin of ``pipelines/extract.py``: pages with HTML payloads →
(url, title, main_text, n_blocks, n_boilerplate).  The per-document
kernel is ``engine/htmltext.py`` (jusText/Boilerpipe-style block
heuristics); this module owns the Ray-Data plumbing:

    read documents (column-pruned)
      → synth HTML pages (deterministic htmlgen rules)
      → map_batches(HtmlMainExtractor, pyarrow, actor pool)

The extractor is a callable CLASS so the compiled regexes and tag sets
are built once per actor, not once per batch.  Each row is independent
(no shuffle anywhere), so the stage scales exactly like the PDF parse
stage: linear in CPUs with streaming backpressure.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..stages.pool import default_pool
from ..synth.htmlgen import html_pages_batch_from_documents

__all__ = ["HtmlMainExtractor", "extract_html_main",
           "extract_html_from_documents", "synth_html_pages"]

OUTPUT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("title", pa.string()),
    ("main_text", pa.string()),
    ("n_blocks", pa.int64()),
    ("n_boilerplate", pa.int64()),
])


class HtmlMainExtractor:
    """Actor-pool UDF: one boilerplate-strip kernel call per row."""

    def __init__(self) -> None:
        # import here so the kernel (and its compiled module-level
        # regexes) is loaded once per actor process
        from ..engine.htmltext import extract_main
        self._extract = extract_main

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        titles: list[str] = []
        texts: list[str] = []
        n_blocks: list[int] = []
        n_bad: list[int] = []
        for payload in batch.column("html"):
            mc = self._extract(payload.as_py())
            titles.append(mc.title)
            texts.append(mc.main_text)
            n_blocks.append(mc.n_blocks)
            n_bad.append(mc.n_boilerplate)
        return pa.Table.from_arrays(
            [urls, pa.array(titles, pa.string()),
             pa.array(texts, pa.string()),
             pa.array(n_blocks, pa.int64()),
             pa.array(n_bad, pa.int64())],
            schema=OUTPUT_SCHEMA)


def synth_html_pages(sf_dir: str, *,
                     concurrency: int | None = None) -> rd.Dataset:
    """documents.parquet → deterministic HTML pages table."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    return ds.map_batches(html_pages_batch_from_documents,
                          batch_format="pyarrow", batch_size=128,
                          concurrency=concurrency)


def extract_html_main(pages: rd.Dataset, *, batch_size: int = 128,
                      concurrency=None) -> rd.Dataset:
    """Boilerplate-strip a pages Dataset → OUTPUT_SCHEMA table."""
    if concurrency is None:
        concurrency = default_pool()
    return pages.select_columns(["url", "html"]).map_batches(
        HtmlMainExtractor, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def extract_html_from_documents(sf_dir: str, **kw) -> rd.Dataset:
    """End-to-end: documents.parquet → synth HTML pages → main content."""
    return extract_html_main(synth_html_pages(sf_dir), **kw)
