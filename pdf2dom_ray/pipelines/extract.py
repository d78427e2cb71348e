"""The flagship pipeline: pages table → parsed DOM/text/spans table.

Ray-Data lifecycle (SURVEY.md §3):

    read_parquet(pages shards)                 # or synth stage from documents
      → project (url, html)                    # prune at the read
      → map_batches(PdfDomParser, pyarrow, actor pool)  # in-stage skew routing
      → write_parquet(out, partitioned)        # resumable checkpoint unit

Skew handling (north_rule): the parser stage itself routes by payload
size — rows below ``skew_threshold`` bytes are parsed and yielded as
one block, each giant row is parsed alone and yielded as its own block
(generator UDF). This is a SINGLE scan of the input: the previous
two-branch filter fork executed the upstream read once per branch
(Ray Data does not dedupe shared lineage), doubling payload I/O.
"""

from __future__ import annotations

import ray.data as rd

from ..scale import read_parallelism

from ..config import DEFAULT_CONFIG, PdfDomConfig
from ..stages.parser_stage import PdfDomParser
from ..synth.corpus import pages_batch_from_documents

__all__ = ["synth_pages", "extract", "extract_from_documents"]


def synth_pages(sf_dir: str, *, concurrency: int | None = None) -> rd.Dataset:
    """documents.parquet → deterministic pages table (url, warc_ts, html,
    text, lang). Column-pruned read; embarrassingly parallel."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"],
                         override_num_blocks=read_parallelism())
    return ds.map_batches(pages_batch_from_documents, batch_format="pyarrow",
                          batch_size=64, concurrency=concurrency)


def extract(pages: rd.Dataset, config: PdfDomConfig = DEFAULT_CONFIG, *,
            emit_html: bool = True,
            batch_size: int = 64,
            concurrency=None,
            skew_threshold: int = 1024 * 1024) -> rd.Dataset:
    """Parse a pages Dataset into the output table (OUTPUT_SCHEMA).

    ``concurrency``: actor-pool size (or (min, max)); None sizes an
    autoscaling pool to the cluster CPUs. ``skew_threshold``: byte size
    above which a document is parsed alone and yielded as its own
    output block inside the parser stage (1 MB ≈ 6 s of kernel work —
    anything slower must not hide inside a batch of small docs).
    """
    if concurrency is None:
        # autoscaling (hi/2, hi) with hi = cpus − 2: headroom for
        # read/write tasks. A fixed hi-sized pool is ~25% faster on a
        # one-shot corpus run (no ramp; bench passes it explicitly) but
        # livelocks a SECOND extract in the same session while the
        # first pool's actors linger during shutdown — the autoscaling
        # default is always safe.
        import ray
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if \
            ray.is_initialized() else 8
        hi = max(ncpu - 2, 1)
        concurrency = (max(hi // 2, 1), hi)
    pages = pages.select_columns(["url", "html"])

    return pages.map_batches(
        PdfDomParser, fn_constructor_kwargs={"config": config,
                                             "emit_html": emit_html,
                                             "skew_threshold": skew_threshold},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def extract_from_documents(sf_dir: str,
                           config: PdfDomConfig = DEFAULT_CONFIG, *,
                           emit_html: bool = True,
                           batch_size: int = 16,
                           concurrency=None) -> rd.Dataset:
    """End-to-end: documents.parquet → synth pages → parsed table."""
    return extract(synth_pages(sf_dir), config, emit_html=emit_html,
                   batch_size=batch_size, concurrency=concurrency)
