"""Pages-table sources.

The engine's input contract is the Common-Crawl-style pages table
(url, warc_ts, html, text, lang — BASELINE.json input_hint). Sources:

* ``read_pages``: Parquet shards, column-pruned at the read.
* ``synth from documents``: deterministic corpus derivation (synth/).
* ``read_binary_docs``: a directory of loose document files → pages rows
  (the reference's file-per-invocation mode at corpus scale).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..synth.corpus import PAGES_SCHEMA

__all__ = ["read_pages", "read_binary_docs", "validate_pages_schema"]

REQUIRED = ("url", "html")


def read_pages(path: str, *, columns: list[str] | None = None) -> rd.Dataset:
    """Read pages parquet; defaults to pruning to the parse columns."""
    return rd.read_parquet(path, columns=columns or list(REQUIRED))


def read_binary_docs(path: str, *, suffix: str = ".pdf") -> rd.Dataset:
    """Loose files → pages rows (url = file path, payload = bytes)."""
    ds = rd.read_binary_files(path, include_paths=True,
                              file_extensions=[suffix.lstrip(".")])

    def to_pages(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t.column("path"),
            "html": t.column("bytes"),
        })
    return ds.map_batches(to_pages, batch_format="pyarrow")


def validate_pages_schema(ds: rd.Dataset) -> None:
    names = set(ds.schema().names)
    missing = [c for c in REQUIRED if c not in names]
    if missing:
        raise ValueError(
            f"pages table missing column(s) {missing}; expected at least "
            f"{REQUIRED} (full contract: {PAGES_SCHEMA.names})")
