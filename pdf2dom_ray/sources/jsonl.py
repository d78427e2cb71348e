"""JSONL corpus source: Dolma/C4-layout text shards → document rows.

The OTHER standard LLM-corpus interchange format next to WARC: a
directory tree of ``.jsonl[.gz]`` shards, one JSON object per line,
one document per object (Dolma, C4, The Pile, RedPajama and most
HuggingFace text dumps all ship this way). ``read_jsonl(paths,
schema)`` is a file-parallel Ray Data source (``FileBasedDatasource``,
one read task per shard — the same 100 TB file-level parallelism as
``sources/warc.py``), each task streaming lines off the (possibly
gzipped) handle and emitting Arrow blocks projected onto the caller's
schema.

Format handling:

* gzip detected by magic bytes (``1f 8b``) — concatenated members
  stream transparently; plain ``.jsonl`` works unchanged;
* each non-empty line must parse as one JSON object; schema fields
  absent from an object become null (the Dolma convention — optional
  metadata varies per source), fields present but of the wrong type
  fail the cast loudly;
* a malformed line raises ``ValueError`` carrying the shard path and
  line number by default (a corrupt shard should fail its read task
  loudly and be retried/quarantined, not silently shorten the
  corpus); ``on_error="skip"`` tolerates and counts bad lines for
  scavenging partially-damaged dumps.
"""

from __future__ import annotations

import gzip
import io
import json
from typing import Iterator

import pyarrow as pa
import ray.data as rd
from ray.data.datasource import FileBasedDatasource

__all__ = ["JsonlDatasource", "read_jsonl", "DOCUMENTS_SCHEMA"]

# the documents-table contract (TESTDATA.md) under its JSONL spelling
DOCUMENTS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
    ("n_chars", pa.int64()),
])

_BATCH_LINES = 512


def _rows_to_table(rows: list[dict], schema: pa.Schema) -> pa.Table:
    cols = {}
    for field in schema:
        vals = [r.get(field.name) for r in rows]
        cols[field.name] = pa.array(vals, field.type)
    return pa.table(cols)


class JsonlDatasource(FileBasedDatasource):
    """One read task per JSONL shard; objects → schema-projected rows."""

    _FILE_EXTENSIONS = ["jsonl", "jsonl.gz", "json", "json.gz"]

    def __init__(self, paths, *, schema: pa.Schema = DOCUMENTS_SCHEMA,
                 on_error: str = "raise", **kwargs):
        if on_error not in ("raise", "skip"):
            raise ValueError(f"on_error must be raise|skip: {on_error}")
        self._out_schema = schema
        self._on_error = on_error
        super().__init__(paths,
                         file_extensions=self._FILE_EXTENSIONS, **kwargs)

    def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
        head = f.read(2)
        raw: io.RawIOBase
        if head == b"\x1f\x8b":
            raw = gzip.GzipFile(fileobj=_Prepend(head, f))  # type: ignore[assignment]
        else:
            raw = _Prepend(head, f)  # type: ignore[assignment]
        rows: list[dict] = []
        for lineno, line in enumerate(
                io.TextIOWrapper(io.BufferedReader(raw),
                                 encoding="utf-8"), start=1):
            line = line.strip()
            if not line:
                continue
            try:
                obj = json.loads(line)
                if not isinstance(obj, dict):
                    raise ValueError("line is not a JSON object")
            except ValueError as e:
                if self._on_error == "skip":
                    continue
                raise ValueError(
                    f"malformed JSONL at {path}:{lineno}: {e}") from e
            rows.append(obj)
            if len(rows) >= _BATCH_LINES:
                yield _rows_to_table(rows, self._out_schema)
                rows = []
        if rows:
            yield _rows_to_table(rows, self._out_schema)


class _Prepend(io.RawIOBase):
    """read(n) view replaying ``head`` before delegating to ``f``."""

    def __init__(self, head: bytes, f) -> None:
        super().__init__()
        self._head = head
        self._f = f

    def read(self, n: int = -1) -> bytes:
        if self._head:
            if n is None or n < 0:
                out, self._head = self._head, b""
                return out + self._f.read(n)
            out, self._head = self._head[:n], self._head[n:]
            if len(out) < n:
                out += self._f.read(n - len(out))
            return out
        return self._f.read(n)

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        data = self.read(len(b))
        b[: len(data)] = data
        return len(data)


def read_jsonl(paths, *, schema: pa.Schema = DOCUMENTS_SCHEMA,
               on_error: str = "raise", **kwargs) -> rd.Dataset:
    """Directory / file list of ``.jsonl[.gz]`` shards → Dataset."""
    return rd.read_datasource(
        JsonlDatasource(paths, schema=schema, on_error=on_error),
        **kwargs)
