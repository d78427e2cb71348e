"""WARC source: Common-Crawl-layout crawl archives → pages rows.

``read_warc(paths)`` is a file-parallel Ray Data source
(``FileBasedDatasource``): one read task per shard file, each task
streaming WARC records off the file handle and emitting Arrow blocks
of ``(url, warc_ts, http_status, html)`` — the pages-table contract,
so every downstream stage (boilerplate strip, outlinks, dedup, …)
composes unchanged. This is the ingestion path a real crawl corpus
needs: 100 TB of WARC is exactly a directory tree of ~1 GB ``.warc.gz``
shards, and file-granular read tasks are what lets the streaming
executor schedule and backpressure the scan.

Format handling (ISO 28500):

* per-record gzip members (the CC convention) or plain ``.warc`` —
  detected by magic bytes; ``gzip.GzipFile`` walks concatenated
  members transparently;
* records framed by a ``WARC/1.0`` header block, ``Content-Length``
  body, and a ``\\r\\n\\r\\n`` trailer; ``warcinfo``/``request``/
  ``metadata`` records are filtered out, ``response`` records keep
  the HTTP payload;
* HTTP bodies with ``Transfer-Encoding: chunked`` are de-chunked;
* a truncated record raises ``ValueError`` (a corrupt shard should
  fail its read task loudly and be retried/quarantined, not silently
  shorten the corpus).
"""

from __future__ import annotations

import gzip
from datetime import datetime, timezone
from typing import Iterator

import pyarrow as pa
import ray.data as rd
from ray.data.datasource import FileBasedDatasource

__all__ = ["WarcDatasource", "read_warc", "parse_warc", "parse_http",
           "WARC_SCHEMA"]

WARC_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("http_status", pa.int64()),
    ("html", pa.binary()),
])

_BATCH_RECORDS = 128


class _Stream:
    """Minimal buffered reader over any object with ``read(n)``."""

    def __init__(self, f, chunk: int = 1 << 16) -> None:
        self._f = f
        self._chunk = chunk
        self._buf = b""

    def read_until(self, sep: bytes) -> bytes | None:
        """Bytes up to (excluding) ``sep``; consumes the separator.
        None on clean EOF with no pending bytes; ValueError if EOF
        hits mid-record."""
        while True:
            i = self._buf.find(sep)
            if i >= 0:
                out, self._buf = self._buf[:i], self._buf[i + len(sep):]
                return out
            more = self._f.read(self._chunk)
            if not more:
                if self._buf.strip(b"\r\n"):
                    raise ValueError("truncated WARC header block")
                return None
            self._buf += more

    def read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            more = self._f.read(self._chunk)
            if not more:
                raise ValueError(
                    f"truncated WARC record body ({len(self._buf)}/{n} "
                    f"bytes)")
            self._buf += more
        out, self._buf = self._buf[:n], self._buf[n:]
        return out


def parse_warc(f) -> Iterator[tuple[dict[bytes, bytes], bytes]]:
    """Stream (headers, body) per record from a WARC file object."""
    head = f.read(2)
    if head == b"\x1f\x8b":
        f = gzip.GzipFile(fileobj=_Concat(head, f))
    else:
        f = _Concat(head, f)
    s = _Stream(f)
    while True:
        block = s.read_until(b"\r\n\r\n")
        if block is None:
            return
        block = block.lstrip(b"\r\n")
        if not block:
            continue
        lines = block.split(b"\r\n")
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0][:40]!r}")
        headers: dict[bytes, bytes] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().lower()] = v.strip()
        n = int(headers[b"content-length"])
        body = s.read_exact(n)
        s.read_exact(4)  # record trailer \r\n\r\n
        yield headers, body


class _Concat:
    """Re-prepends sniffed magic bytes to the underlying stream."""

    def __init__(self, head: bytes, f) -> None:
        self._head = head
        self._f = f

    def read(self, n: int = -1) -> bytes:
        if self._head:
            out, self._head = self._head, b""
            rest = self._f.read(n - len(out)) if n and n > 0 else \
                self._f.read(n)
            return out + rest
        return self._f.read(n)


def _dechunk(body: bytes) -> bytes:
    out = []
    pos = 0
    while True:
        i = body.find(b"\r\n", pos)
        if i < 0:
            raise ValueError("truncated chunked body")
        size = int(body[pos:i].split(b";")[0], 16)
        if size == 0:
            return b"".join(out)
        out.append(body[i + 2:i + 2 + size])
        pos = i + 2 + size + 2  # skip chunk + its \r\n


def parse_http(payload: bytes) -> tuple[int, bytes]:
    """HTTP response bytes → (status, body) with chunked decode."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        raise ValueError("HTTP payload missing header terminator")
    lines = head.split(b"\r\n")
    status = int(lines[0].split()[1])
    chunked = any(ln.lower().startswith(b"transfer-encoding") and
                  b"chunked" in ln.lower() for ln in lines[1:])
    return status, _dechunk(body) if chunked else body


def _warc_ts_us(v: bytes) -> int:
    dt = datetime.strptime(v.decode(), "%Y-%m-%dT%H:%M:%SZ")
    return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)


class WarcDatasource(FileBasedDatasource):
    """One read task per WARC shard; response records → pages rows."""

    _FILE_EXTENSIONS = ["warc", "warc.gz"]

    def __init__(self, paths, **kwargs):
        super().__init__(paths,
                         file_extensions=self._FILE_EXTENSIONS, **kwargs)

    def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
        rows: list[tuple[str, int, int, bytes]] = []
        for headers, body in parse_warc(f):
            if headers.get(b"warc-type") != b"response":
                continue
            status, html = parse_http(body)
            rows.append((headers[b"warc-target-uri"].decode(),
                         _warc_ts_us(headers[b"warc-date"]),
                         status, html))
            if len(rows) >= _BATCH_RECORDS:
                yield _to_table(rows)
                rows = []
        if rows:
            yield _to_table(rows)


def _to_table(rows) -> pa.Table:
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "http_status": pa.array([r[2] for r in rows], pa.int64()),
        "html": pa.array([r[3] for r in rows], pa.binary()),
    })


def read_warc(paths, **kwargs) -> rd.Dataset:
    """Directory / file list of ``.warc[.gz]`` shards → pages Dataset."""
    return rd.read_datasource(WarcDatasource(paths), **kwargs)
