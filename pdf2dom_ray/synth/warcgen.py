"""Deterministic WARC/1.0 shard writer for the synthetic corpus.

Renders each ``documents`` row's synthetic HTML page (synth/htmlgen.py)
as a Common-Crawl-layout WARC file set: per-record gzip members
(ISO 28500 §D / the CC convention — a ``.warc.gz`` is a concatenation
of independently-gzipped records, so readers can split at member
boundaries), one ``warcinfo`` record per file, and a ``request`` +
``response`` record pair per page (readers must filter record types,
exactly as with real crawl data).

Everything is a pure function of (doc_id, text): record IDs are
md5(url), WARC-Date is the corpus ``warc_ts`` (whole seconds, so the
second-granularity WARC date format roundtrips exactly), shard
assignment is ``doc_id % n_shards`` with doc_id-sorted order inside a
shard. Re-running the writer produces byte-identical files.
"""

from __future__ import annotations

import gzip
import hashlib
import os
from datetime import datetime, timezone

__all__ = ["WARCGEN_VERSION", "build_record", "doc_records",
           "write_warc_shards"]

WARCGEN_VERSION = 1

_SOFTWARE = b"pdf2dom-ray-synth/1.0"


def _warc_date(ts_us: int) -> bytes:
    dt = datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ").encode()


def _record_id(url: str, kind: str) -> bytes:
    h = hashlib.md5(f"{kind}:{url}".encode()).hexdigest()
    return (f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-"
            f"{h[20:32]}>").encode()


def build_record(warc_type: bytes, headers: list[tuple[bytes, bytes]],
                 body: bytes) -> bytes:
    lines = [b"WARC/1.0", b"WARC-Type: " + warc_type]
    lines += [k + b": " + v for k, v in headers]
    lines.append(b"Content-Length: " + str(len(body)).encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + body + b"\r\n\r\n"


def warcinfo_record(filename: str) -> bytes:
    body = (b"software: " + _SOFTWARE +
            b"\r\nformat: WARC File Format 1.0\r\n")
    return build_record(b"warcinfo", [
        (b"WARC-Record-ID", _record_id(filename, "info")),
        (b"WARC-Date", _warc_date(0)),
        (b"WARC-Filename", filename.encode()),
        (b"Content-Type", b"application/warc-fields"),
    ], body)


def doc_records(doc_id: int, text: str) -> list[bytes]:
    """The request + response record pair for one document."""
    from .corpus import URL_PREFIX, _EPOCH_US
    from .htmlgen import doc_to_html

    url = f"{URL_PREFIX}{doc_id}"
    ts = _EPOCH_US + doc_id * 1_000_000
    html = doc_to_html(doc_id, text)

    req_http = (b"GET /" + str(doc_id).encode() + b" HTTP/1.1\r\n"
                b"Host: docs.synth.test\r\n"
                b"User-Agent: " + _SOFTWARE + b"\r\n\r\n")
    request = build_record(b"request", [
        (b"WARC-Record-ID", _record_id(url, "request")),
        (b"WARC-Date", _warc_date(ts)),
        (b"WARC-Target-URI", url.encode()),
        (b"Content-Type", b"application/http; msgtype=request"),
    ], req_http)

    resp_http = (b"HTTP/1.1 200 OK\r\n"
                 b"Content-Type: text/html; charset=utf-8\r\n"
                 b"Content-Length: " + str(len(html)).encode() +
                 b"\r\n\r\n" + html)
    response = build_record(b"response", [
        (b"WARC-Record-ID", _record_id(url, "response")),
        (b"WARC-Date", _warc_date(ts)),
        (b"WARC-Target-URI", url.encode()),
        (b"Content-Type", b"application/http; msgtype=response"),
    ], resp_http)
    return [request, response]


def _gz_member(record: bytes) -> bytes:
    # mtime=0 for byte-determinism across runs
    return gzip.compress(record, compresslevel=6, mtime=0)


def _write_shard(path: str, rows: list[tuple[int, str]],
                 compress: bool) -> None:
    name = os.path.basename(path)
    parts = [warcinfo_record(name)]
    for doc_id, text in sorted(rows):
        parts.extend(doc_records(doc_id, text))
    if compress:
        data = b"".join(_gz_member(r) for r in parts)
    else:
        data = b"".join(parts)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def write_warc_shards(sf_dir: str, out_dir: str, *, n_shards: int = 8,
                      compress: bool = True) -> str:
    """documents.parquet → ``out_dir/shard-NNNNN.warc[.gz]``.

    Idempotent (keyed by a ``_DONE`` marker); shard writes run as Ray
    tasks when a cluster is up, else sequentially.
    """
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    shards: list[list[tuple[int, str]]] = [[] for _ in range(n_shards)]
    for d, x in zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()):
        shards[d % n_shards].append((d, x))

    ext = ".warc.gz" if compress else ".warc"
    jobs = [(os.path.join(out_dir, f"shard-{i:05d}{ext}"), rows)
            for i, rows in enumerate(shards) if rows]

    import ray
    if ray.is_initialized():
        task = ray.remote(num_cpus=1)(_write_shard)
        ray.get([task.remote(p, rows, compress) for p, rows in jobs])
    else:
        for p, rows in jobs:
            _write_shard(p, rows, compress)
    with open(done, "w") as f:
        f.write(str(WARCGEN_VERSION))
    return out_dir
