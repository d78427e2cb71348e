"""WARC writer/reader: framing roundtrip, gzip members, chunked HTTP,
truncation errors, and the file-parallel Ray ingestion E2E.
"""

import gzip
import io

import pyarrow.parquet as pq
import pytest

from pdf2dom_ray.sources.warc import parse_http, parse_warc
from pdf2dom_ray.synth.htmlgen import doc_to_html
from pdf2dom_ray.synth.warcgen import (build_record, doc_records,
                                       warcinfo_record, write_warc_shards)


def _parse_all(data: bytes):
    return list(parse_warc(io.BytesIO(data)))


def test_roundtrip_plain():
    recs = [warcinfo_record("f.warc")] + doc_records(7, "alpha beta gamma")
    out = _parse_all(b"".join(recs))
    assert [h[b"warc-type"] for h, _ in out] == \
        [b"warcinfo", b"request", b"response"]
    h, body = out[2]
    assert h[b"warc-target-uri"] == b"https://docs.synth.test/7"
    status, html = parse_http(body)
    assert status == 200
    assert html == doc_to_html(7, "alpha beta gamma")


def test_roundtrip_gzip_members():
    recs = [warcinfo_record("f.warc.gz")] + doc_records(3, "one two") + \
        doc_records(4, "three four")
    data = b"".join(gzip.compress(r, mtime=0) for r in recs)
    out = _parse_all(data)
    assert len(out) == 5
    uris = [h.get(b"warc-target-uri") for h, _ in out
            if h[b"warc-type"] == b"response"]
    assert uris == [b"https://docs.synth.test/3",
                    b"https://docs.synth.test/4"]


def test_chunked_http_dechunk():
    payload = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
               b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n")
    assert parse_http(payload) == (200, b"hello world")


@pytest.mark.parametrize("cut", [10, 100, -6])
def test_truncated_record_raises(cut):
    data = b"".join(doc_records(1, "w1 w2 w3 w4 w5 w6 w7 w8 w9"))
    with pytest.raises(ValueError):
        _parse_all(data[:cut])


def test_non_warc_garbage_raises():
    with pytest.raises(ValueError):
        _parse_all(b"HTTP/1.1 200 OK\r\n\r\nnot a warc\r\n\r\n")


def test_writer_deterministic(tmp_path, sf_dir):
    a = write_warc_shards(sf_dir, str(tmp_path / "a"), n_shards=3)
    b = write_warc_shards(sf_dir, str(tmp_path / "b"), n_shards=3)
    import os
    for name in sorted(os.listdir(a)):
        if name.startswith("shard"):
            pa_ = open(os.path.join(a, name), "rb").read()
            pb_ = open(os.path.join(b, name), "rb").read()
            assert pa_ == pb_, name


def test_ray_warc_ingestion_e2e(ray_session, sf_dir, tmp_path):
    from pdf2dom_ray.pipelines.html_extract import extract_warc_main
    from pdf2dom_ray.sources.warc import read_warc

    out_dir = write_warc_shards(sf_dir, str(tmp_path / "warc"), n_shards=4)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()

    pages = read_warc(out_dir).to_pandas()
    assert len(pages) == len(docs)
    assert set(pages.http_status) == {200}
    by_url = dict(zip(pages.url, pages.html))
    for d, t in zip(docs.doc_id, docs.text):
        assert by_url[f"https://docs.synth.test/{d}"] == doc_to_html(d, t)

    main = extract_warc_main(out_dir).to_pandas()
    got = {u: t.replace("\n", " ") for u, t in zip(main.url, main.main_text)}
    exp = {f"https://docs.synth.test/{d}": t
           for d, t in zip(docs.doc_id, docs.text)}
    assert got == exp
