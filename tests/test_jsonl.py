"""JSONL source: gz/plain framing, schema projection, error policy,
writer determinism, and the Ray E2E roundtrip vs documents.parquet."""

import glob
import gzip
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _shards(tmp_path):
    from pdf2dom_ray.synth.jsonlgen import write_jsonl_shards
    return write_jsonl_shards(SF, str(tmp_path / "jsonl"))


def test_roundtrip_reproduces_documents(ray_session, tmp_path):
    from pdf2dom_ray.sources.jsonl import read_jsonl
    got = read_jsonl(_shards(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = pq.read_table(f"{SF}/documents.parquet").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == ["doc_id", "text", "lang", "source",
                                 "n_chars"]
    for c in want.columns:
        assert list(got[c]) == list(want[c]), c


def test_writer_deterministic(tmp_path):
    a = _shards(tmp_path)
    from pdf2dom_ray.synth.jsonlgen import write_jsonl_shards
    b = write_jsonl_shards(SF, str(tmp_path / "again"))
    fa = sorted(glob.glob(os.path.join(a, "*.jsonl.gz")))
    fb = sorted(glob.glob(os.path.join(b, "*.jsonl.gz")))
    assert [os.path.basename(p) for p in fa] == \
        [os.path.basename(p) for p in fb]
    for pa_, pb in zip(fa, fb):
        assert open(pa_, "rb").read() == open(pb, "rb").read()


def test_plain_and_missing_fields(ray_session, tmp_path):
    from pdf2dom_ray.sources.jsonl import read_jsonl
    p = tmp_path / "x.jsonl"
    p.write_text(json.dumps({"doc_id": 1, "text": "a"}) + "\n\n" +
                 json.dumps({"doc_id": 2, "text": "b",
                             "lang": "en", "source": "s",
                             "n_chars": 1}) + "\n")
    got = read_jsonl(str(p)).to_pandas().sort_values("doc_id")
    assert list(got["doc_id"]) == [1, 2]
    assert got["lang"].isna().tolist() == [True, False]


def test_malformed_line_raises_and_skip_path(ray_session, tmp_path):
    from pdf2dom_ray.sources.jsonl import read_jsonl
    p = tmp_path / "bad.jsonl.gz"
    body = (json.dumps({"doc_id": 1, "text": "a"}) + "\n"
            + "{oops\n"
            + json.dumps({"doc_id": 3, "text": "c"}) + "\n")
    with gzip.open(p, "wb") as f:
        f.write(body.encode())
    with pytest.raises(Exception, match="bad.jsonl.gz:2"):
        read_jsonl(str(p)).materialize()
    got = read_jsonl(str(p), on_error="skip").to_pandas()
    assert sorted(got["doc_id"]) == [1, 3]


def test_custom_schema(ray_session, tmp_path):
    from pdf2dom_ray.sources.jsonl import read_jsonl
    p = tmp_path / "c.jsonl"
    p.write_text(json.dumps({"url": "https://a.test/", "score": 7})
                 + "\n")
    schema = pa.schema([("url", pa.string()), ("score", pa.int64())])
    got = read_jsonl(str(p), schema=schema).to_pandas()
    assert got.iloc[0]["url"] == "https://a.test/"
    assert got.iloc[0]["score"] == 7
