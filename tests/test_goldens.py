"""Committed-golden byte-identity: locks the serializer + kernel output
(the engine's equivalent of the reference's golden-HTML debug dumps,
TestUtils.java:25-40, made mandatory). Any change to serialization,
float formatting, box splitting or styling fails here loudly."""

import os

import pyarrow.parquet as pq
import pytest

from pdf2dom_ray.engine.parse import parse_document
from pdf2dom_ray.synth.corpus import doc_to_pdf

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
GOLDEN_IDS = (0, 3, 5, 2, 16)  # plain / image / embedded-font / rect / mix


@pytest.mark.parametrize("doc_id", GOLDEN_IDS)
def test_golden_byte_identity(doc_id, sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    text = t.column("text")[list(t.column("doc_id").to_pylist()).index(doc_id)].as_py()
    r = parse_document(doc_to_pdf(doc_id, text))
    assert r.error is None
    with open(os.path.join(GOLDEN_DIR, f"doc_{doc_id}.html")) as f:
        assert r.html_dom == f.read()
    with open(os.path.join(GOLDEN_DIR, f"doc_{doc_id}.txt")) as f:
        assert r.extracted_text == f.read()
