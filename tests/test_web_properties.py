"""Hypothesis property tests for the web-branch engine pieces:
URL canonicalization, WARC framing, JBIG2-MMR, robots matching.
"""

import io

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf2dom_ray.engine.htmltext import canonical_url
from pdf2dom_ray.engine.jbig2 import decode_jbig2, encode_jbig2_mmr
from pdf2dom_ray.engine.robots import parse_robots
from pdf2dom_ray.sources.warc import parse_http, parse_warc
from pdf2dom_ray.synth.warcgen import doc_records

_path = st.text(
    alphabet=st.sampled_from("abcdefghij0123456789/.-_~"), max_size=30)


@settings(max_examples=200, deadline=None)
@given(_path)
def test_canonical_url_idempotent(href):
    base = "https://ex.com/dir/page"
    once = canonical_url(base, href)
    if once is not None:
        assert canonical_url(base, once) == once
        assert once.startswith(("http://", "https://"))
        assert "#" not in once


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32,
                                      max_codepoint=0x2FF),
               min_size=0, max_size=400),
       st.integers(min_value=0, max_value=10 ** 6))
def test_warc_roundtrip_any_text(text, doc_id):
    text = " ".join(text.split()) or "x"
    recs = doc_records(doc_id, text)
    out = list(parse_warc(io.BytesIO(b"".join(recs))))
    resp = [b for h, b in out if h[b"warc-type"] == b"response"]
    assert len(resp) == 1
    status, html = parse_http(resp[0])
    assert status == 200
    from pdf2dom_ray.synth.htmlgen import doc_to_html
    assert html == doc_to_html(doc_id, text)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=40),
       st.integers(min_value=0, max_value=2 ** 31 - 1))
def test_jbig2_mmr_roundtrip_random(h, w, seed):
    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w) < 0.4).astype(np.uint8)
    assert np.array_equal(decode_jbig2(encode_jbig2_mmr(img)), img)


@settings(max_examples=100, deadline=None)
@given(_path.map(lambda p: "/" + p))
def test_robots_default_allow_and_blanket_deny(path):
    assert parse_robots(b"", agent="x").allowed(path) is True
    deny = parse_robots(b"User-agent: *\nDisallow: /", agent="x")
    assert deny.allowed(path) is False
