"""MQ arithmetic coder (engine/mq.py) — round-trip + table invariants.

No external JBIG2/JPX codec exists in this container, so the locked
property is encoder/decoder self-consistency (like the JPEG and CCITT
codec pairs) plus structural checks on the published state table.
"""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf2dom_ray.engine.mq import MQDecoder, MQEncoder, QE, new_contexts


def roundtrip(bits, labels, n_ctx):
    enc = MQEncoder()
    cx = new_contexts(n_ctx)
    for b, lab in zip(bits, labels):
        enc.encode(cx, lab, b)
    data = enc.flush()
    dec = MQDecoder(data)
    cx2 = new_contexts(n_ctx)
    out = [dec.decode(cx2, lab) for lab in labels]
    return out, data


def test_qe_table_structure():
    assert len(QE) == 47
    for i, (qe, nmps, nlps, switch) in enumerate(QE):
        assert 0 < qe <= 0x5601
        assert 0 <= nmps < 47 and 0 <= nlps < 47
        assert switch in (0, 1)
    # SWITCH only on the three fast-attack states with Qe = 0x5601
    assert [i for i, r in enumerate(QE) if r[3]] == [0, 6, 14]
    # state 46 is the non-adaptive state (self-loop)
    assert QE[46][1] == 46 and QE[46][2] == 46


def test_empty_stream():
    enc = MQEncoder()
    data = enc.flush()
    dec = MQDecoder(data)
    cx = new_contexts(1)
    # decoding from a terminated stream yields *some* bits without error
    for _ in range(16):
        assert dec.decode(cx, 0) in (0, 1)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("p_one", [0.02, 0.5, 0.9])
def test_roundtrip_random(seed, p_one):
    rng = random.Random(seed)
    n = 4000
    bits = [1 if rng.random() < p_one else 0 for _ in range(n)]
    labels = [rng.randrange(16) for _ in range(n)]
    out, data = roundtrip(bits, labels, 16)
    assert out == bits
    # skewed streams must compress
    if p_one == 0.02:
        assert len(data) < n // 8


def test_roundtrip_all_zero_and_all_one():
    for bit in (0, 1):
        bits = [bit] * 1000
        out, data = roundtrip(bits, [0] * 1000, 1)
        assert out == bits
        assert len(data) < 32      # constant streams compress hard


def test_roundtrip_alternating():
    bits = [i & 1 for i in range(997)]
    out, _ = roundtrip(bits, [0] * 997, 1)
    assert out == bits


def test_stuffed_bytes_handled():
    # long runs force renormalizations that exercise BYTEOUT carry /
    # 0xFF stuffing; verify any 0xFF in the stream is followed by <=0x8F
    rng = random.Random(7)
    bits, labels = [], []
    for _ in range(300):
        run = rng.randrange(1, 40)
        b = rng.randrange(2)
        bits += [b] * run
        labels += [0] * run
    out, data = roundtrip(bits, labels, 1)
    assert out == bits
    for i in range(len(data) - 1):
        if data[i] == 0xFF:
            assert data[i + 1] <= 0x8F


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 7)),
                max_size=600))
def test_roundtrip_property(pairs):
    bits = [b for b, _ in pairs]
    labels = [l for _, l in pairs]
    out, _ = roundtrip(bits, labels, 8)
    assert out == bits
