"""Varbyte/delta codec property tests (SURVEY.md §5 item 4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from research_engine_spark.operators.codec import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    vb_decode,
    vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**56), max_size=300))
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(arr)), arr)


@given(st.sets(st.integers(min_value=0, max_value=10**12), max_size=300))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip_monotone(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    gaps = delta_encode(arr)
    assert np.array_equal(delta_decode(gaps), arr)
    if arr.size > 1:
        assert (gaps[1:] >= 1).all()  # strictly increasing input -> gaps >= 1


def test_empty():
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


def test_postings_roundtrip():
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(10**9, size=1000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 100, 1000)
    dls = rng.integers(1, 400, 1000)
    g, t, d = encode_postings(ids, tfs, dls)
    i2, t2, d2 = decode_postings(g, t, d)
    assert np.array_equal(i2, ids)
    assert np.array_equal(t2, tfs)
    assert np.array_equal(d2, dls)


def test_compression_is_compact():
    # dense gaps of ~small magnitude should take ~1-2 bytes per id
    ids = np.arange(0, 100000, 7, dtype=np.int64)
    enc = vb_encode(delta_encode(ids))
    assert len(enc) < ids.size * 2 + 8
