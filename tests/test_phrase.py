"""Phrase query tests (R3/R4): positional index vs oracle rank identity."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest

from research_engine_spark.corpus import synth_transcripts, transcripts_pandas
from research_engine_spark.operators.indexer import (
    build_index,
    decode_positions_block,
    encode_positions_block,
)
from research_engine_spark.operators.scorer import (
    IndexReader,
    bool_should_search,
    phrase_search,
    search,
)
from research_engine_spark.oracle import BM25Oracle


def test_positions_codec_roundtrip():
    rng = np.random.default_rng(5)
    lists = [np.sort(rng.choice(1000, size=rng.integers(0, 30),
                                replace=False)) for _ in range(128)]
    buf = encode_positions_block(lists)
    back = decode_positions_block(buf, len(lists))
    for a, b in zip(lists, back):
        assert np.array_equal(np.asarray(a, dtype=np.int64), b)


def test_positions_flat_codec_matches_per_posting():
    """The vectorized one-pass pack (r4) must be byte-identical to the
    per-posting encode_positions_block stream, slice at any posting
    boundary, and invert via decode_positions_flat."""
    from research_engine_spark.operators.indexer import (
        decode_positions_flat,
        encode_positions_flat,
    )

    rng = np.random.default_rng(7)
    lists = [np.sort(rng.choice(5000, size=int(rng.integers(1, 40)),
                                replace=False)).astype(np.int64)
             for _ in range(257)]
    counts = np.array([len(p) for p in lists], dtype=np.int64)
    flat = np.concatenate(lists)
    buf, pboff = encode_positions_flat(flat, counts)
    # whole-stream identity with the per-posting encoder
    assert buf == encode_positions_block(lists)
    # arbitrary posting-boundary slices are themselves valid blocks
    for s, e in [(0, 257), (0, 1), (10, 128), (200, 257)]:
        assert buf[pboff[s]:pboff[e]] == encode_positions_block(lists[s:e])
        back = decode_positions_block(buf[pboff[s]:pboff[e]], e - s)
        for a, b in zip(lists[s:e], back):
            assert np.array_equal(a, b)
    # flat decode over a concatenation of buffers
    flat_back = decode_positions_flat(
        [buf[pboff[0]:pboff[100]], buf[pboff[100]:pboff[257]]], counts)
    assert np.array_equal(flat_back, flat)


@pytest.fixture(scope="module")
def pos_index(spark):
    tx = synth_transcripts(spark, n_convs=60, seed=21)
    d = tempfile.mkdtemp()
    build_index(tx, d, n_buckets=4, with_positions=True)
    # budget 0: these tests cover the DISTRIBUTED phrase/bool machinery
    # (test_driver_local.py covers the driver-local twin bit-for-bit)
    yield IndexReader(spark, d, driver_local_max_postings=0)
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def pos_oracle():
    return BM25Oracle(transcripts_pandas(n_convs=60, seed=21))


PHRASES = [
    "neural networks",          # common bigram (planted by the generator)
    "machine learning",
    "the neural",
    "natural language processing",
    "neural neural",            # duplicate-term phrase
    "nonexistentterm networks",  # absent term -> empty
]


@pytest.mark.parametrize("phrase", PHRASES)
def test_phrase_rank_identity(pos_index, pos_oracle, phrase):
    eng = phrase_search(pos_index, phrase, k=10).toPandas()
    ora = pos_oracle.phrase_search(phrase, k=10)
    assert list(eng["doc_id"]) == list(ora["doc_id"]), phrase
    assert np.allclose(eng["score"], ora["score"], rtol=0, atol=0), phrase


def test_phrase_stricter_than_bag(pos_index, pos_oracle):
    """Every phrase match must also be a bag-of-words match, not vice
    versa; at least one query must demonstrate the strict subset."""
    bag = set(search(pos_index, "neural networks", k=10000,
                     with_text=False).toPandas()["doc_id"])
    ph = set(phrase_search(pos_index, "neural networks",
                           k=10000).toPandas()["doc_id"])
    assert ph <= bag
    assert len(ph) < len(bag)
    assert len(ph) > 0


@pytest.mark.parametrize("query", ["neural networks", "machine learning"])
def test_bool_should_rank_identity(pos_index, pos_oracle, query):
    eng = bool_should_search(pos_index, query, k=10).toPandas()
    ora = pos_oracle.bool_should_search(query, k=10)
    assert list(eng["doc_id"]) == list(ora["doc_id"]), query
    assert np.allclose(eng["score"], ora["score"], rtol=0, atol=0), query


def test_phrase_requires_positional_index(reader):
    with pytest.raises(ValueError, match="positions"):
        phrase_search(reader, "neural networks", k=5)


def test_phrase_custom_params(pos_index, pos_oracle):
    eng = phrase_search(pos_index, "neural networks", k=5,
                        k1=0.9, b=0.4).toPandas()
    ora = pos_oracle.phrase_search("neural networks", k=5, k1=0.9, b=0.4)
    assert list(eng["doc_id"]) == list(ora["doc_id"])
    assert np.allclose(eng["score"], ora["score"], rtol=0, atol=0)
