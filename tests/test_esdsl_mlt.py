"""more_like_this and ids queries (operators/esdsl.py): rewrite shape,
like-by-_id fetch + exclusion, path bit-identity, msm percentage math.
"""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest

from research_engine_spark.corpus import synth_transcripts
from research_engine_spark.operators.esdsl import (
    ESQueryError,
    _Ctx,
    _mlt_rewrite,
    _msm_count,
    es_search,
)
from research_engine_spark.operators.indexer import build_index
from research_engine_spark.operators.scorer import IndexReader


@pytest.fixture(scope="module")
def mlt_setup(spark):
    tx = synth_transcripts(spark, n_convs=50, seed=33)
    d = tempfile.mkdtemp(prefix="mlt_idx_")
    build_index(tx, d, n_buckets=4)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _readers(spark, d):
    return (IndexReader(spark, d),
            IndexReader(spark, d, driver_local_max_postings=0,
                        driver_local_max_vocab=0))


def _pairs(df):
    pdf = df.select("doc_id", "score").toPandas()
    return list(zip(pdf["doc_id"].tolist(),
                    np.round(pdf["score"].to_numpy(np.float64), 10)))


def test_msm_count_forms():
    assert _msm_count(2, 10) == 2
    assert _msm_count("2", 10) == 2
    assert _msm_count("30%", 5) == 1   # floor(1.5)
    assert _msm_count("30%", 10) == 3
    assert _msm_count("100%", 7) == 7


def test_rewrite_shape_and_determinism(spark, mlt_setup):
    r = IndexReader(spark, mlt_setup)
    ctx = _Ctx(r, None, None)
    body = {"fields": ["text"], "like": "neural networks language model",
            "min_term_freq": 1, "min_doc_freq": 1, "max_query_terms": 3}
    rw = _mlt_rewrite(ctx, body)
    should = rw["bool"]["should"]
    assert len(should) == 3 and all("term" in c for c in should)
    # "30%" of 3 clauses floors to 0 -> no msm key emitted
    assert "minimum_should_match" not in rw["bool"]
    body7 = dict(body, max_query_terms=7)
    rw7 = _mlt_rewrite(ctx, body7)
    if len(rw7["bool"]["should"]) >= 4:
        assert rw7["bool"]["minimum_should_match"] >= 1
    # deterministic: same body -> same clause order
    assert _mlt_rewrite(ctx, body) == rw


def test_like_id_excludes_input_doc(spark, mlt_setup):
    r = IndexReader(spark, mlt_setup)
    body = {"query": {"more_like_this": {
        "like": [{"_id": 7}], "min_term_freq": 1, "min_doc_freq": 1,
        "max_query_terms": 10}}, "size": 50}
    hits = es_search(r, body).toPandas()
    assert 7 not in set(hits["doc_id"].tolist())
    # include: true keeps it (the input doc is maximally similar to
    # itself, so with generous params it must appear)
    body_inc = {"query": {"more_like_this": {
        "like": [{"_id": 7}], "min_term_freq": 1, "min_doc_freq": 1,
        "max_query_terms": 25, "include": True,
        "minimum_should_match": 1}}, "size": 50}
    hits_inc = es_search(r, body_inc).toPandas()
    assert 7 in set(hits_inc["doc_id"].tolist())


def test_mlt_paths_bit_identical(spark, mlt_setup):
    local, dist = _readers(spark, mlt_setup)
    body = {"query": {"more_like_this": {
        "like": "neural networks language model transformer",
        "min_term_freq": 1, "min_doc_freq": 2, "max_query_terms": 8}},
        "size": 10}
    assert _pairs(es_search(local, body)) == _pairs(es_search(dist, body))


def test_mlt_missing_or_bad_like(spark, mlt_setup):
    r = IndexReader(spark, mlt_setup)
    with pytest.raises(ESQueryError, match="needs 'like'"):
        es_search(r, {"query": {"more_like_this": {}}})
    with pytest.raises(ESQueryError, match="not found"):
        es_search(r, {"query": {"more_like_this": {
            "like": [{"_id": 10_000_000}]}}})
    with pytest.raises(ESQueryError, match="unsupported"):
        es_search(r, {"query": {"more_like_this": {"like": [17]}}})


def test_mlt_no_selectable_terms_matches_nothing(spark, mlt_setup):
    r = IndexReader(spark, mlt_setup)
    hits = es_search(r, {"query": {"more_like_this": {
        "like": "zzzqqqxxx notinvocab", "min_term_freq": 1}}})
    assert hits.count() == 0


def test_ids_query_both_paths(spark, mlt_setup):
    local, dist = _readers(spark, mlt_setup)
    body = {"query": {"ids": {"values": [3, 11, 10_000_000]}}, "size": 10}
    for r in (local, dist):
        got = sorted(_pairs(es_search(r, body)))
        assert got == [(3, 1.0), (11, 1.0)]
    with pytest.raises(ESQueryError, match="non-empty"):
        es_search(local, {"query": {"ids": {"values": []}}})


def test_ids_respects_tombstones(spark, mlt_setup):
    from research_engine_spark.operators.deletes import delete_ids

    d2 = tempfile.mkdtemp(prefix="mlt_del_")
    try:
        shutil.copytree(mlt_setup, d2, dirs_exist_ok=True)
        delete_ids(d2, [3])
        local, dist = _readers(spark, d2)
        body = {"query": {"ids": {"values": [3, 11]}}, "size": 10}
        for r in (local, dist):
            assert sorted(_pairs(es_search(r, body))) == [(11, 1.0)]
    finally:
        shutil.rmtree(d2, ignore_errors=True)
