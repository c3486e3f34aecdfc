"""ES ``script_score`` (operators/esdsl.py + functions/painless.py):
the documented Painless subset compiled to numpy (serving tier) and to
ONE Catalyst expression (distributed), plus script functions inside
``function_score``. The reference drives ES with stock relevance
bodies (retrieval/es_search_final.py:12-37); script_score is the ES
escape hatch those bodies compose with, so the engine executes it
natively. Expectations are recomputed manually from the engine's own
match primitives (BM25 itself is oracle-checked elsewhere)."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from research_engine_spark.corpus import synth_transcripts
from research_engine_spark.functions.painless import (
    PainlessError,
    doc_fields,
    is_exact,
    parse_script,
    to_numpy,
    uses_score,
)
from research_engine_spark.operators.esdsl import ESQueryError, es_search
from research_engine_spark.operators.indexer import build_index
from research_engine_spark.operators.scorer import IndexReader

Q = "neural networks"


@pytest.fixture(scope="module")
def ss_setup(spark):
    tx = (synth_transcripts(spark, n_convs=60, seed=47)
          .withColumn("n_chars", F.length("text").cast("long")))
    d = tempfile.mkdtemp(prefix="esdsl_ss_idx_")
    build_index(tx, d, n_buckets=4, stored_fields=["n_chars"])
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _readers(spark, d):
    """(driver-local-enabled, distributed-pinned) reader pair."""
    return (IndexReader(spark, d),
            IndexReader(spark, d, driver_local_max_postings=0,
                        driver_local_max_vocab=0))


def _pairs(df, ndigits=10):
    pdf = df.select("doc_id", "score").toPandas()
    return sorted(zip(pdf["doc_id"].tolist(),
                      np.round(pdf["score"].to_numpy(np.float64),
                               ndigits)))


def _exact_pairs(df):
    pdf = df.select("doc_id", "score").toPandas()
    return sorted(zip(pdf["doc_id"].tolist(),
                      pdf["score"].to_numpy(np.float64)))


# ---------------------------------------------------------------------------
# parser / numpy backend units
# ---------------------------------------------------------------------------

def test_parse_precedence_and_fold():
    fn = to_numpy(parse_script("1 + 2 * 3 - 4 / 2"))
    s = np.zeros(1)
    assert fn(s, {})[0] == 5.0
    fn = to_numpy(parse_script("-(params.a + 1) * _score", {"a": 2}))
    assert fn(np.array([2.0]), {})[0] == -6.0


def test_parse_doc_and_helpers():
    ast = parse_script(
        "saturation(doc['n_chars'].value, 50) + sigmoid(_score, 2, 1)")
    assert doc_fields(ast) == ["n_chars"]
    assert uses_score(ast)
    assert not is_exact(ast)  # sigmoid is transcendental
    assert is_exact(parse_script(
        "Math.max(Math.sqrt(Math.abs(_score)), saturation(_score, 1))"))
    got = to_numpy(parse_script("saturation(_score, 1.0)"))(
        np.array([1.0, 3.0]), {})
    np.testing.assert_array_equal(got, [0.5, 0.75])


@pytest.mark.parametrize("src,msg", [
    ("foo(1)", "not whitelisted"),
    ("params.missing", "missing script param"),
    ("doc['a'].size", "doc['f'].value"),
    ("1 +", "unexpected end"),
    ("Math.pow(1)", "takes 2 args"),
    ("_score _score", "trailing tokens"),
    ("doc[n_chars].value", "expected"),
])
def test_parse_errors(src, msg):
    with pytest.raises(PainlessError, match=msg.replace("[", "\\[")
                       .replace("(", "\\(").replace(")", "\\)")):
        parse_script(src)


# ---------------------------------------------------------------------------
# es_search integration
# ---------------------------------------------------------------------------

def test_exact_script_bit_identical_across_paths(spark, ss_setup):
    serve, dist = _readers(spark, ss_setup)
    body = {"query": {"script_score": {
        "query": {"match": {"text": Q}},
        "script": {"source": "saturation(_score, params.pivot) * 3 + 1",
                   "params": {"pivot": 2.0}},
        "boost": 1.5}},
        "size": 400}
    a = _exact_pairs(es_search(serve, body))
    b = _exact_pairs(es_search(dist, body))
    assert a == b and len(a) > 0
    # manual expectation from the inner match's own scores
    base = dict(_exact_pairs(es_search(
        dist, {"query": {"match": {"text": Q}}, "size": 400})))
    want = sorted((i, (s / (s + 2.0) * 3 + 1) * 1.5)
                  for i, s in base.items())
    np.testing.assert_allclose([s for _, s in a], [s for _, s in want],
                               rtol=1e-12)


def test_doc_field_script_matches_manual(spark, ss_setup):
    serve, dist = _readers(spark, ss_setup)
    body = {"query": {"script_score": {
        "query": {"match": {"text": Q}},
        "script": {
            "source": "_score + Math.sqrt(doc['n_chars'].value) / 10"}}},
        "size": 400}
    got = _pairs(es_search(dist, body))
    # doc-field scripts decline the serving tier but must agree anyway
    assert _pairs(es_search(serve, body)) == got
    base = dict(_exact_pairs(es_search(
        dist, {"query": {"match": {"text": Q}}, "size": 400})))
    nch = (IndexReader(spark, ss_setup).docs
           .select("doc_id", "n_chars").toPandas()
           .set_index("doc_id")["n_chars"])
    want = sorted((i, round(s + np.sqrt(float(nch[i])) / 10, 10))
                  for i, s in base.items())
    assert got == want


def test_transcendental_script_distributed_on_both_paths(spark, ss_setup):
    serve, dist = _readers(spark, ss_setup)
    body = {"query": {"script_score": {
        "query": {"match": {"text": Q}},
        "script": {"source": "Math.log(1 + _score)"}}},
        "size": 400}
    a = _exact_pairs(es_search(serve, body))
    b = _exact_pairs(es_search(dist, body))
    assert a == b and len(a) > 0  # both took the distributed path
    base = dict(_exact_pairs(es_search(
        dist, {"query": {"match": {"text": Q}}, "size": 400})))
    want = sorted((i, np.log1p(s)) for i, s in base.items())
    np.testing.assert_allclose([s for _, s in a], [s for _, s in want],
                               rtol=1e-12)


def test_min_score_excludes_on_boosted_score(spark, ss_setup):
    _, dist = _readers(spark, ss_setup)
    full = _exact_pairs(es_search(dist, {"query": {"script_score": {
        "query": {"match": {"text": Q}},
        "script": {"source": "_score"}, "boost": 2.0}}, "size": 400}))
    cut = sorted(s for _, s in full)[len(full) // 2]
    got = _exact_pairs(es_search(dist, {"query": {"script_score": {
        "query": {"match": {"text": Q}},
        "script": {"source": "_score"}, "boost": 2.0,
        "min_score": cut}}, "size": 400}))
    assert got == [p for p in full if p[1] >= cut]
    assert 0 < len(got) < len(full)


def test_script_score_composes_inside_bool(spark, ss_setup):
    serve, dist = _readers(spark, ss_setup)
    body = {"query": {"bool": {
        "should": [
            {"script_score": {"query": {"match": {"text": Q}},
                              "script": {"source": "_score * 0.5"}}},
            {"term": {"text": {"value": "neural", "boost": 0.25}}},
        ], "minimum_should_match": 1}}, "size": 400}
    assert _exact_pairs(es_search(serve, body)) \
        == _exact_pairs(es_search(dist, body))


def test_function_score_script_function(spark, ss_setup):
    serve, dist = _readers(spark, ss_setup)
    body = {"query": {"function_score": {
        "query": {"match": {"text": Q}},
        "functions": [{"script_score": {"script": {
            "source": "saturation(doc['n_chars'].value, 100)"}},
            "weight": 2.0}],
        "boost_mode": "sum"}}, "size": 400}
    got = _pairs(es_search(dist, body))
    assert _pairs(es_search(serve, body)) == got
    base = dict(_exact_pairs(es_search(
        dist, {"query": {"match": {"text": Q}}, "size": 400})))
    nch = (IndexReader(spark, ss_setup).docs
           .select("doc_id", "n_chars").toPandas()
           .set_index("doc_id")["n_chars"])
    want = sorted(
        (i, round(s + 2.0 * (float(nch[i]) / (float(nch[i]) + 100)), 10))
        for i, s in base.items())
    assert got == want


def test_script_score_errors(spark, ss_setup):
    reader = IndexReader(spark, ss_setup)
    cases = [
        ({"script_score": {"query": {"match": {"text": Q}}}},
         "needs 'query' and 'script'"),
        ({"script_score": {"query": {"match": {"text": Q}},
                           "script": {"source": "_score"},
                           "unknown": 1}},
         "unsupported script_score keys"),
        ({"script_score": {"query": {"match": {"text": Q}},
                           "script": {"source": "frob(_score)"}}},
         "not whitelisted"),
        ({"script_score": {"query": {"match": {"text": Q}},
                           "script": {"source": "_score",
                                      "lang": "expression"}}},
         "unsupported script lang"),
        ({"script_score": {"query": {"match": {"text": Q}},
                           "script": {"source": "doc['nope'].value"}}},
         "not in docs table"),
        ({"function_score": {"query": {"match": {"text": Q}},
                             "functions": [{"script_score": {
                                 "script": "_score", "extra": 1}}]}},
         "function script_score needs exactly"),
    ]
    for body, msg in cases:
        with pytest.raises(ESQueryError, match=msg.replace("[", "\\[")
                           .replace("(", "\\(").replace(")", "\\)")):
            es_search(reader, {"query": body, "size": 5}).collect()
