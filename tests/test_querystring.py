"""query_string / simple_query_string front-ends
(operators/querystring.py): the Lucene text syntaxes compile onto the
JSON DSL, so a body using them must return the EXACT frame the
equivalent hand-written DSL body returns, on both evaluation paths."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest

from research_engine_spark.corpus import synth_transcripts
from research_engine_spark.operators.esdsl import (
    ESQueryError,
    es_count,
    es_search,
)
from research_engine_spark.operators.indexer import build_index
from research_engine_spark.operators.querystring import (
    parse_query_string,
    parse_simple_query_string,
)
from research_engine_spark.operators.scorer import IndexReader


@pytest.fixture(scope="module")
def qs_setup(spark):
    tx = synth_transcripts(spark, n_convs=60, seed=21)
    d = tempfile.mkdtemp(prefix="qs_idx_")
    build_index(tx, d, n_buckets=4, with_positions=True)
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


# ---------------------------------------------------------------------------
# compile shapes (driver-side, no Spark)
# ---------------------------------------------------------------------------

def test_qs_default_operator_and_explicit_ops():
    assert parse_query_string({"query": "a AND b"}) == {
        "bool": {"must": [{"match": {"text": {"query": "a"}}},
                          {"match": {"text": {"query": "b"}}}]}}
    # implicit operator follows default_operator
    assert parse_query_string(
        {"query": "a b", "default_operator": "and"}) == \
        parse_query_string({"query": "a && b"})
    assert parse_query_string({"query": "a OR b"}) == {
        "bool": {"should": [{"match": {"text": {"query": "a"}}},
                            {"match": {"text": {"query": "b"}}}],
                 "minimum_should_match": 1}}


def test_qs_precedence_not_and_or():
    # NOT > AND > OR (documented deviation from classic QP flattening)
    got = parse_query_string({"query": "a OR b AND NOT c"})
    assert got == {"bool": {"should": [
        {"match": {"text": {"query": "a"}}},
        {"bool": {"must": [{"match": {"text": {"query": "b"}}}],
                  "must_not": [{"match": {"text": {"query": "c"}}}]}},
    ], "minimum_should_match": 1}}


def test_qs_leaf_variants():
    assert parse_query_string({"query": "tabl*"}) == {
        "prefix": {"text": {"value": "tabl"}}}
    assert parse_query_string({"query": "t?ble"}) == {
        "wildcard": {"text": {"value": "t?ble"}}}
    assert parse_query_string({"query": "hash~"}) == {
        "match": {"text": {"query": "hash", "fuzziness": "AUTO"}}}
    assert parse_query_string({"query": '"a b"^2'}) == {
        "match_phrase": {"text": {"query": "a b", "boost": 2.0}}}
    assert parse_query_string({"query": "lang:en"}) == {
        "match": {"lang": {"query": "en"}}}
    assert parse_query_string({"query": "_exists_:lang"}) == {
        "exists": {"field": "lang"}}
    assert parse_query_string({"query": "n_chars:[100 TO 500]"}) == {
        "range": {"n_chars": {"gte": 100, "lte": 500}}}
    assert parse_query_string({"query": "n_chars:{1.5 TO *}"}) == {
        "range": {"n_chars": {"gt": 1.5}}}


def test_qs_field_group_scope_and_boost():
    got = parse_query_string({"query": "lang:(en OR de)^3"})
    assert got == {"bool": {
        "should": [{"match": {"lang": {"query": "en"}}},
                   {"match": {"lang": {"query": "de"}}}],
        "minimum_should_match": 1, "boost": 3.0}}


def test_qs_single_field_boost_folds_to_root():
    assert parse_query_string(
        {"query": "hash", "fields": ["text^3"]}) == {
        "match": {"text": {"query": "hash", "boost": 3.0}}}


def test_qs_multi_field_uses_multi_match():
    got = parse_query_string(
        {"query": 'hash "a b"', "fields": ["text^3", "role"]})
    assert got == {"bool": {"should": [
        {"multi_match": {"query": "hash", "fields": ["text^3", "role"],
                         "type": "best_fields"}},
        {"multi_match": {"query": "a b", "fields": ["text^3", "role"],
                         "type": "phrase"}},
    ], "minimum_should_match": 1}}


def test_sqs_fold_is_left_associative_equal_precedence():
    # a + b | c == ((a AND b) OR c) — the SimpleQueryParser fold
    got = parse_simple_query_string({"query": "a + b | c"})
    assert got == {"bool": {"should": [
        {"bool": {"must": [{"match": {"text": {"query": "a"}}},
                           {"match": {"text": {"query": "b"}}}]}},
        {"match": {"text": {"query": "c"}}},
    ], "minimum_should_match": 1}}


def test_sqs_negation_and_leaves():
    got = parse_simple_query_string(
        {"query": "-bad good", "default_operator": "and"})
    assert got == {"bool": {
        "must": [{"match": {"text": {"query": "good"}}}],
        "must_not": [{"match": {"text": {"query": "bad"}}}]}}
    assert parse_simple_query_string({"query": '"a b" | tabl*'}) == {
        "bool": {"should": [{"match_phrase": {"text": {"query": "a b"}}},
                            {"prefix": {"text": {"value": "tabl"}}}],
                 "minimum_should_match": 1}}


def test_parser_errors_are_loud():
    for bad in ({"query": '"a b"~2'}, {"query": "a~1"},
                {"query": "a AND"}, {"query": "(a b"},
                {"query": ""}):
        with pytest.raises(Exception):
            parse_query_string(bad)
    with pytest.raises(Exception):
        parse_simple_query_string({"query": "foo~2"})
    # through the DSL entry point the error type is ESQueryError
    with pytest.raises(ESQueryError):
        es_search(None, {"query": {"query_string": {"query": "a AND"}}})


# ---------------------------------------------------------------------------
# end-to-end identity vs hand-written DSL bodies (both paths)
# ---------------------------------------------------------------------------

def test_query_string_body_equals_dsl_body(spark, qs_setup):
    qs_body = {"query": {"query_string": {
        "query": '(neural networks) OR "neural networks"^2'}},
        "size": 10}
    dsl_body = {"query": {"bool": {"should": [
        {"bool": {"should": [
            {"match": {"text": {"query": "neural"}}},
            {"match": {"text": {"query": "networks"}}}],
            "minimum_should_match": 1}},
        {"match_phrase": {"text": {"query": "neural networks",
                                   "boost": 2.0}}},
    ], "minimum_should_match": 1}}, "size": 10}
    for r in _readers(spark, qs_setup):
        assert _pairs(es_search(r, qs_body)) == \
            _pairs(es_search(r, dsl_body))


def test_simple_query_string_and_not_semantics(spark, qs_setup):
    sqs_body = {"query": {"simple_query_string": {
        "query": "neural + networks + -loss"}}, "size": 10}
    dsl_body = {"query": {"bool": {
        "must": [{"match": {"text": {"query": "neural"}}},
                 {"match": {"text": {"query": "networks"}}}],
        "must_not": [{"match": {"text": {"query": "loss"}}}],
    }}, "size": 10}
    for r in _readers(spark, qs_setup):
        got = _pairs(es_search(r, sqs_body))
        assert got == _pairs(es_search(r, dsl_body))
        assert got  # non-degenerate on the synth corpus


def test_query_string_nested_inside_bool(spark, qs_setup):
    nested = {"query": {"bool": {"should": [
        {"query_string": {"query": '"neural networks"'}},
        {"match": {"text": {"query": "gradient"}}},
    ], "minimum_should_match": 1}}, "size": 10}
    flat = {"query": {"bool": {"should": [
        {"match_phrase": {"text": {"query": "neural networks"}}},
        {"match": {"text": {"query": "gradient"}}},
    ], "minimum_should_match": 1}}, "size": 10}
    for r in _readers(spark, qs_setup):
        assert _pairs(es_search(r, nested)) == _pairs(es_search(r, flat))


def test_es_count_with_query_string(spark, qs_setup):
    local, dist = _readers(spark, qs_setup)
    n_qs = es_count(local, {"query": {"query_string": {
        "query": "neural AND networks"}}})
    n_dsl = es_count(dist, {"query": {"bool": {"must": [
        {"match": {"text": {"query": "neural"}}},
        {"match": {"text": {"query": "networks"}}}]}}})
    assert n_qs == n_dsl > 0


def test_query_string_inside_rescore_and_filters_agg(spark, qs_setup):
    from research_engine_spark.operators.esdsl import es_aggregations

    local, dist = _readers(spark, qs_setup)
    # rescore_query as a query_string body
    qs_body = {"query": {"match": {"text": "neural"}},
               "rescore": {"window_size": 20, "query": {
                   "rescore_query": {"query_string": {
                       "query": '"neural networks"'}},
                   "rescore_query_weight": 2.0}}, "size": 10}
    flat_body = {"query": {"match": {"text": "neural"}},
                 "rescore": {"window_size": 20, "query": {
                     "rescore_query": {"match_phrase": {
                         "text": {"query": "neural networks"}}},
                     "rescore_query_weight": 2.0}}, "size": 10}
    for r in (local, dist):
        assert _pairs(es_search(r, qs_body)) == \
            _pairs(es_search(r, flat_body))
    # filters-agg clause as a simple_query_string
    sqs_clause = {"simple_query_string": {"query": "neural + networks"}}
    dsl_clause = {"bool": {"must": [
        {"match": {"text": {"query": "neural"}}},
        {"match": {"text": {"query": "networks"}}}]}}
    a = es_aggregations(local, {"aggs": {"f": {"filters": {
        "filters": {"both": sqs_clause}}}}}).collect()
    b = es_aggregations(local, {"aggs": {"f": {"filters": {
        "filters": {"both": dsl_clause}}}}}).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_sqs_degrades_instead_of_erroring():
    # ES contract: malformed operator structure never raises — it
    # degrades to a bag-of-words query; engine-unsupported features
    # (numeric fuzziness, phrase slop) stay loud
    assert parse_simple_query_string({"query": "(unclosed this"}) == \
        parse_simple_query_string({"query": "unclosed this"})
    assert parse_simple_query_string({"query": "a | | b"}) == \
        parse_simple_query_string({"query": "a | b"})
    with pytest.raises(Exception, match="fuzziness"):
        parse_simple_query_string({"query": "(broken foo~2"})
