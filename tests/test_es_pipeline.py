"""ES pipeline aggregations (operators/esdsl.py): parent pipelines
(derivative, cumulative_sum, bucket_script, bucket_selector,
bucket_sort) and sibling pipelines (avg/sum/min/max/stats_bucket)
over the bucket frame, checked against pandas recomputation."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
import pytest

from research_engine_spark.corpus import synth_transcripts
from research_engine_spark.operators.esdsl import (
    ESQueryError,
    es_aggregations,
)
from research_engine_spark.operators.indexer import build_index
from research_engine_spark.operators.scorer import IndexReader


@pytest.fixture(scope="module")
def pipe_setup(spark):
    tx = synth_transcripts(spark, n_convs=40, seed=11)
    d = tempfile.mkdtemp(prefix="pipe_idx_")
    build_index(tx, d, n_buckets=4)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs_pd(spark, d) -> pd.DataFrame:
    return IndexReader(spark, d).docs.toPandas()


def test_derivative_and_cumulative_sum(spark, pipe_setup):
    r = IndexReader(spark, pipe_setup)
    out = es_aggregations(r, {"aggs": {"per_min": {
        "date_histogram": {"field": "ts", "calendar_interval": "minute"},
        "aggs": {"d": {"derivative": {"buckets_path": "_count"}},
                 "cs": {"cumulative_sum": {"buckets_path": "_count"}}},
    }}}).toPandas()
    assert len(out) > 3  # the synth corpus spans many minutes
    # buckets ascending; derivative = diff, first NULL; cs = running sum
    assert list(out["key"]) == sorted(out["key"])
    counts = out["doc_count"].to_numpy(float)
    assert pd.isna(out["d"].iloc[0])
    assert list(out["d"].iloc[1:]) == list(counts[1:] - counts[:-1])
    assert list(out["cs"]) == list(counts.cumsum())


def test_derivative_requires_ordered_parent(spark, pipe_setup):
    r = IndexReader(spark, pipe_setup)
    with pytest.raises(ESQueryError, match="ordered histogram"):
        es_aggregations(r, {"aggs": {"by_role": {
            "terms": {"field": "role"},
            "aggs": {"d": {"derivative": {"buckets_path": "_count"}}},
        }}})


def test_bucket_script_selector_sort(spark, pipe_setup):
    r = IndexReader(spark, pipe_setup)
    out = es_aggregations(r, {"aggs": {"by_role": {
        "terms": {"field": "role"},
        "aggs": {
            "tsum": {"sum": {"field": "turn_idx"}},
            "per_doc": {"bucket_script": {
                "buckets_path": {"c": "tsum", "n": "_count"},
                "script": "params.c / params.n"}},
            "keep": {"bucket_selector": {
                "buckets_path": {"n": "_count"},
                "script": "params.n > 5"}},
            "srt": {"bucket_sort": {
                "sort": [{"per_doc": {"order": "desc"}}], "size": 2}},
        }}}}).toPandas()
    docs = _docs_pd(spark, pipe_setup)
    want = (docs.groupby("role")
            .agg(doc_count=("doc_id", "size"), tsum=("turn_idx", "sum"))
            .reset_index())
    want["per_doc"] = want["tsum"] / want["doc_count"]
    want = (want[want["doc_count"] > 5]
            .sort_values(["per_doc", "role"], ascending=[False, True])
            .head(2))
    assert list(out["key"]) == list(want["role"])
    assert list(out["per_doc"]) == list(want["per_doc"])
    assert list(out["doc_count"]) == list(want["doc_count"])


def test_sibling_pipelines_constant_columns(spark, pipe_setup):
    r = IndexReader(spark, pipe_setup)
    out = es_aggregations(r, {"aggs": {
        "by_role": {"terms": {"field": "role"},
                    "aggs": {"tsum": {"sum": {"field": "turn_idx"}}}},
        "mean_t": {"avg_bucket": {"buckets_path": "by_role>tsum"}},
        "st": {"stats_bucket": {"buckets_path": "by_role>_count"}},
    }}).toPandas()
    docs = _docs_pd(spark, pipe_setup)
    grp = docs.groupby("role").agg(n=("doc_id", "size"),
                                   tsum=("turn_idx", "sum"))
    assert set(out["mean_t"]) == {grp["tsum"].mean()}
    assert set(out["st_count"]) == {float(len(grp))}
    assert set(out["st_min"]) == {float(grp["n"].min())}
    assert set(out["st_max"]) == {float(grp["n"].max())}
    assert set(out["st_sum"]) == {float(grp["n"].sum())}
    # bucket rows unchanged underneath
    assert sorted(out["key"]) == sorted(grp.index)


def test_sibling_after_selector_sees_surviving_buckets(spark,
                                                       pipe_setup):
    r = IndexReader(spark, pipe_setup)
    out = es_aggregations(r, {"aggs": {
        "by_role": {"terms": {"field": "role"}, "aggs": {
            "keep": {"bucket_selector": {
                "buckets_path": {"n": "_count"},
                # keep only the strictly-largest bucket
                "script": "params.n >= 249"}}}},
        "tot": {"sum_bucket": {"buckets_path": "by_role>_count"}},
    }}).toPandas()
    assert len(out) >= 1
    assert set(out["tot"]) == {float(out["doc_count"].sum())}


def test_pipeline_errors(spark, pipe_setup):
    r = IndexReader(spark, pipe_setup)
    base = {"terms": {"field": "role"}}
    with pytest.raises(ESQueryError, match="buckets_path"):
        es_aggregations(r, {"aggs": {"b": {
            "histogram": {"field": "turn_idx", "interval": 10},
            "aggs": {"x": {"derivative": {"buckets_path": "nope"}}}}}})
    with pytest.raises(ESQueryError, match="script"):
        es_aggregations(r, {"aggs": {"b": {**base, "aggs": {
            "x": {"bucket_script": {
                "buckets_path": {"n": "_count"},
                "script": "__import__('os')"}}}}}})
    with pytest.raises(ESQueryError, match="top_hits"):
        es_aggregations(r, {"aggs": {"b": {**base, "aggs": {
            "x": {"cumulative_sum": {"buckets_path": "_count"}},
            "h": {"top_hits": {"size": 1}}}}}})
    with pytest.raises(ESQueryError, match="single-level"):
        es_aggregations(r, {"aggs": {"b": {**base, "aggs": {
            "inner": {"terms": {"field": "role"}},
            "x": {"cumulative_sum": {"buckets_path": "_count"}}}}}})
    with pytest.raises(ESQueryError, match="head"):
        es_aggregations(r, {"aggs": {
            "b": base,
            "s": {"avg_bucket": {"buckets_path": "other>_count"}}}})
    with pytest.raises(ESQueryError, match="bucket agg"):
        es_aggregations(r, {"aggs": {
            "m": {"avg": {"field": "turn_idx"}},
            "s": {"avg_bucket": {"buckets_path": "m>_count"}}}})
