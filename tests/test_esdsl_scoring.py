"""ES scoring-composition clauses (operators/esdsl.py): ``boosting``
(Lucene BoostingQuery — negative-match demotion), ``function_score``
(field_value_factor over STORED FIELDS + weighted filter functions),
and top-level ``collapse`` (best hit per forward-table group), plus
the build_index(stored_fields=...) forward-table contract they ride
on. Expectations are recomputed manually from the engine's own match
primitives, so these tests pin the COMPOSITION semantics; BM25 itself
is oracle-checked elsewhere (test_rank_identity, the driver rows)."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from research_engine_spark.corpus import synth_transcripts
from research_engine_spark.operators.esdsl import ESQueryError, es_search
from research_engine_spark.operators.indexer import (
    append_segment,
    build_index,
)
from research_engine_spark.operators.scorer import IndexReader

Q = "neural networks"


@pytest.fixture(scope="module")
def stored_setup(spark):
    tx = (synth_transcripts(spark, n_convs=60, seed=33)
          .withColumn("n_chars", F.length("text").cast("long"))
          .withColumn("grp", F.pmod(F.xxhash64("conv_id"),
                                    F.lit(5)).cast("long")))
    d = tempfile.mkdtemp(prefix="esdsl_fs_idx_")
    build_index(tx, d, n_buckets=4, stored_fields=["n_chars", "grp"])
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _readers(spark, d):
    """(driver-local-enabled, distributed-pinned) reader pair."""
    return (IndexReader(spark, d),
            IndexReader(spark, d, driver_local_max_postings=0,
                        driver_local_max_vocab=0))


def _pairs(df, ndigits=10):
    pdf = df.select("doc_id", "score").toPandas()
    return list(zip(pdf["doc_id"].tolist(),
                    np.round(pdf["score"].to_numpy(np.float64), ndigits)))


def _all_hits(reader, query) -> pd.DataFrame:
    """Full match set (doc_id, score) for a leaf/bool query body."""
    return (es_search(reader, {"query": query, "size": 1_000_000})
            .select("doc_id", "score").toPandas())


def _topk(pdf: pd.DataFrame, k: int = 10):
    pdf = pdf.sort_values(["score", "doc_id"],
                          ascending=[False, True]).head(k)
    return list(zip(pdf["doc_id"].tolist(),
                    np.round(pdf["score"].to_numpy(np.float64), 10)))


# ---------------------------------------------------------------------------
# boosting
# ---------------------------------------------------------------------------

def test_boosting_demotes_negative_matches(spark, stored_setup):
    local, dist = _readers(spark, stored_setup)
    pos = _all_hits(dist, {"match": {"text": Q}})
    neg = set(_all_hits(dist, {"match": {"text": "model"}})["doc_id"])
    assert pos["doc_id"].isin(neg).any(), "fixture must overlap"
    exp = pos.copy()
    exp["score"] = np.where(exp["doc_id"].isin(neg),
                            exp["score"].to_numpy(np.float64) * 0.25,
                            exp["score"].to_numpy(np.float64))
    want = _topk(exp)
    body = {"query": {"boosting": {
        "positive": {"match": {"text": Q}},
        "negative": {"match": {"text": "model"}},
        "negative_boost": 0.25}}, "size": 10}
    for r in (local, dist):
        assert _pairs(es_search(r, body)) == want


def test_boosting_default_negative_boost_and_no_overlap(
        spark, stored_setup):
    _, dist = _readers(spark, stored_setup)
    pos = _all_hits(dist, {"match": {"text": Q}})
    # negative clause that matches nothing: scores pass through
    body = {"query": {"boosting": {
        "positive": {"match": {"text": Q}},
        "negative": {"term": {"text": "zzzznotaterm"}}}}, "size": 10}
    assert _pairs(es_search(dist, body)) == _topk(pos)


def test_boosting_errors(spark, stored_setup):
    local, _ = _readers(spark, stored_setup)
    with pytest.raises(ESQueryError, match="positive"):
        es_search(local, {"query": {"boosting": {
            "negative": {"match": {"text": Q}}}}})
    with pytest.raises(ESQueryError, match="positive"):
        es_search(local, {"query": {"boosting": {
            "positive": {"match": {"text": Q}}}}})


# ---------------------------------------------------------------------------
# function_score
# ---------------------------------------------------------------------------

def test_function_score_fvf_log1p_over_stored_field(spark, stored_setup):
    local, dist = _readers(spark, stored_setup)
    pos = _all_hits(dist, {"match": {"text": Q}})
    nchars = (spark.read.parquet(stored_setup + "/docs")
              .select("doc_id", "n_chars").toPandas()
              .set_index("doc_id")["n_chars"])
    exp = pos.copy()
    exp["score"] = (exp["score"].to_numpy(np.float64)
                    * np.log1p(0.001 * nchars.reindex(
                        exp["doc_id"]).to_numpy(np.float64)))
    body = {"query": {"function_score": {
        "query": {"match": {"text": Q}},
        "field_value_factor": {"field": "n_chars", "factor": 0.001,
                               "modifier": "log1p"}}}, "size": 10}
    want = _topk(exp)
    for r in (local, dist):  # serving tier falls back distributed
        assert _pairs(es_search(r, body)) == want


def test_function_score_fvf_modifiers_and_missing(spark, stored_setup):
    _, dist = _readers(spark, stored_setup)
    pos = _all_hits(dist, {"match": {"text": Q}})
    vals = (spark.read.parquet(stored_setup + "/docs")
            .select("doc_id", "n_chars").toPandas()
            .set_index("doc_id")["n_chars"]
            .reindex(pos["doc_id"]).to_numpy(np.float64))
    for modifier, fn in (("sqrt", np.sqrt), ("square", np.square),
                         ("none", lambda v: v)):
        exp = pos.copy()
        exp["score"] = exp["score"].to_numpy(np.float64) * fn(0.01 * vals)
        got = _pairs(es_search(dist, {"query": {"function_score": {
            "query": {"match": {"text": Q}},
            "field_value_factor": {"field": "n_chars", "factor": 0.01,
                                   "modifier": modifier}}}, "size": 10}))
        assert got == _topk(exp), modifier


def test_function_score_weighted_filters_sum_and_max_boost(
        spark, stored_setup):
    _, dist = _readers(spark, stored_setup)
    pos = _all_hits(dist, {"match": {"text": Q}})
    in_a = set(_all_hits(dist, {"match": {"text": "model"}})["doc_id"])
    in_b = set(_all_hits(dist, {"match": {"text": "data"}})["doc_id"])
    w = (np.where(pos["doc_id"].isin(in_a), 2.0, 0.0)
         + np.where(pos["doc_id"].isin(in_b), 3.0, 0.0))
    matched = (pos["doc_id"].isin(in_a) | pos["doc_id"].isin(in_b))
    fval = np.minimum(np.where(matched, w, 1.0), 4.0)  # max_boost cap
    body = {"query": {"function_score": {
        "query": {"match": {"text": Q}},
        "functions": [
            {"filter": {"match": {"text": "model"}}, "weight": 2.0},
            {"filter": {"match": {"text": "data"}}, "weight": 3.0}],
        "score_mode": "sum", "boost_mode": "sum",
        "max_boost": 4.0}}, "size": 10}
    exp = pos.copy()
    exp["score"] = exp["score"].to_numpy(np.float64) + fval
    assert _pairs(es_search(dist, body)) == _topk(exp)


def test_function_score_replace_and_score_modes(spark, stored_setup):
    _, dist = _readers(spark, stored_setup)
    pos = _all_hits(dist, {"match": {"text": Q}})
    in_a = pos["doc_id"].isin(
        set(_all_hits(dist, {"match": {"text": "model"}})["doc_id"]))
    # boost_mode=replace, score_mode=max over {w=2 filtered, w=0.5 bare}
    fval = np.where(in_a, 2.0, 0.5)
    body = {"query": {"function_score": {
        "query": {"match": {"text": Q}},
        "functions": [
            {"filter": {"match": {"text": "model"}}, "weight": 2.0},
            {"weight": 0.5}],
        "score_mode": "max", "boost_mode": "replace"}}, "size": 10}
    exp = pos.copy()
    exp["score"] = fval
    assert _pairs(es_search(dist, body)) == _topk(exp)
    # bare top-level weight shorthand
    exp2 = pos.copy()
    exp2["score"] = exp2["score"].to_numpy(np.float64) * 1.5
    got = _pairs(es_search(dist, {"query": {"function_score": {
        "query": {"match": {"text": Q}}, "weight": 1.5}}, "size": 10}))
    assert got == _topk(exp2)


def test_function_score_errors(spark, stored_setup):
    local, _ = _readers(spark, stored_setup)

    def fs(body):
        es_search(local, {"query": {"function_score": body}})

    with pytest.raises(ESQueryError, match="query"):
        fs({"field_value_factor": {"field": "n_chars"}})
    with pytest.raises(ESQueryError, match="not both"):
        fs({"query": {"match": {"text": Q}},
            "field_value_factor": {"field": "n_chars"},
            "functions": [{"weight": 2.0}]})
    with pytest.raises(ESQueryError, match="needs field_value_factor"):
        fs({"query": {"match": {"text": Q}}})
    with pytest.raises(ESQueryError, match="modifier"):
        fs({"query": {"match": {"text": Q}},
            "field_value_factor": {"field": "n_chars",
                                   "modifier": "ln2p"}})
    with pytest.raises(ESQueryError, match="boost_mode"):
        fs({"query": {"match": {"text": Q}}, "weight": 2.0,
            "boost_mode": "min"})
    with pytest.raises(ESQueryError, match="score_mode"):
        fs({"query": {"match": {"text": Q}}, "weight": 2.0,
            "score_mode": "first"})
    with pytest.raises(ESQueryError,
                       match="function script_score needs exactly"):
        fs({"query": {"match": {"text": Q}},
            "functions": [{"weight": 1.0, "script_score": {}}]})
    with pytest.raises(ESQueryError, match="unsupported function keys"):
        fs({"query": {"match": {"text": Q}},
            "functions": [{"weight": 1.0, "random_score": {}}]})
    with pytest.raises(ESQueryError, match="weight"):
        fs({"query": {"match": {"text": Q}},
            "functions": [{"filter": {"match": {"text": Q}}}]})
    with pytest.raises(ESQueryError, match="not in docs table"):
        fs({"query": {"match": {"text": Q}},
            "field_value_factor": {"field": "nope"}})


# ---------------------------------------------------------------------------
# collapse
# ---------------------------------------------------------------------------

def test_collapse_best_hit_per_group(spark, stored_setup):
    local, dist = _readers(spark, stored_setup)
    pos = _all_hits(dist, {"match": {"text": Q}})
    grp = (spark.read.parquet(stored_setup + "/docs")
           .select("doc_id", "grp").toPandas()
           .set_index("doc_id")["grp"])
    exp = pos.copy()
    exp["grp"] = grp.reindex(exp["doc_id"]).to_numpy()
    exp = (exp.sort_values(["score", "doc_id"], ascending=[False, True])
           .drop_duplicates("grp")[["doc_id", "score"]])
    assert len(exp) > 1, "fixture must span groups"
    body = {"query": {"match": {"text": Q}},
            "collapse": {"field": "grp"}, "size": 10}
    want = _topk(exp)
    for r in (local, dist):  # collapse is always distributed
        assert _pairs(es_search(r, body)) == want


def test_collapse_from_pagination_tiles(spark, stored_setup):
    _, dist = _readers(spark, stored_setup)
    full = _pairs(es_search(dist, {
        "query": {"match": {"text": Q}},
        "collapse": {"field": "grp"}, "size": 4}))
    page2 = _pairs(es_search(dist, {
        "query": {"match": {"text": Q}},
        "collapse": {"field": "grp"}, "size": 2, "from": 2}))
    assert page2 == full[2:4]


def test_collapse_errors(spark, stored_setup):
    local, _ = _readers(spark, stored_setup)
    with pytest.raises(ESQueryError, match="collapse needs 'field'"):
        es_search(local, {"query": {"match": {"text": Q}},
                          "collapse": {}})
    with pytest.raises(ESQueryError, match="not in docs table"):
        es_search(local, {"query": {"match": {"text": Q}},
                          "collapse": {"field": "nope"}})
    with pytest.raises(ESQueryError, match="search_after"):
        es_search(local, {"query": {"match": {"text": Q}},
                          "collapse": {"field": "grp"},
                          "search_after": [1.0, 5]})


# ---------------------------------------------------------------------------
# stored_fields forward-table contract
# ---------------------------------------------------------------------------

def test_stored_fields_recorded_and_appended(spark, stored_setup, tmp_path):
    d = str(tmp_path / "idx")
    tx = (synth_transcripts(spark, n_convs=10, seed=34)
          .withColumn("n_chars", F.length("text").cast("long")))
    build_index(tx, d, n_buckets=2, stored_fields=["n_chars"])
    import json
    import os
    with open(os.path.join(d, "corpus_stats.json")) as f:
        assert json.load(f)["stored_fields"] == ["n_chars"]
    docs = spark.read.parquet(d + "/docs")
    assert "n_chars" in docs.columns
    n0 = docs.count()
    more = (synth_transcripts(spark, n_convs=4, seed=99)
            .withColumn("n_chars", F.length("text").cast("long")))
    append_segment(more, d)
    docs2 = spark.read.parquet(d + "/docs")
    assert docs2.count() > n0
    assert docs2.filter(F.col("n_chars").isNull()).count() == 0


def test_append_missing_stored_field_fails_loudly(spark, stored_setup,
                                                  tmp_path):
    d = str(tmp_path / "idx")
    tx = (synth_transcripts(spark, n_convs=6, seed=35)
          .withColumn("n_chars", F.length("text").cast("long")))
    build_index(tx, d, n_buckets=2, stored_fields=["n_chars"])
    bare = synth_transcripts(spark, n_convs=2, seed=36)  # no n_chars
    with pytest.raises(Exception, match="n_chars"):
        append_segment(bare, d)


# ---------------------------------------------------------------------------
# top-level sort
# ---------------------------------------------------------------------------

def test_sort_by_stored_field_desc(spark, stored_setup):
    local, dist = _readers(spark, stored_setup)
    pos = _all_hits(dist, {"match": {"text": Q}})
    nchars = (spark.read.parquet(stored_setup + "/docs")
              .select("doc_id", "n_chars").toPandas()
              .set_index("doc_id")["n_chars"])
    exp = pos.copy()
    exp["n_chars"] = nchars.reindex(exp["doc_id"]).to_numpy()
    exp = exp.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True]).head(10)
    want = list(zip(exp["doc_id"].tolist(),
                    np.round(exp["score"].to_numpy(np.float64), 10)))
    body = {"query": {"match": {"text": Q}},
            "sort": [{"n_chars": {"order": "desc"}}], "size": 10}
    for r in (local, dist):  # sort is always distributed
        assert _pairs(es_search(r, body)) == want


def test_sort_spellings_and_score_secondary(spark, stored_setup):
    _, dist = _readers(spark, stored_setup)
    pos = _all_hits(dist, {"match": {"text": Q}})
    grp = (spark.read.parquet(stored_setup + "/docs")
           .select("doc_id", "grp").toPandas()
           .set_index("doc_id")["grp"])
    exp = pos.copy()
    exp["grp"] = grp.reindex(exp["doc_id"]).to_numpy()
    exp = exp.sort_values(["grp", "score", "doc_id"],
                          ascending=[True, False, True]).head(8)
    want = list(zip(exp["doc_id"].tolist(),
                    np.round(exp["score"].to_numpy(np.float64), 10)))
    # three equivalent spellings of [grp asc, _score desc]
    for sort in (["grp", "_score"],
                 [{"grp": "asc"}, {"_score": {"order": "desc"}}],
                 [{"grp": {"order": "asc"}}, "_score"]):
        got = _pairs(es_search(dist, {"query": {"match": {"text": Q}},
                                      "sort": sort, "size": 8}))
        assert got == want, sort


def test_sort_survives_source_projection(spark, stored_setup):
    _, dist = _readers(spark, stored_setup)
    body = {"query": {"match": {"text": Q}},
            "sort": [{"n_chars": "desc"}], "size": 6}
    plain = _pairs(es_search(dist, body))
    with_src = es_search(dist, dict(body, _source=["role"]))
    assert "role" in with_src.columns
    assert "n_chars" not in with_src.columns  # hidden sort key dropped
    assert _pairs(with_src) == plain


def test_sort_from_pagination_tiles(spark, stored_setup):
    _, dist = _readers(spark, stored_setup)
    body = {"query": {"match": {"text": Q}},
            "sort": [{"n_chars": "asc"}]}
    full = _pairs(es_search(dist, dict(body, size=6)))
    page2 = _pairs(es_search(dist, dict(body, size=3), ))
    assert page2 == full[:3]
    page2b = _pairs(es_search(dist, {**body, "size": 3, "from": 3}))
    assert page2b == full[3:6]


def test_sort_errors(spark, stored_setup):
    local, _ = _readers(spark, stored_setup)
    q = {"match": {"text": Q}}
    with pytest.raises(ESQueryError, match="not in docs table"):
        es_search(local, {"query": q, "sort": ["nope"]})
    with pytest.raises(ESQueryError, match="asc|desc"):
        es_search(local, {"query": q, "sort": [{"grp": "up"}]})
    with pytest.raises(ESQueryError, match="non-empty"):
        es_search(local, {"query": q, "sort": []})
    with pytest.raises(ESQueryError, match="search_after"):
        es_search(local, {"query": q, "sort": [{"grp": "asc"}],
                          "search_after": [1.0, 5]})
    with pytest.raises(ESQueryError, match="collapse with sort"):
        es_search(local, {"query": q, "sort": [{"grp": "asc"}],
                          "collapse": {"field": "grp"}})
    with pytest.raises(ESQueryError, match="only 'order'"):
        es_search(local, {"query": q,
                          "sort": [{"grp": {"order": "asc",
                                            "mode": "min"}}]})


# ---------------------------------------------------------------------------
# rescore
# ---------------------------------------------------------------------------

def _rescore_frame(base, resc, w, qw, rqw, mode):
    """One manual rescore stage, full UNROUNDED frame out."""
    cur = base.sort_values(["score", "doc_id"],
                           ascending=[False, True], kind="mergesort")
    win = cur.iloc[:w].copy()
    rest = cur.iloc[w:]
    rmap = resc.set_index("doc_id")["score"]
    r = rqw * rmap.reindex(win["doc_id"]).to_numpy(np.float64)
    b = qw * win["score"].to_numpy(np.float64)
    comb = {"total": b + r, "multiply": b * r, "avg": (b + r) / 2,
            "max": np.maximum(b, r), "min": np.minimum(b, r)}[mode]
    win["score"] = np.where(np.isnan(r), b, comb)
    win = win.sort_values(["score", "doc_id"],
                          ascending=[False, True], kind="mergesort")
    return pd.concat([win, rest], ignore_index=True)


def _manual_rescore(base, resc, w, qw, rqw, mode, k):
    out = _rescore_frame(base, resc, w, qw, rqw, mode).iloc[:k]
    return list(zip(out["doc_id"].tolist(),
                    np.round(out["score"].to_numpy(np.float64), 10)))


@pytest.mark.parametrize("mode", ["total", "multiply", "max"])
def test_rescore_modes_match_manual(spark, stored_setup, mode):
    local, dist = _readers(spark, stored_setup)
    base = _all_hits(dist, {"match": {"text": Q}})
    resc = _all_hits(dist, {"match": {"text": "model"}})
    want = _manual_rescore(base, resc, 30, 0.7, 1.5, mode, 10)
    body = {"query": {"match": {"text": Q}},
            "rescore": {"window_size": 30, "query": {
                "rescore_query": {"match": {"text": "model"}},
                "query_weight": 0.7, "rescore_query_weight": 1.5,
                "score_mode": mode}},
            "size": 10}
    for r in (local, dist):  # serving and distributed bit-identical
        assert _pairs(es_search(r, body)) == want, mode


def test_rescore_chained_non_increasing(spark, stored_setup):
    local, dist = _readers(spark, stored_setup)
    base = _all_hits(dist, {"match": {"text": Q}})
    r1 = _all_hits(dist, {"match": {"text": "model"}})
    r2 = _all_hits(dist, {"match": {"text": "data"}})
    cur = _rescore_frame(base, r1, 20, 1.0, 2.0, "total")
    want = _manual_rescore(cur, r2, 10, 1.0, 3.0, "total", 5)
    body = {"query": {"match": {"text": Q}},
            "rescore": [
                {"window_size": 20, "query": {
                    "rescore_query": {"match": {"text": "model"}},
                    "rescore_query_weight": 2.0}},
                {"window_size": 10, "query": {
                    "rescore_query": {"match": {"text": "data"}},
                    "rescore_query_weight": 3.0}}],
            "size": 5}
    for r in (local, dist):
        assert _pairs(es_search(r, body)) == want


def test_rescore_errors(spark, stored_setup):
    local, _ = _readers(spark, stored_setup)
    q = {"match": {"text": Q}}
    rq = {"query": {"rescore_query": q}}
    with pytest.raises(ESQueryError, match="rescore_query"):
        es_search(local, {"query": q, "rescore": {"query": {}}})
    with pytest.raises(ESQueryError, match="score_mode"):
        es_search(local, {"query": q, "rescore": {"query": {
            "rescore_query": q, "score_mode": "sum"}}})
    with pytest.raises(ESQueryError, match="non-increasing"):
        es_search(local, {"query": q, "rescore": [
            {"window_size": 5, "query": {"rescore_query": q}},
            {"window_size": 50, "query": {"rescore_query": q}}]})
    with pytest.raises(ESQueryError, match="exceeds the smallest"):
        es_search(local, {"query": q, "size": 20,
                          "rescore": {"window_size": 5, "query": {
                              "rescore_query": q}}})
    with pytest.raises(ESQueryError, match="default relevance"):
        es_search(local, {"query": q, "sort": [{"grp": "asc"}],
                          "rescore": {"window_size": 50, "query": {
                              "rescore_query": q}}})


# ---------------------------------------------------------------------------
# function_score decay
# ---------------------------------------------------------------------------

def _decay_np(kind, v, origin, scale, offset=0.0, decay=0.5):
    import math
    d = np.maximum(np.abs(v - origin) - offset, 0.0)
    if kind == "gauss":
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        out = np.exp(-(d * d) / (2.0 * sigma2))
    elif kind == "exp":
        out = np.exp((math.log(decay) / scale) * d)
    else:
        s = scale / (1.0 - decay)
        out = np.maximum((s - d) / s, 0.0)
    return np.where(np.isnan(v), 1.0, out)


@pytest.mark.parametrize("kind", ["gauss", "exp", "linear"])
def test_decay_functions_match_formula(spark, stored_setup, kind):
    _, dist = _readers(spark, stored_setup)
    pos = _all_hits(dist, {"match": {"text": Q}})
    vals = (spark.read.parquet(stored_setup + "/docs")
            .select("doc_id", "n_chars").toPandas()
            .set_index("doc_id")["n_chars"]
            .reindex(pos["doc_id"]).to_numpy(np.float64))
    exp = pos.copy()
    exp["score"] = (exp["score"].to_numpy(np.float64)
                    * _decay_np(kind, vals, 40.0, 25.0,
                                offset=5.0, decay=0.4))
    body = {"query": {"function_score": {
        "query": {"match": {"text": Q}},
        kind: {"n_chars": {"origin": 40.0, "scale": 25.0,
                           "offset": 5.0, "decay": 0.4}}}}, "size": 10}
    got = _pairs(es_search(dist, body), ndigits=8)
    want = [(d, round(float(s), 8)) for d, s in
            zip(*(lambda p: (p["doc_id"].tolist(),
                             p["score"].tolist()))(
                exp.sort_values(["score", "doc_id"],
                                ascending=[False, True]).head(10)))]
    assert got == want


def test_decay_with_filter_and_weight(spark, stored_setup):
    _, dist = _readers(spark, stored_setup)
    pos = _all_hits(dist, {"match": {"text": Q}})
    in_a = pos["doc_id"].isin(
        set(_all_hits(dist, {"match": {"text": "model"}})["doc_id"]))
    vals = (spark.read.parquet(stored_setup + "/docs")
            .select("doc_id", "n_chars").toPandas()
            .set_index("doc_id")["n_chars"]
            .reindex(pos["doc_id"]).to_numpy(np.float64))
    fn_val = 2.0 * _decay_np("gauss", vals, 40.0, 25.0)
    fval = np.where(in_a, fn_val, 1.0)  # unmatched filter -> neutral
    exp = pos.copy()
    exp["score"] = exp["score"].to_numpy(np.float64) * fval
    body = {"query": {"function_score": {
        "query": {"match": {"text": Q}},
        "functions": [{"filter": {"match": {"text": "model"}},
                       "weight": 2.0,
                       "gauss": {"n_chars": {"origin": 40.0,
                                             "scale": 25.0}}}]}},
        "size": 10}
    got = _pairs(es_search(dist, body), ndigits=8)
    want = [(d, round(float(s), 8)) for d, s in
            zip(exp.sort_values(["score", "doc_id"],
                                ascending=[False, True])
                .head(10)["doc_id"].tolist(),
                exp.sort_values(["score", "doc_id"],
                                ascending=[False, True])
                .head(10)["score"].tolist())]
    assert got == want


def test_decay_errors(spark, stored_setup):
    local, _ = _readers(spark, stored_setup)

    def fs(body):
        es_search(local, {"query": {"function_score": body}})

    with pytest.raises(ESQueryError, match="origin"):
        fs({"query": {"match": {"text": Q}},
            "gauss": {"n_chars": {"scale": 10.0}}})
    with pytest.raises(ESQueryError, match="scale must be > 0"):
        fs({"query": {"match": {"text": Q}},
            "gauss": {"n_chars": {"origin": 0.0, "scale": 0.0}}})
    with pytest.raises(ESQueryError, match="decay must be in"):
        fs({"query": {"match": {"text": Q}},
            "exp": {"n_chars": {"origin": 0.0, "scale": 1.0,
                                "decay": 1.0}}})
    with pytest.raises(ESQueryError, match="one decay kind"):
        fs({"query": {"match": {"text": Q}},
            "functions": [{"gauss": {"n_chars": {"origin": 0, "scale": 1}},
                           "exp": {"n_chars": {"origin": 0, "scale": 1}}}]})
    with pytest.raises(ESQueryError,
                       match="decay/script fields not in docs"):
        fs({"query": {"match": {"text": Q}},
            "linear": {"nope": {"origin": 0.0, "scale": 1.0}}})
    with pytest.raises(ESQueryError, match="exactly one"):
        fs({"query": {"match": {"text": Q}}, "gauss": {}})
