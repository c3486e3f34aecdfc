"""ES term-level query family (operators/esdsl.py): term / terms /
prefix / wildcard / range / exists — membership checked against brute
force over the raw text, serving tier bit-identical to the distributed
path, zero Spark jobs inside the budgets."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from research_engine_spark.corpus import synth_transcripts
from research_engine_spark.operators.esdsl import (
    ESQueryError,
    _wildcard_regex,
    es_count,
    es_search,
)
from research_engine_spark.operators.indexer import build_index
from research_engine_spark.operators.scorer import IndexReader

BIG = 10_000  # size larger than any match set in this fixture


@pytest.fixture(scope="module")
def tl_setup(spark):
    tx = synth_transcripts(spark, n_convs=60, seed=21)
    d = tempfile.mkdtemp(prefix="esdsl_tl_")
    # simple analyzer: [a-z0-9]+ runs, no stemming — membership is
    # recomputable with plain column expressions over the raw text
    build_index(tx, d, n_buckets=4, analyzer="simple")
    yield d, tx
    shutil.rmtree(d, ignore_errors=True)


def _readers(spark, d):
    """(driver-local-enabled, distributed-pinned) reader pair."""
    return (IndexReader(spark, d),
            IndexReader(spark, d, driver_local_max_postings=0,
                        driver_local_max_vocab=0))


def _pairs(df):
    # round(10) bridges the documented 3+-should-clause ulp caveat
    # between the pandas and Spark accumulation orders
    rows = df.select("doc_id", "score").collect()
    return [(r.doc_id, float(np.round(r.score, 10))) for r in rows]


def _docs_with_token(reader, pred):
    """Brute-force doc_ids whose simple-analyzed tokens satisfy pred
    (a Column -> Column predicate over the token column)."""
    toks = (reader.docs
            .select("doc_id", F.explode(F.split(
                F.lower("text"), "[^a-z0-9]+")).alias("tok"))
            .filter(F.col("tok") != ""))
    return {r.doc_id for r in
            toks.filter(pred(F.col("tok"))).select("doc_id")
            .distinct().collect()}


def test_term_equals_match_for_identity_token(spark, tl_setup):
    # "neural" analyzes to itself under simple, so the UNanalyzed term
    # query and the analyzed match query must coincide exactly
    d, _ = tl_setup
    local, dist = _readers(spark, d)
    t_loc = _pairs(es_search(local, {
        "query": {"term": {"text": "neural"}}, "size": 8}))
    t_dist = _pairs(es_search(dist, {
        "query": {"term": {"text": "neural"}}, "size": 8}))
    m = _pairs(es_search(dist, {
        "query": {"match": {"text": "neural"}}, "size": 8}))
    assert t_loc == t_dist == m
    assert len(t_loc) == 8


def test_term_is_unanalyzed(spark, tl_setup):
    # mixed-case value never matches: index terms are the analyzed
    # (lowercased) tokens and the term query does NOT analyze
    d, _ = tl_setup
    local, dist = _readers(spark, d)
    for r in (local, dist):
        assert _pairs(es_search(r, {
            "query": {"term": {"text": "Neural"}}, "size": 5})) == []


def test_terms_constant_score_membership(spark, tl_setup):
    d, _ = tl_setup
    local, dist = _readers(spark, d)
    body = {"query": {"terms": {"text": ["neural", "networks"],
                                "boost": 2.0}}, "size": BIG}
    expected = _docs_with_token(
        dist, lambda t: t.isin("neural", "networks"))
    for r in (local, dist):
        got = _pairs(es_search(r, body))
        assert {doc for doc, _ in got} == expected
        assert all(s == 2.0 for _, s in got)
    # missing terms are skipped, not errors
    assert {doc for doc, _ in _pairs(es_search(local, {
        "query": {"terms": {"text": ["neural", "zzzznope"]}},
        "size": BIG}))} == _docs_with_token(dist,
                                            lambda t: t == F.lit("neural"))


def test_prefix_membership_both_paths(spark, tl_setup):
    d, _ = tl_setup
    local, dist = _readers(spark, d)
    body = {"query": {"prefix": {"text": {"value": "neur"}}}, "size": BIG}
    expected = _docs_with_token(dist, lambda t: t.startswith("neur"))
    assert expected, "fixture lost its neur* tokens"
    loc, ds = _pairs(es_search(local, body)), _pairs(es_search(dist, body))
    assert loc == ds
    assert {doc for doc, _ in loc} == expected
    assert all(s == 1.0 for _, s in loc)


def test_wildcard_membership_and_regex(spark, tl_setup):
    d, _ = tl_setup
    local, dist = _readers(spark, d)
    assert _wildcard_regex("ne*a?") == "ne.*a."
    assert _wildcard_regex("a.b*") == "a\\.b.*"
    body = {"query": {"wildcard": {"text": {"value": "neur*"}}},
            "size": BIG}
    pfx = {"query": {"prefix": {"text": {"value": "neur"}}}, "size": BIG}
    for r in (local, dist):
        assert _pairs(es_search(r, body)) == _pairs(es_search(r, pfx))
    qbody = {"query": {"wildcard": {"text": {"value": "n??ral"}}},
             "size": BIG}
    expected = _docs_with_token(dist, lambda t: t.rlike("^n..ral$"))
    for r in (local, dist):
        assert {doc for doc, _ in _pairs(es_search(r, qbody))} == expected


def test_range_filter_in_bool(spark, tl_setup):
    # range is a docs-metadata predicate: filter context keeps the
    # match clause's scores, membership intersects
    d, _ = tl_setup
    local, dist = _readers(spark, d)
    plain = {"query": {"match": {"text": "neural networks"}}, "size": BIG}
    body = {"query": {"bool": {
        "must": [{"match": {"text": "neural networks"}}],
        "filter": [{"range": {"turn_idx": {"gte": 3, "lt": 40}}}],
    }}, "size": BIG}
    in_range = {r.doc_id for r in
                dist.docs.filter("turn_idx >= 3 AND turn_idx < 40")
                .select("doc_id").collect()}
    base = dict(_pairs(es_search(dist, plain)))
    expected = {doc: s for doc, s in base.items() if doc in in_range}
    for r in (local, dist):  # range forces distributed either way
        got = dict(_pairs(es_search(r, body)))
        assert got == expected
    with pytest.raises(ESQueryError):
        es_search(dist, {"query": {"range": {"turn_idx": {}}}})
    with pytest.raises(ESQueryError):
        es_search(dist, {"query": {"range": {"nope": {"gte": 1}}}})


def test_exists_matches_all_live_docs(spark, tl_setup):
    d, _ = tl_setup
    _, dist = _readers(spark, d)
    n = dist.docs.count()
    got = _pairs(es_search(dist, {
        "query": {"exists": {"field": "text"}}, "size": n + 10}))
    assert len(got) == n
    assert all(s == 1.0 for _, s in got)


def test_prefix_plan_pushdown_and_pruning(spark, tl_setup):
    # the 100 TB posture: the prefix predicate reaches the postings
    # parquet scan (PushedFilters) and only (term, doc_gaps) are read —
    # no tfs/dls/positions decode for constant-score membership
    d, _ = tl_setup
    _, dist = _readers(spark, d)
    df = es_search(dist, {
        "query": {"prefix": {"text": {"value": "neur"}}}, "size": 5})
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines()
            if "FileScan" in ln and "postings" in ln]
    assert scan, plan
    assert "StringStartsWith(term,neur)" in scan[0]
    assert "tfs" not in scan[0].split("ReadSchema")[-1]


def test_search_after_pagination_walk(spark, tl_setup):
    # three size-4 pages chained by the [score, doc_id] cursor must
    # tile the single size-12 result exactly, on both paths
    d, _ = tl_setup
    local, dist = _readers(spark, d)
    q = {"match": {"text": "neural networks"}}
    for r in (local, dist):
        whole = _pairs(es_search(r, {"query": q, "size": 12}))
        pages, cursor = [], None
        for _ in range(3):
            body = {"query": q, "size": 4}
            if cursor is not None:
                body["search_after"] = list(cursor)
            page = es_search(r, body).collect()
            assert len(page) == 4
            pages.extend((p.doc_id, float(np.round(p.score, 10)))
                         for p in page)
            cursor = (float(page[-1].score), int(page[-1].doc_id))
        assert pages == whole
        assert len({doc for doc, _ in pages}) == 12  # no overlap


def test_search_after_validation(spark, tl_setup):
    d, _ = tl_setup
    _, dist = _readers(spark, d)
    q = {"match": {"text": "neural"}}
    with pytest.raises(ESQueryError):
        es_search(dist, {"query": q, "from": 5,
                         "search_after": [1.0, 3]})
    with pytest.raises(ESQueryError):
        es_search(dist, {"query": q, "search_after": [1.0]})


def test_msearch_search_after(spark, tl_setup):
    # the cursor works per-body inside a batch: page 2 of q0 rides the
    # same msearch as an unrelated q1
    from research_engine_spark.operators.esdsl import es_msearch

    d, _ = tl_setup
    local, dist = _readers(spark, d)
    q = {"match": {"text": "neural networks"}}
    for r in (local, dist):
        p1 = es_search(r, {"query": q, "size": 4}).collect()
        out = es_msearch(r, {
            "page2": {"query": q, "size": 4,
                      "search_after": [float(p1[-1].score),
                                       int(p1[-1].doc_id)]},
            "other": {"query": {"term": {"text": "agent"}}, "size": 3},
        }).collect()
        page2 = [(x.doc_id, float(np.round(x.score, 10)))
                 for x in out if x.qid == "page2"]
        whole = _pairs(es_search(r, {"query": q, "size": 8}))
        assert page2 == whole[4:]
        assert sum(1 for x in out if x.qid == "other") == 3


def test_es_count(spark, tl_setup):
    d, _ = tl_setup
    local, dist = _readers(spark, d)
    expected = len(_docs_with_token(
        dist, lambda t: t.isin("neural", "networks")))
    body = {"query": {"match": {"text": "neural networks"}}}
    assert es_count(dist, body) == expected
    # serving tier: same number, zero Spark jobs
    es_count(local, body)  # warm the term dictionary
    sc = spark.sparkContext
    sc.setJobGroup("count_probe", "probe")
    try:
        assert es_count(local, body) == expected
        jobs = sc.statusTracker().getJobIdsForGroup("count_probe")
        assert list(jobs) == [], f"budgeted count launched jobs: {jobs}"
    finally:
        sc.setJobGroup(None, None)
    assert es_count(dist, {}) == dist.docs.count()  # match_all default


def test_match_operator_and(spark, tl_setup):
    # operator:"and" keeps the OR-query scores but intersects the
    # membership: docs containing BOTH analyzed terms
    d, _ = tl_setup
    local, dist = _readers(spark, d)
    both = (_docs_with_token(dist, lambda t: t == F.lit("neural"))
            & _docs_with_token(dist, lambda t: t == F.lit("networks")))
    or_body = {"query": {"match": {"text": "neural networks"}},
               "size": BIG}
    and_body = {"query": {"match": {"text": {
        "query": "neural networks", "operator": "and"}}}, "size": BIG}
    or_scores = dict(_pairs(es_search(dist, or_body)))
    for r in (local, dist):
        got = dict(_pairs(es_search(r, and_body)))
        assert set(got) == both
        assert got == {doc: s for doc, s in or_scores.items()
                       if doc in both}
    with pytest.raises(ESQueryError):
        es_search(dist, {"query": {"match": {"text": {
            "query": "neural", "operator": "and",
            "fuzziness": "AUTO"}}}})
    # multi_match must reject operator rather than silently return OR
    with pytest.raises(ESQueryError):
        es_search(dist, {"query": {"multi_match": {
            "query": "neural networks", "fields": ["text"],
            "operator": "and"}}})
    # all-stopword/no-token query matches nothing
    assert _pairs(es_search(dist, {"query": {"match": {"text": {
        "query": "???", "operator": "and"}}}, "size": 5})) == []


def test_constant_score_wrapper(spark, tl_setup):
    d, _ = tl_setup
    local, dist = _readers(spark, d)
    body = {"query": {"constant_score": {
        "filter": {"match": {"text": "neural networks"}},
        "boost": 3.5}}, "size": BIG}
    expected = _docs_with_token(
        dist, lambda t: t.isin("neural", "networks"))
    for r in (local, dist):
        got = _pairs(es_search(r, body))
        assert {doc for doc, _ in got} == expected
        assert all(s == 3.5 for _, s in got)
    with pytest.raises(ESQueryError):
        es_search(dist, {"query": {"constant_score": {"boost": 2.0}}})


def test_nested_bucket_aggregations(spark, tl_setup):
    # terms(role) with a nested terms(turn_idx mod) — leaf buckets equal
    # a direct two-key groupBy over the brute-force match set
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = tl_setup
    _, dist = _readers(spark, d)
    out = es_aggregations(dist, {
        "query": {"match": {"text": "neural networks"}},
        "aggs": {"by_role": {
            "terms": {"field": "role"},
            "aggs": {"by_turn": {"terms": {"field": "turn_idx"}},
                     }}}}).collect()
    matched = _docs_with_token(dist, lambda t: t.isin("neural",
                                                      "networks"))
    exp = (dist.docs.filter(F.col("doc_id").isin(list(matched)))
           .groupBy("role", "turn_idx").count().collect())
    assert {(r.key, r.key2, r.doc_count) for r in out} == \
        {(r.role, r.turn_idx, r["count"]) for r in exp}
    # faithful ES traversal order: role buckets by their TOTAL count
    # desc (key asc ties), leaf buckets inside each by count desc
    role_tot: dict = {}
    for r in exp:
        role_tot[r.role] = role_tot.get(r.role, 0) + r["count"]
    want_order = sorted(
        ((r.role, r.turn_idx, r["count"]) for r in exp),
        key=lambda x: (-role_tot[x[0]], x[0], -x[2], x[1]))
    assert [(r.key, r.key2, r.doc_count) for r in out] == want_order
    with pytest.raises(ESQueryError):
        es_aggregations(dist, {"aggs": {"a": {
            "avg": {"field": "turn_idx"},
            "aggs": {"b": {"terms": {"field": "role"}}}}}})


def test_three_level_nested_aggs_with_sizes(spark, tl_setup):
    # terms(role) > terms(turn_idx bucket, size=3) > terms(conv_id,
    # size=2): leaf rows equal a pandas recompute of ES semantics —
    # per-parent top-size buckets by (count desc, key asc), exact
    # counts, dropped parents dropping their subtree — in faithful
    # per-level traversal order
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = tl_setup
    _, dist = _readers(spark, d)
    out = [(r.key, int(r.key2), r.key3, r.doc_count)
           for r in es_aggregations(dist, {
               "aggs": {"l1": {
                   "terms": {"field": "role"},
                   "aggs": {"l2": {
                       "terms": {"field": "turn_idx", "size": 3},
                       "aggs": {"l3": {
                           "terms": {"field": "conv_id", "size": 2},
                       }}}}}}}).collect()]

    pdf = dist.docs.select("role", "turn_idx", "conv_id").toPandas()
    leaf = (pdf.groupby(["role", "turn_idx", "conv_id"])
            .size().reset_index(name="n"))
    rows = []
    lvl1 = leaf.groupby("role")["n"].sum()
    for role in sorted(lvl1.index, key=lambda k: (-lvl1[k], k)):
        sub1 = leaf[leaf["role"] == role]
        lvl2 = sub1.groupby("turn_idx")["n"].sum()
        keep2 = sorted(lvl2.index, key=lambda k: (-lvl2[k], k))[:3]
        for ti in keep2:
            sub2 = sub1[sub1["turn_idx"] == ti]
            lvl3 = sub2.set_index("conv_id")["n"]
            keep3 = sorted(lvl3.index, key=lambda k: (-lvl3[k], k))[:2]
            rows += [(role, int(ti), cv, int(lvl3[cv])) for cv in keep3]
    assert out == rows


def test_composite_termlevel_bool_identity(spark, tl_setup):
    # term (BM25) + prefix (constant) should-sum: serving tier and
    # distributed path agree bit-for-bit, and the serving tier issues
    # zero Spark jobs
    d, _ = tl_setup
    local, dist = _readers(spark, d)
    body = {"query": {"bool": {"should": [
        {"term": {"text": {"value": "neural", "boost": 1.5}}},
        {"prefix": {"text": {"value": "netw", "boost": 0.25}}},
        {"terms": {"text": ["agent", "model"]}},
    ], "minimum_should_match": 1}}, "size": 15}
    loc_df = es_search(local, body)
    sc = spark.sparkContext
    sc.setJobGroup("termlevel_probe", "probe")
    try:
        loc = _pairs(loc_df)
        jobs = sc.statusTracker().getJobIdsForGroup("termlevel_probe")
        assert list(jobs) == [], f"serving tier launched jobs: {jobs}"
    finally:
        sc.setJobGroup(None, None)
    assert loc == _pairs(es_search(dist, body))
    assert len(loc) == 15


def test_regexp_membership_both_paths(spark, tl_setup):
    d, _ = tl_setup
    local, dist = _readers(spark, d)
    body = {"query": {"regexp": {"text": {"value": "ne.*al",
                                          "boost": 2.0}}}, "size": BIG}
    expected = _docs_with_token(dist, lambda t: t.rlike("^(?:ne.*al)$"))
    for r in (local, dist):
        got = _pairs(es_search(r, body))
        assert {doc for doc, _ in got} == expected
        assert all(s == 2.0 for _, s in got)  # constant_score rewrite
    # a regexp equivalent to a wildcard returns the identical frame
    wc = {"query": {"wildcard": {"text": {"value": "neur*"}}},
          "size": BIG}
    rx = {"query": {"regexp": {"text": {"value": "neur.*"}}},
          "size": BIG}
    for r in (local, dist):
        assert _pairs(es_search(r, rx)) == _pairs(es_search(r, wc))


def test_regexp_rejects_lucene_only_and_bad_patterns(spark, tl_setup):
    d, _ = tl_setup
    local, _dist = _readers(spark, d)
    for bad in ("a~b", "a&b", "<1-5>", "a@", "^anchored$", "a["):
        with pytest.raises(ESQueryError):
            es_search(local, {"query": {"regexp": {
                "text": {"value": bad}}}})
    # escaped forms of the Lucene-only chars are plain literals: no
    # match in this corpus, but no error either
    out = es_search(local, {"query": {"regexp": {
        "text": {"value": r"a\~b"}}}, "size": 5})
    assert out.count() == 0


def test_terms_set_per_doc_gate(spark, tl_setup):
    d, _ = tl_setup
    local, dist = _readers(spark, d)
    # turn_idx is the per-doc required count; brute-force the gate
    terms = ["neural", "networks", "training", "model", "data"]
    body = {"query": {"terms_set": {"text": {
        "terms": terms, "minimum_should_match_field": "turn_idx"}}},
        "size": BIG}
    toks = (dist.docs
            .select("doc_id", "turn_idx", F.split(
                F.lower("text"), "[^a-z0-9]+").alias("tk")))
    import pyspark.sql.functions as SF
    hits = {r.doc_id: r.nt for r in
            toks.select("doc_id", "turn_idx", SF.explode("tk").alias("t"))
            .filter(SF.col("t").isin(terms))
            .groupBy("doc_id", "turn_idx")
            .agg(SF.countDistinct("t").alias("nt")).collect()
            if r.nt >= r.turn_idx}
    for r in (local, dist):  # serving tier falls back: same result
        got = {doc for doc, _ in _pairs(es_search(r, body))}
        assert got == set(hits)
    assert hits  # non-degenerate


def test_terms_set_errors(spark, tl_setup):
    d, _ = tl_setup
    local, _dist = _readers(spark, d)
    with pytest.raises(ESQueryError, match="minimum_should_match_field"):
        es_search(local, {"query": {"terms_set": {"text": {
            "terms": ["a"]}}}})
    with pytest.raises(ESQueryError, match="script"):
        es_search(local, {"query": {"terms_set": {"text": {
            "terms": ["a"],
            "minimum_should_match_script": {"source": "x"}}}}})
    with pytest.raises(ESQueryError, match="not in docs"):
        es_search(local, {"query": {"terms_set": {"text": {
            "terms": ["a"], "minimum_should_match_field": "nope"}}}})
