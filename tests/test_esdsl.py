"""ES query-DSL front-end (operators/esdsl.py): the reference's search
bodies (es_search_final.py:12-37) execute natively and agree bit-for-bit
with the engine primitives they compile to, on both the distributed and
the zero-Spark-job driver-local evaluation paths."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest

from research_engine_spark.corpus import synth_transcripts
from research_engine_spark.operators.esdsl import (
    ESQueryError,
    es_search,
    reference_search_body,
)
from research_engine_spark.operators.indexer import build_index
from research_engine_spark.operators.multifield import (
    MultiFieldReader,
    build_multifield_index,
    search_multifield,
)
from research_engine_spark.operators.scorer import (
    IndexReader,
    bool_should_search,
    phrase_search,
    search,
)

Q = "neural networks"


@pytest.fixture(scope="module")
def es_setup(spark):
    tx = synth_transcripts(spark, n_convs=60, seed=21)
    d = tempfile.mkdtemp(prefix="esdsl_idx_")
    build_index(tx, d, n_buckets=4, with_positions=True)
    mfd = tempfile.mkdtemp(prefix="esdsl_mf_")
    build_multifield_index(tx, mfd, {"text": 3.0, "role": 1.0},
                           n_buckets=4, with_positions=True)
    yield d, mfd
    shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(mfd, ignore_errors=True)


def _pairs(df):
    pdf = df.select("doc_id", "score").toPandas()
    return list(zip(pdf["doc_id"].tolist(),
                    np.round(pdf["score"].to_numpy(np.float64), 10)))


def _readers(spark, d):
    """(driver-local-enabled, distributed-pinned) reader pair."""
    return (IndexReader(spark, d),
            IndexReader(spark, d, driver_local_max_postings=0,
                        driver_local_max_vocab=0))


def test_match_equals_search(spark, es_setup):
    d, _ = es_setup
    local, dist = _readers(spark, d)
    want = _pairs(search(dist, Q, k=10, with_text=False))
    for r in (local, dist):
        got = _pairs(es_search(r, {"query": {"match": {"text": Q}}}))
        assert got == want


def test_match_phrase_equals_phrase_search(spark, es_setup):
    d, _ = es_setup
    local, dist = _readers(spark, d)
    want = _pairs(phrase_search(dist, Q, k=10))
    for r in (local, dist):
        got = _pairs(es_search(
            r, {"query": {"match_phrase": {"text": Q}}, "size": 10}))
        assert got == want


def test_reference_bool_should_equals_bool_should_search(spark, es_setup):
    """The es_search_final.py clause shape on one field: match +
    phrase-boost-2.0, minimum_should_match=1 — must agree with the
    dedicated bool_should_search operator bit-for-bit."""
    d, _ = es_setup
    local, dist = _readers(spark, d)
    want = _pairs(bool_should_search(dist, Q, k=10))
    body = {"query": {"bool": {
        "should": [
            {"match": {"text": Q}},
            {"match_phrase": {"text": {"query": Q, "boost": 2.0}}},
        ],
        "minimum_should_match": 1}},
        "size": 10}
    for r in (local, dist):
        assert _pairs(es_search(r, body)) == want


def test_multi_match_equals_search_multifield(spark, es_setup):
    _, mfd = es_setup
    mf = MultiFieldReader(spark, mfd)
    want = _pairs(search_multifield(mf, Q, k=10, tie_breaker=0.3))
    got = _pairs(es_search(mf, {"query": {"multi_match": {
        "query": Q, "fields": ["text^3", "role"],
        "type": "best_fields", "tie_breaker": 0.3}}, "size": 10}))
    assert got == want


def test_reference_search_body_end_to_end(spark, es_setup):
    """The reference's FULL enhanced body — fuzzy best_fields +
    phrase-type multi_match, minimum_should_match=1 — runs on per-field
    sub-indexes; driver-local and distributed agree."""
    _, mfd = es_setup
    mf = MultiFieldReader(spark, mfd)
    body = reference_search_body(
        "neural netwrks", fields={"text": 3.0, "role": 1.0}, size=10)
    got_local = _pairs(es_search(mf, body))
    assert got_local  # the typo reaches 'networks' via fuzzy AUTO
    dist = MultiFieldReader(spark, mfd)
    for r in dist.readers.values():
        r.driver_local_max_postings = 0
        r.driver_local_max_vocab = 0
    assert _pairs(es_search(dist, body)) == got_local


def test_minimum_should_match_two(spark, es_setup):
    d, _ = es_setup
    local, dist = _readers(spark, d)
    body = {"query": {"bool": {
        "should": [{"match": {"text": "neural"}},
                   {"match_phrase": {"text": Q}}],
        "minimum_should_match": 2}}, "size": 10000}
    for r in (local, dist):
        got = es_search(r, body)
        ids = {x.doc_id for x in got.collect()}
        # every hit matches BOTH clauses: phrase hits are a subset of
        # docs containing 'neural'
        phrase_ids = {x.doc_id for x in
                      phrase_search(dist, Q, k=10000).collect()}
        assert ids and ids <= phrase_ids


def test_must_and_must_not(spark, es_setup):
    d, _ = es_setup
    local, dist = _readers(spark, d)
    mids = {x.doc_id for x in search(
        dist, "machine", k=10000, with_text=False, _all_matches=True
        ).collect()}
    nids = {x.doc_id for x in search(
        dist, "neural", k=10000, with_text=False, _all_matches=True
        ).collect()}
    body = {"query": {"bool": {
        "must": [{"match": {"text": "machine"}}],
        "must_not": [{"match": {"text": "neural"}}]}},
        "size": 100000}
    for r in (local, dist):
        ids = {x.doc_id for x in es_search(r, body).collect()}
        assert ids == (mids - nids)


def test_filter_scores_zero(spark, es_setup):
    d, _ = es_setup
    local, dist = _readers(spark, d)
    body = {"query": {"bool": {
        "filter": [{"match": {"text": "machine"}}]}}, "size": 5}
    for r in (local, dist):
        rows = es_search(r, body).collect()
        assert rows and all(x.score == 0.0 for x in rows)


def test_source_projection(spark, es_setup):
    d, _ = es_setup
    local, _ = _readers(spark, d)
    df = es_search(local, {"query": {"match": {"text": Q}},
                           "_source": ["conv_id", "turn_idx", "text"],
                           "size": 3})
    assert df.columns == ["doc_id", "score", "conv_id", "turn_idx", "text"]
    assert df.count() == 3


def test_errors(spark, es_setup):
    d, mfd = es_setup
    local, _ = _readers(spark, d)
    mf = MultiFieldReader(spark, mfd)
    with pytest.raises(ESQueryError, match="unsupported clause"):
        es_search(local, {"query": {"percolate": {"field": "text"}}})
    with pytest.raises(ESQueryError, match="fuzziness"):
        es_search(local, {"query": {"match": {
            "text": {"query": Q, "fuzziness": 2}}}})
    with pytest.raises(ESQueryError, match="unknown field"):
        es_search(mf, {"query": {"match": {"title": Q}}})
    with pytest.raises(ESQueryError, match="_source"):
        es_search(local, {"query": {"match": {"text": Q}},
                          "_source": ["nope"]})


def test_from_pagination(spark, es_setup):
    d, _ = es_setup
    local, dist = _readers(spark, d)
    full = _pairs(es_search(dist, {"query": {"match": {"text": Q}},
                                   "size": 10}))
    for r in (local, dist):
        page2 = _pairs(es_search(r, {"query": {"match": {"text": Q}},
                                     "from": 4, "size": 3}))
        assert page2 == full[4:7]


def test_highlight(spark, es_setup):
    d, _ = es_setup
    local, _ = _readers(spark, d)
    df = es_search(local, {
        "query": {"match": {"text": Q}},
        "highlight": {"fields": {"text": {"fragment_size": 100,
                                          "number_of_fragments": 1}}},
        "size": 3})
    rows = df.collect()
    assert "highlight" in df.columns and len(rows) == 3
    assert any("neural" in r.highlight.lower() for r in rows)


def test_aggregations_terms_with_metric(spark, es_setup):
    from pyspark.sql import functions as F
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = es_setup
    r = IndexReader(spark, d)
    out = es_aggregations(r, {
        "query": {"match": {"text": "neural"}},
        "aggs": {"by_role": {"terms": {"field": "role"},
                 "aggs": {"avg_turn": {"avg": {"field": "turn_idx"}},
                          "max_turn": {"max": {"field": "turn_idx"}}}}}})
    assert out.columns == ["key", "doc_count", "avg_turn", "max_turn"]
    rows = {x.key: x for x in out.collect()}
    # verify against a manual recount over the match set
    matched = search(r, "neural", k=100000, with_text=False,
                     _all_matches=True).select("doc_id")
    want = (r.docs.join(matched, "doc_id", "left_semi")
            .groupBy("role").agg(F.count(F.lit(1)).alias("n"),
                                 F.avg("turn_idx").alias("a")).collect())
    assert {x.role: (x.n, x.a) for x in want} == {
        k: (v.doc_count, v.avg_turn) for k, v in rows.items()}


def test_aggregations_date_histogram_and_match_all(spark, es_setup):
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = es_setup
    r = IndexReader(spark, d)
    out = es_aggregations(r, {
        "aggs": {"per_day": {"date_histogram": {
            "field": "ts", "calendar_interval": "day"}}}}).collect()
    assert sum(x.doc_count for x in out) == r.docs.count()  # match_all
    keys = [x.key for x in out]
    assert keys == sorted(keys)  # ascending buckets


def test_aggregations_bare_metric_and_errors(spark, es_setup):
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = es_setup
    r = IndexReader(spark, d)
    row = es_aggregations(r, {
        "query": {"match": {"text": "machine"}},
        "aggs": {"n": {"value_count": {"field": "doc_id"}}}}).collect()[0]
    n_match = search(r, "machine", k=10**6, with_text=False,
                     _all_matches=True).count()
    assert row.n == n_match
    with pytest.raises(ESQueryError, match="one top-level agg"):
        es_aggregations(r, {"aggs": {}})
    with pytest.raises(ESQueryError, match="unsupported metric"):
        es_aggregations(r, {"aggs": {"x": {"median": {"field": "ts"}}}})


def test_msearch_matches_individual_bodies(spark, es_setup):
    from research_engine_spark.operators.esdsl import es_msearch

    d, _ = es_setup
    local, dist = _readers(spark, d)
    bodies = {"a": {"query": {"match": {"text": Q}}, "size": 5},
              "b": {"query": {"match_phrase": {"text": Q}}, "size": 3},
              "c": {"query": {"match": {"text": "machine"}}, "size": 4}}
    for r in (local, dist):
        out = es_msearch(r, bodies)
        got = {}
        for row in out.collect():
            got.setdefault(row.qid, []).append((row.doc_id, row.score))
        for qid, body in bodies.items():
            want = [(x.doc_id, x.score)
                    for x in es_search(r, body).collect()]
            assert got.get(qid, []) == want, qid
    # list input names bodies q0..qN
    out = es_msearch(local, list(bodies.values()))
    assert {x.qid for x in out.collect()} <= {"q0", "q1", "q2"}


def test_bool_must_not_only_is_match_all_minus(spark, es_setup):
    from research_engine_spark.operators.esdsl import es_msearch

    d, _ = es_setup
    local, dist = _readers(spark, d)
    nids = {x.doc_id for x in search(
        dist, "neural", k=10**6, with_text=False, _all_matches=True
        ).collect()}
    n_docs = dist.docs.count()
    body = {"query": {"bool": {"must_not": [{"match": {"text": "neural"}}]}},
            "size": 10**6}
    for r in (local, dist):
        rows = es_search(r, body).collect()
        assert len(rows) == n_docs - len(nids)
        assert all(x.score == 0.0 for x in rows)
    with pytest.raises(ESQueryError, match="at least one body"):
        es_msearch(local, [])


def test_four_should_clauses_bit_identical_across_paths(spark, es_setup):
    """r4 ulp caveat retired: the distributed should composition folds
    per-clause pivot columns in fixed clause order, so serving and
    distributed agree EXACTLY (no rounding) at 3+ clause counts."""
    d, _ = es_setup
    local, dist = _readers(spark, d)
    body = {"query": {"bool": {"should": [
        {"match": {"text": "neural"}},
        {"match": {"text": "networks"}},
        {"match": {"text": "machine learning"}},
        {"match_phrase": {"text": {"query": Q, "boost": 2.0}}},
    ], "minimum_should_match": 1}}, "size": 30}
    a = es_search(local, body).select("doc_id", "score").toPandas()
    b = es_search(dist, body).select("doc_id", "score").toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    # bitwise float equality, not rounded
    assert a["score"].to_numpy(np.float64).tobytes() == \
        b["score"].to_numpy(np.float64).tobytes()


def test_metric_aggs_cardinality_percentiles_stats(spark, es_setup):
    """Round-5 metric aggs: exact paths verified against direct
    recomputation over the match set; the approximate twins (HLL++
    cardinality, percentile_approx) land within their error bounds."""
    import numpy as np
    from pyspark.sql import functions as F
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = es_setup
    r = IndexReader(spark, d)
    body = lambda aggs: {"query": {"match": {"text": "neural"}},
                         "aggs": {"by_role": {"terms": {"field": "role"},
                                              "aggs": aggs}}}
    out = {x.key: x for x in es_aggregations(r, body({
        "uc": {"cardinality": {"field": "conv_id"}},
        "pc": {"percentiles": {"field": "turn_idx",
                               "percents": [50, 99]}},
        "st": {"stats": {"field": "turn_idx"}},
    })).collect()}
    matched = search(r, "neural", k=10**6, with_text=False,
                     _all_matches=True).select("doc_id")
    base = r.docs.join(matched, "doc_id", "left_semi").toPandas()
    for role, grp in base.groupby("role"):
        got = out[role]
        ti = grp["turn_idx"].to_numpy(np.float64)
        assert got.uc == grp["conv_id"].nunique()
        # Spark exact percentile == numpy linear interpolation
        assert got.pc_50 == pytest.approx(
            np.percentile(ti, 50, method="linear"), abs=1e-9)
        assert got.pc_99 == pytest.approx(
            np.percentile(ti, 99, method="linear"), abs=1e-9)
        assert (got.st_count, got.st_min, got.st_max, got.st_sum) == (
            len(ti), int(ti.min()), int(ti.max()), int(ti.sum()))
        assert got.st_avg == pytest.approx(ti.mean())
    # approximate twins: HLL++ within rsd bound, tdigest-analog within
    # one rank of the exact percentile at this tiny cardinality
    appr = {x.key: x for x in es_aggregations(r, body({
        "uc": {"cardinality": {"field": "conv_id", "approximate": True}},
        "pc": {"percentiles": {"field": "turn_idx", "percents": [50],
                               "approximate": True}},
    })).collect()}
    for role, grp in base.groupby("role"):
        exact = grp["conv_id"].nunique()
        assert abs(appr[role].uc - exact) <= max(3, 0.1 * exact)
        ti = np.sort(grp["turn_idx"].to_numpy(np.float64))
        assert ti[0] <= appr[role].pc_50 <= ti[-1]


def test_top_hits_score_sort_matches_search(spark, es_setup):
    """top_hits default (_score desc) returns, per bucket, exactly the
    match-set docs ranked as search() ranks them within that bucket."""
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = es_setup
    r = IndexReader(spark, d)
    out = es_aggregations(r, {
        "query": {"match": {"text": "neural networks"}},
        "aggs": {"by_role": {"terms": {"field": "role"},
                 "aggs": {"h": {"top_hits": {"size": 3}}}}}})
    assert out.columns == ["key", "doc_count", "doc_id", "hit_rank"]
    got = [(x.key, x.hit_rank, x.doc_id) for x in out.collect()]
    # oracle: full ranked match list, grouped by role driver-side
    from pyspark.sql import functions as F

    full = (search(r, "neural networks", k=10**6, with_text=False,
                   _all_matches=True)
            .join(r.docs.select("doc_id", "role"), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id")).collect())
    want, seen = [], {}
    for row in full:
        k = seen.get(row.role, 0) + 1
        seen[row.role] = k
        if k <= 3:
            want.append((row.role, k, row.doc_id))
    assert sorted(got) == sorted(want)
    # hits ordered within each bucket, ranks dense from 1
    ranks = {}
    for x in out.collect():
        ranks.setdefault(x.key, []).append(x.hit_rank)
    assert all(v == sorted(v) and v[0] == 1 for v in ranks.values())


def test_top_hits_field_sort_and_errors(spark, es_setup):
    from pyspark.sql import functions as F
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = es_setup
    r = IndexReader(spark, d)
    out = es_aggregations(r, {
        "aggs": {"by_role": {"terms": {"field": "role", "size": 2},
                 "aggs": {"h": {"top_hits": {
                     "size": 2, "sort": [{"turn_idx": {"order": "desc"}}],
                     "_source": ["turn_idx"]}}}}}}).collect()
    assert len({x.key for x in out}) == 2  # terms size honored
    per = {}
    for x in out:
        per.setdefault(x.key, []).append(x.turn_idx)
    top2 = (r.docs.groupBy("role").count()
            .orderBy(F.desc("count"), F.asc("role")).limit(2).collect())
    for row in top2:
        want = [x.turn_idx for x in
                r.docs.filter(F.col("role") == row.role)
                .orderBy(F.desc("turn_idx"), F.asc("doc_id"))
                .limit(2).collect()]
        assert per[row.role] == want
    with pytest.raises(ESQueryError, match="_score needs a scoring"):
        es_aggregations(r, {"aggs": {"b": {"terms": {"field": "role"},
                            "aggs": {"h": {"top_hits": {}}}}}})
    with pytest.raises(ESQueryError, match="single-level bucket"):
        es_aggregations(r, {
            "query": {"match": {"text": "neural"}},
            "aggs": {"b": {"terms": {"field": "role"},
                     "aggs": {"c": {"terms": {"field": "turn_idx"},
                              "aggs": {"h": {"top_hits": {}}}}}}}})
    with pytest.raises(ESQueryError, match="not in docs"):
        es_aggregations(r, {
            "query": {"match": {"text": "neural"}},
            "aggs": {"b": {"terms": {"field": "role"},
                     "aggs": {"h": {"top_hits": {
                         "sort": [{"nope": {"order": "asc"}}]}}}}}})


def test_histogram_and_range_aggs(spark, es_setup):
    """Round-5 bucket aggs: histogram keys are inclusive lower bounds
    ascending; range honors [from, to), overlap (doc counted in every
    matching bucket), empty buckets, and given order."""
    from pyspark.sql import functions as F
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = es_setup
    r = IndexReader(spark, d)
    matched = search(r, "neural", k=10**6, with_text=False,
                     _all_matches=True).select("doc_id")
    base = (r.docs.join(matched, "doc_id", "left_semi")
            .select("turn_idx").toPandas()["turn_idx"])
    out = es_aggregations(r, {
        "query": {"match": {"text": "neural"}},
        "aggs": {"h": {"histogram": {"field": "turn_idx",
                                     "interval": 50}}}}).collect()
    keys = [x.key for x in out]
    assert keys == sorted(keys)
    assert {x.key: x.doc_count for x in out} == \
        dict(((base // 50) * 50).astype(float).value_counts())
    rg = es_aggregations(r, {
        "query": {"match": {"text": "neural"}},
        "aggs": {"rg": {"range": {"field": "turn_idx", "ranges": [
            {"to": 100}, {"from": 50, "to": 150},
            {"from": 10**6}, {"from": 150}]}}}}).collect()
    assert [x.key for x in rg] == ["*-100", "50-150", "1e+06-*", "150-*"]
    assert [x.doc_count for x in rg] == [
        int((base < 100).sum()), int(((base >= 50) & (base < 150)).sum()),
        0, int((base >= 150).sum())]
    # overlap: bucket sum exceeds the match count when ranges overlap
    assert sum(x.doc_count for x in rg[:2]) >= int((base < 150).sum())


def test_significant_terms_jlh(spark, es_setup):
    """significant_terms == a pandas recomputation of JLH over the
    analyzed match set vs the index term dictionary, and the query's
    own terms rank at the top (the ES sanity property)."""
    import pandas as pd
    from research_engine_spark.functions.analyzer import analyze
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = es_setup
    r = IndexReader(spark, d)
    out = es_aggregations(r, {
        "query": {"match": {"text": "neural networks"}},
        "aggs": {"sig": {"significant_terms": {"field": "text",
                                               "size": 15}}}}).collect()
    assert out and out[0].key in ("neural", "network")
    # driver-side oracle: tokenize fg + bg with the same analyzer
    docs = r.docs.select("doc_id", "text").toPandas()
    docs["terms"] = docs["text"].map(lambda t: set(analyze(t)))
    matched = {x.doc_id for x in search(
        r, "neural networks", k=10**6, with_text=False,
        _all_matches=True).collect()}
    fg_docs = docs[docs["doc_id"].isin(matched)]
    n_fg, n_bg = len(fg_docs), len(docs)
    fg = pd.Series([t for s in fg_docs["terms"] for t in s]).value_counts()
    bg = pd.Series([t for s in docs["terms"] for t in s]).value_counts()
    rows = []
    for term, c in fg.items():
        if c < 3:
            continue
        fgp, bgp = c / n_fg, bg[term] / n_bg
        s = (fgp - bgp) * (fgp / bgp)
        if s > 0:
            rows.append((term, int(c), int(bg[term]), s))
    rows.sort(key=lambda x: (-x[3], x[0]))
    want = rows[:15]
    got = [(x.key, x.doc_count, x.bg_count, x.score) for x in out]
    assert [(k, dc, bc) for k, dc, bc, _ in got] == \
        [(k, dc, bc) for k, dc, bc, _ in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], rel=1e-12)
    with pytest.raises(ESQueryError, match="foreground query"):
        es_aggregations(r, {"aggs": {"s": {"significant_terms": {
            "field": "text"}}}})
    with pytest.raises(ESQueryError, match="field 'text'"):
        es_aggregations(r, {"query": {"match": {"text": "neural"}},
                            "aggs": {"s": {"significant_terms": {
                                "field": "role"}}}})


def test_composite_agg_pages_tile_exactly(spark, es_setup):
    """composite pages (ascending key tuples, strictly-after cursor)
    concatenate to exactly the full bucket frame — the search_after
    property applied to bucket export."""
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = es_setup
    r = IndexReader(spark, d)
    body = lambda after: {
        "query": {"match": {"text": "neural"}},
        "aggs": {"c": {"composite": {
            "size": 3, "sources": [
                {"role": {"terms": {"field": "role"}}},
                {"ti": {"histogram": {"field": "turn_idx",
                                      "interval": 100}}}],
            **({"after": after} if after else {})},
            "aggs": {"m": {"max": {"field": "turn_idx"}}}}}}
    big = es_aggregations(r, {
        "query": {"match": {"text": "neural"}},
        "aggs": {"c": {"composite": {"size": 10**6, "sources": [
            {"role": {"terms": {"field": "role"}}},
            {"ti": {"histogram": {"field": "turn_idx",
                                  "interval": 100}}}]},
            "aggs": {"m": {"max": {"field": "turn_idx"}}}}}}).collect()
    pages, cur = [], None
    for _ in range(1000):
        rows = es_aggregations(r, body(cur)).collect()
        if not rows:
            break
        assert len(rows) <= 3
        pages += rows
        cur = {"role": rows[-1].role, "ti": rows[-1].ti}
    tup = lambda rs: [(x.role, x.ti, x.doc_count, x.m) for x in rs]
    assert tup(pages) == tup(big)
    keys = [(x.role, x.ti) for x in big]
    assert keys == sorted(keys)  # ascending tuple order
    with pytest.raises(ESQueryError, match="lacks source keys"):
        es_aggregations(r, body({"role": "user"}))
    with pytest.raises(ESQueryError, match="composite source type"):
        es_aggregations(r, {"query": {"match": {"text": "neural"}},
                            "aggs": {"c": {"composite": {"sources": [
                                {"x": {"range": {"field": "turn_idx"}}}]
                            }}}})


def test_filters_agg_named_buckets(spark, es_setup):
    """filters agg: named clause buckets over the outer match set,
    overlap allowed, empty buckets return doc_count 0 with NULL
    metrics, name-ordered output."""
    from pyspark.sql import functions as F
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = es_setup
    r = IndexReader(spark, d)
    out = es_aggregations(r, {
        "query": {"match": {"text": "neural"}},
        "aggs": {"f": {"filters": {"filters": {
            "w_network": {"match": {"text": "network"}},
            "users": {"range": {"turn_idx": {"gte": 100}}},
            "empty": {"match": {"text": "qqqabsent"}}}},
            "aggs": {"m": {"max": {"field": "turn_idx"}}}}}}).collect()
    got = {x.key: (x.doc_count, x.m) for x in out}
    assert [x.key for x in out] == sorted(got)  # name order
    matched = search(r, "neural", k=10**6, with_text=False,
                     _all_matches=True).select("doc_id")
    base = r.docs.join(matched, "doc_id", "left_semi")
    net = search(r, "network", k=10**6, with_text=False,
                 _all_matches=True).select("doc_id")
    inter = base.join(net, "doc_id", "left_semi")
    assert got["w_network"] == (
        inter.count(),
        inter.agg(F.max("turn_idx")).collect()[0][0])
    assert got["users"][0] == base.filter(
        F.col("turn_idx") >= 100).count()
    assert got["empty"] == (0, None)
    with pytest.raises(ESQueryError, match="name: clause"):
        es_aggregations(r, {"aggs": {"f": {"filters": {}}}})


def test_filter_missing_global_aggs(spark, es_setup):
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = es_setup
    r = IndexReader(spark, d)
    q = {"match": {"text": "neural"}}
    matched = {x.doc_id for x in
               search(r, "neural", k=10**6, with_text=False,
                      _all_matches=True).select("doc_id").collect()}
    # filter: match set ∩ clause
    row = es_aggregations(r, {"query": q, "aggs": {"g": {
        "filter": {"match": {"text": "networks"}}}}}).collect()[0]
    nets = {x.doc_id for x in
            search(r, "networks", k=10**6, with_text=False,
                   _all_matches=True).select("doc_id").collect()}
    assert row.doc_count == len(matched & nets) > 0
    # global: ignores the query entirely
    row = es_aggregations(r, {"query": q, "aggs": {"g": {
        "global": {}}}}).collect()[0]
    assert row.doc_count == r.docs.count()
    # missing: ts is never null in this corpus -> 0; unknown field loud
    row = es_aggregations(r, {"query": q, "aggs": {"g": {
        "missing": {"field": "ts"}}}}).collect()[0]
    assert row.doc_count == 0
    with pytest.raises(ESQueryError, match="not in docs table"):
        es_aggregations(r, {"aggs": {"g": {
            "missing": {"field": "nope"}}}})


def test_extended_stats_weighted_avg_mad(spark, es_setup):
    """Round-5 wave: extended_stats (population moments, ES default),
    weighted_avg (Σvw/Σw), and EXACT median_absolute_deviation —
    verified against direct numpy recomputation over the match set,
    per bucket and bare."""
    import numpy as np
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = es_setup
    r = IndexReader(spark, d)
    out = {x.key: x for x in es_aggregations(r, {
        "query": {"match": {"text": "neural"}},
        "aggs": {"by_role": {"terms": {"field": "role"}, "aggs": {
            "xs": {"extended_stats": {"field": "turn_idx"}},
            "wa": {"weighted_avg": {"value": {"field": "turn_idx"},
                                    "weight": {"field": "turn_idx"}}},
            "mad": {"median_absolute_deviation": {"field": "turn_idx"}},
        }}}}).collect()}
    matched = search(r, "neural", k=10**6, with_text=False,
                     _all_matches=True).select("doc_id")
    base = r.docs.join(matched, "doc_id", "left_semi").toPandas()
    assert len(out) > 1
    for role, grp in base.groupby("role"):
        got = out[role]
        ti = grp["turn_idx"].to_numpy(np.float64)
        assert got.xs_count == len(ti)
        assert got.xs_sum_of_squares == pytest.approx((ti * ti).sum())
        assert got.xs_variance == pytest.approx(ti.var())  # population
        assert got.xs_std_deviation == pytest.approx(ti.std())
        assert got.wa == pytest.approx((ti * ti).sum() / ti.sum())
        med = np.percentile(ti, 50, method="linear")
        assert got.mad == pytest.approx(
            np.percentile(np.abs(ti - med), 50, method="linear"))
    # bare MAD: one row over the whole match set
    ti = base["turn_idx"].to_numpy(np.float64)
    med = np.percentile(ti, 50, method="linear")
    row = es_aggregations(r, {
        "query": {"match": {"text": "neural"}},
        "aggs": {"m": {"median_absolute_deviation":
                       {"field": "turn_idx"}}}}).collect()[0]
    assert row.m == pytest.approx(
        np.percentile(np.abs(ti - med), 50, method="linear"))
    # loud errors: missing fields, bad composition
    with pytest.raises(ESQueryError, match="value.field"):
        es_aggregations(r, {"aggs": {"by": {
            "terms": {"field": "role"},
            "aggs": {"w": {"weighted_avg": {"value": {}}}}}}})
    with pytest.raises(ESQueryError, match="does not compose"):
        es_aggregations(r, {"aggs": {"by": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"m": {"median_absolute_deviation":
                           {"field": "turn_idx"}},
                     "c": {"cumulative_sum": {"buckets_path": "m"}}}}}})


def test_multi_terms_rare_terms_adjacency(spark, es_setup):
    """Round-5 wave: multi_terms (tuple buckets, key_as_string),
    rare_terms (exact long tail, doc_count asc), adjacency_matrix
    (filters + pairwise intersections, empty buckets omitted)."""
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = es_setup
    r = IndexReader(spark, d)
    q = {"match": {"text": "neural"}}
    matched = search(r, "neural", k=10**6, with_text=False,
                     _all_matches=True).select("doc_id")
    base = r.docs.join(matched, "doc_id", "left_semi").toPandas()

    # multi_terms == pandas two-key groupby, keys joined by "|"
    out = es_aggregations(r, {"query": q, "aggs": {"mt": {
        "multi_terms": {"terms": [{"field": "role"},
                                  {"field": "turn_idx"}]}}}}).toPandas()
    want = (base.groupby(["role", "turn_idx"]).size()
            .reset_index(name="n"))
    want["key"] = want["role"] + "|" + want["turn_idx"].astype(str)
    assert dict(zip(out["key"], out["doc_count"])) == \
        dict(zip(want["key"], want["n"]))
    # ordering: doc_count desc then key asc; size truncates
    pairs = list(zip(-out["doc_count"], out["key"]))
    assert pairs == sorted(pairs)
    top3 = es_aggregations(r, {"query": q, "aggs": {"mt": {
        "multi_terms": {"terms": [{"field": "role"},
                                  {"field": "turn_idx"}],
                        "size": 3}}}}).toPandas()
    assert top3["key"].tolist() == out["key"].tolist()[:3]

    # rare_terms: exactly the keys whose count <= max_doc_count
    out = es_aggregations(r, {"query": q, "aggs": {"rt": {
        "rare_terms": {"field": "turn_idx",
                       "max_doc_count": 2}}}}).toPandas()
    cnt = base.groupby("turn_idx").size()
    assert sorted(out["key"].astype(int).tolist()) == \
        sorted(cnt[cnt <= 2].index.tolist())
    assert (out["doc_count"] <= 2).all()
    pairs = list(zip(out["doc_count"], out["key"].astype(int)))
    assert pairs == sorted(pairs)

    # adjacency_matrix: per-filter buckets + nonzero pairwise
    # intersections, keys sorted; 'nomatch' legs omitted
    out = es_aggregations(r, {"query": q, "aggs": {"am": {
        "adjacency_matrix": {"filters": {
            "usr": {"term": {"role": "user"}},
            "net": {"match": {"text": "networks"}},
            "zzz": {"match": {"text": "zzznomatch"}},
        }}}}}).toPandas()
    got = dict(zip(out["key"], out["doc_count"]))
    nets = {x.doc_id for x in
            search(r, "networks", k=10**6, with_text=False,
                   _all_matches=True).select("doc_id").collect()}
    usr_ids = set(base.loc[base["role"] == "user", "doc_id"])
    m_ids = set(base["doc_id"])
    want = {"usr": len(usr_ids), "net": len(m_ids & nets),
            "net&usr": len(usr_ids & nets)}
    assert got == {k: v for k, v in want.items() if v > 0}
    assert out["key"].tolist() == sorted(out["key"].tolist())


def test_term_on_stored_keyword_field(spark, es_setup):
    """term/terms on a field that is a stored docs column (not an
    indexed text field) get ES keyword semantics — exact unanalyzed
    value match, constant score = boost — on both evaluation paths."""
    d, _ = es_setup
    local, dist = _readers(spark, d)
    n_user = dist.docs.filter("role = 'user'").count()
    body = {"query": {"term": {"role": {"value": "user", "boost": 2.0}}},
            "size": 10**6}
    for r in (local, dist):
        rows = es_search(r, body).collect()
        assert len(rows) == n_user > 0
        assert all(x.score == 2.0 for x in rows)
    n_ut = dist.docs.filter("role in ('user', 'tool')").count()
    body = {"query": {"terms": {"role": ["user", "tool"]}}, "size": 10**6}
    for r in (local, dist):
        assert es_search(r, body).count() == n_ut
    # numeric stored column: raw (unstringified) comparison
    n_t3 = dist.docs.filter("turn_idx = 3").count()
    got = es_search(dist, {"query": {"terms": {"turn_idx": [3]}},
                           "size": 10**6}).count()
    assert got == n_t3 > 0
    # an indexed field name still routes to the inverted index
    assert es_search(dist, {"query": {"term": {"text": "neural"}},
                            "size": 5}).count() == 5


@pytest.fixture(scope="module")
def knn_setup(spark):
    """A small index whose docs table stores a deterministic 4-dim
    dense-vector column (build_index stored_fields plumbing)."""
    from pyspark.sql import functions as F

    tx = synth_transcripts(spark, n_convs=30, seed=33)
    dims = [((F.col("turn_idx") * m + o) % 17).cast("double") / 17.0 - 0.5
            for m, o in ((7, 1), (11, 3), (5, 9), (13, 2))]
    tx = tx.withColumn("emb", F.array(*dims))
    d = tempfile.mkdtemp(prefix="esdsl_knn_")
    build_index(tx, d, n_buckets=4, stored_fields=["emb"])
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_knn_search(spark, knn_setup):
    """Top-level knn: exact brute-force similarity over the stored
    vector column, ES _score transforms, hybrid sum with `query`."""
    r = IndexReader(spark, knn_setup)
    docs = r.docs.select("doc_id", "emb").toPandas()
    X = np.stack(docs["emb"].to_numpy())
    ids = docs["doc_id"].to_numpy(np.int64)
    qv = [0.25, -0.125, 0.5, -0.0625]
    q = np.asarray(qv, dtype=np.float64)

    def np_topk(scores, k):
        order = np.lexsort((ids, -scores))[:k]
        return list(zip(ids[order],
                        np.round(scores[order], 10).tolist()))

    # cosine (default): (1 + cos)/2, top-k by (score desc, doc_id asc)
    cos = (1.0 + (X @ q) / (np.linalg.norm(X, axis=1)
                            * np.linalg.norm(q))) / 2.0
    got = _pairs(es_search(r, {"knn": {"field": "emb",
                                       "query_vector": qv, "k": 7},
                               "size": 7}))
    assert got == np_topk(cos, 7)

    # l2_norm and max_inner_product transforms
    l2 = 1.0 / (1.0 + ((X - q) ** 2).sum(axis=1))
    got = _pairs(es_search(r, {"knn": {"field": "emb", "query_vector": qv,
                                       "k": 5, "similarity": "l2_norm"},
                               "size": 5}))
    assert got == np_topk(l2, 5)
    dot = X @ q
    mip = np.where(dot < 0, 1.0 / (1.0 - dot), dot + 1.0)
    got = _pairs(es_search(
        r, {"knn": {"field": "emb", "query_vector": qv, "k": 5,
                    "similarity": "max_inner_product"}, "size": 5}))
    assert got == np_topk(mip, 5)

    # hybrid: query contributes to every match, knn (boosted) only to
    # its own top-k docs; both legs sum where they overlap
    body = {"query": {"match": {"text": "neural networks"}},
            "knn": {"field": "emb", "query_vector": qv, "k": 10,
                    "boost": 3.0},
            "size": 2000}
    got = dict(_pairs(es_search(r, body)))
    match_sc = dict(_pairs(search(r, "neural networks", k=10**6,
                                  with_text=False, _all_matches=True)))
    knn_sc = dict(np_topk(3.0 * cos, 10))
    want = {i: round(match_sc.get(i, 0.0) + knn_sc.get(i, 0.0), 10)
            for i in set(match_sc) | set(knn_sc)}
    assert {i: round(s, 9) for i, s in got.items()} == \
        {i: round(s, 9) for i, s in want.items()}

    # loud rejections
    for bad in (
            {"knn": {"field": "emb", "query_vector": qv, "k": 5,
                     "num_candidates": 2}},
            {"knn": {"field": "emb", "query_vector": qv,
                     "similarity": "hamming"}},
            {"knn": {"field": "nope", "query_vector": qv}},
            {"knn": {"field": "emb", "query_vector": []}},
            {"knn": {"field": "emb", "query_vector": qv},
             "sort": [{"turn_idx": "asc"}]},
            {"knn": {"field": "emb", "query_vector": qv},
             "highlight": {"fields": {"text": {}}}},
    ):
        with pytest.raises(ESQueryError):
            es_search(r, bad).collect()


def test_match_bool_prefix(spark, es_setup):
    """match_bool_prefix == bool(term... + prefix(last)) on both
    paths; operator:and == bool must; empty analysis rejected."""
    d, _ = es_setup
    local, dist = _readers(spark, d)
    body = {"query": {"match_bool_prefix": {"text": "neural netw"}},
            "size": 10**6}
    manual = {"query": {"bool": {"should": [
        {"term": {"text": {"value": "neural"}}},
        {"prefix": {"text": {"value": "netw"}}}]}}, "size": 10**6}
    want = _pairs(es_search(dist, manual))
    for r in (local, dist):
        assert _pairs(es_search(r, body)) == want
    banded = {"query": {"match_bool_prefix": {
        "text": {"query": "neural netw", "operator": "and"}}},
        "size": 10**6}
    manual_and = {"query": {"bool": {"must": [
        {"term": {"text": {"value": "neural"}}},
        {"prefix": {"text": {"value": "netw"}}}]}}, "size": 10**6}
    want_and = _pairs(es_search(dist, manual_and))
    assert len(want_and) < len(want)
    for r in (local, dist):
        assert _pairs(es_search(r, banded)) == want_and
    with pytest.raises(ESQueryError):
        es_search(dist, {"query": {"match_bool_prefix": {"text": "!!"}}})


def test_rank_feature(spark, knn_setup):
    """rank_feature: ES's four transforms over a stored numeric docs
    column, positive-only match set, exact-geometric-mean default
    pivot."""
    from research_engine_spark.operators.esdsl import es_search

    r = IndexReader(spark, knn_setup)
    docs = r.docs.select("doc_id", "turn_idx").toPandas()
    pos = docs[docs["turn_idx"] > 0]
    t = pos["turn_idx"].to_numpy(np.float64)
    ids = pos["doc_id"].to_numpy(np.int64)

    def np_top(scores, k):
        order = np.lexsort((ids, -scores))[:k]
        return list(zip(ids[order], np.round(scores[order], 10)))

    got = _pairs(es_search(r, {"query": {"rank_feature": {
        "field": "turn_idx", "saturation": {"pivot": 8},
        "boost": 0.7}}, "size": 25}))
    assert got == np_top(0.7 * t / (t + 8.0), 25)
    # default pivot: exact geometric mean of the positive values
    got = _pairs(es_search(r, {"query": {"rank_feature": {
        "field": "turn_idx"}}, "size": 25}))
    g = float(np.exp(np.mean(np.log(t))))
    assert got == np_top(t / (t + g), 25)
    got = _pairs(es_search(r, {"query": {"rank_feature": {
        "field": "turn_idx", "log": {"scaling_factor": 2}}},
        "size": 25}))
    assert got == np_top(np.log(2.0 + t), 25)
    got = _pairs(es_search(r, {"query": {"rank_feature": {
        "field": "turn_idx", "sigmoid": {"pivot": 7, "exponent": 0.6}}},
        "size": 25}))
    assert got == np_top(t ** 0.6 / (t ** 0.6 + 7.0 ** 0.6), 25)
    # the ES idiom: relevance + rank_feature as an additive should leg
    hp = es_search(r, {"query": {"bool": {
        "must": [{"match": {"text": "neural"}}],
        "should": [{"rank_feature": {"field": "turn_idx",
                                     "saturation": {"pivot": 8}}}]}},
        "size": 10**6}).toPandas()
    bp = es_search(
        r, {"query": {"match": {"text": "neural"}},
            "size": 10**6}).toPandas()
    base = dict(zip(bp["doc_id"], bp["score"]))
    sat = dict(zip(ids.tolist(), t / (t + 8.0)))
    got = dict(zip(hp["doc_id"], hp["score"]))
    assert set(got) == set(base)
    assert all(abs(s - (base[i] + sat.get(i, 0.0))) < 1e-9
               for i, s in got.items())
    for bad in (
            {"rank_feature": {"field": "nope"}},
            {"rank_feature": {"field": "turn_idx", "log": {},
                              "linear": {}}},
            {"rank_feature": {"field": "turn_idx",
                              "sigmoid": {"pivot": 7}}},
    ):
        with pytest.raises(ESQueryError):
            es_search(r, {"query": bad}).collect()


def test_sampler_percentile_ranks_moving_fn(spark, es_setup):
    """Round-5 wave: sampler / diversified_sampler (deterministic
    exact top-scored sample), percentile_ranks (exact), moving_fn +
    serial_diff parent pipelines over an ordered histogram."""
    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = es_setup
    r = IndexReader(spark, d)
    q = {"match": {"text": "neural"}}
    sc = search(r, "neural", k=10**6, with_text=False,
                _all_matches=True).select("doc_id", "score").toPandas()
    docs = r.docs.select("doc_id", "role", "turn_idx").toPandas()
    base = (sc.merge(docs, on="doc_id")
            .sort_values(["score", "doc_id"], ascending=[False, True]))

    out = es_aggregations(r, {"query": q, "aggs": {"s": {
        "sampler": {"shard_size": 20},
        "aggs": {"a": {"avg": {"field": "turn_idx"}}}}}}).collect()
    top = base.head(20)
    assert out[0].doc_count == len(top) == 20
    assert abs(out[0].a - top["turn_idx"].mean()) < 1e-9

    out = es_aggregations(r, {"query": q, "aggs": {"s": {
        "diversified_sampler": {"shard_size": 10, "field": "role",
                                "max_docs_per_value": 2},
        "aggs": {"a": {"avg": {"field": "turn_idx"}}}}}}).collect()
    div = (base.groupby("role", group_keys=False).head(2)
           .sort_values(["score", "doc_id"],
                        ascending=[False, True]).head(10))
    assert out[0].doc_count == len(div)
    assert abs(out[0].a - div["turn_idx"].mean()) < 1e-9

    out = es_aggregations(r, {"query": q, "aggs": {"pr": {
        "percentile_ranks": {"field": "turn_idx",
                             "values": [50, 150]}}}}).collect()
    t = base["turn_idx"].to_numpy(np.float64)
    assert abs(out[0].pr_50 - 100.0 * (t <= 50).mean()) < 1e-9
    assert abs(out[0].pr_150 - 100.0 * (t <= 150).mean()) < 1e-9

    out = es_aggregations(r, {"query": q, "aggs": {"h": {
        "histogram": {"field": "turn_idx", "interval": 50},
        "aggs": {"m": {"sum": {"field": "turn_idx"}},
                 "mv": {"moving_fn": {"buckets_path": "m", "window": 3,
                        "script": "MovingFunctions.sum(values)"}},
                 "sd": {"serial_diff": {"buckets_path": "m",
                                        "lag": 2}}}}}}).toPandas()
    m = out["m"].to_numpy(np.float64)
    mv = out["mv"].to_numpy(np.float64)
    sd = out["sd"].to_numpy(np.float64)
    assert len(m) >= 4
    for i in range(len(m)):
        if i == 0:
            assert np.isnan(mv[i])
        else:
            assert abs(mv[i] - m[max(0, i - 3):i].sum()) < 1e-9
        if i < 2:
            assert np.isnan(sd[i])
        else:
            assert abs(sd[i] - (m[i] - m[i - 2])) < 1e-9

    with pytest.raises(ESQueryError):  # match_all has no scores
        es_aggregations(r, {"aggs": {"s": {"sampler": {}}}}).collect()
    with pytest.raises(ESQueryError):  # moving_fn under terms
        es_aggregations(r, {"query": q, "aggs": {"t": {
            "terms": {"field": "role"},
            "aggs": {"m": {"sum": {"field": "turn_idx"}},
                     "mv": {"moving_fn": {
                         "buckets_path": "m", "window": 2,
                         "script": "MovingFunctions.sum(values)"}}}}}}
        ).collect()
    with pytest.raises(ESQueryError):  # script not whitelisted
        es_aggregations(r, {"query": q, "aggs": {"h": {
            "histogram": {"field": "turn_idx", "interval": 50},
            "aggs": {"m": {"sum": {"field": "turn_idx"}},
                     "mv": {"moving_fn": {
                         "buckets_path": "m", "window": 2,
                         "script": "params.x * 2"}}}}}}).collect()


def test_scroll(spark, es_setup):
    """es_scroll pages tile exactly the full (score desc, doc_id asc)
    ordering on both evaluation paths; pagination keys rejected."""
    from research_engine_spark.operators.esdsl import es_scroll

    d, _ = es_setup
    local, dist = _readers(spark, d)
    want = _pairs(es_search(dist, {"query": {"match": {"text": Q}},
                                   "size": 10**6}))
    for r in (local, dist):
        pages = list(es_scroll(r, {"query": {"match": {"text": Q}},
                                   "size": 7}))
        assert all(len(p) == 7 for p in pages[:-1])
        assert 0 < len(pages[-1]) <= 7
        got = [(x.doc_id, round(float(x.score), 10))
               for p in pages for x in p]
        assert got == [(i, round(float(s), 10)) for i, s in want]
    with pytest.raises(ESQueryError, match="scroll does not compose"):
        next(es_scroll(dist, {"query": {"match": {"text": Q}},
                              "from": 3}))


def test_wrapper_pinned_distance_feature(spark, es_setup):
    """Round-5 closing corners: wrapper (base64 clause), pinned
    (explicit ids above every organic hit, given order),
    distance_feature (closeness scoring on a stored numeric column)."""
    import base64
    import json

    d, _ = es_setup
    local, dist = _readers(spark, d)

    # wrapper == the decoded clause, both paths
    inner = {"match": {"text": Q}}
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    want = _pairs(es_search(dist, {"query": inner, "size": 10}))
    for r in (local, dist):
        got = _pairs(es_search(
            r, {"query": {"wrapper": {"query": b64}}, "size": 10}))
        assert got == want

    # wrapper smuggling a query_string payload (ADVICE r5: the text-
    # syntax expansion pass ran before dispatch, so the decoded clause
    # was rejected as unsupported) == the expanded clause directly
    qs_inner = {"query_string": {"query": Q, "default_field": "text"}}
    qs_b64 = base64.b64encode(json.dumps(qs_inner).encode()).decode()
    want_qs = _pairs(es_search(dist, {"query": qs_inner, "size": 10}))
    for r in (local, dist):
        got = _pairs(es_search(
            r, {"query": {"wrapper": {"query": qs_b64}}, "size": 10}))
        assert got == want_qs

    # pinned: the given ids (that exist) lead in order, organic follows
    # unchanged minus the pinned ids; unknown ids are dropped
    organic = {"match": {"text": Q}}
    base = _pairs(es_search(dist, {"query": organic, "size": 10**6}))
    pins = [base[5][0], base[2][0], 10**9]  # two real hits + a ghost
    for r in (local, dist):
        got = _pairs(es_search(r, {"query": {"pinned": {
            "ids": pins, "organic": organic}}, "size": 10**6}))
        assert [i for i, _ in got[:2]] == pins[:2]
        assert got[0][1] > got[1][1] > 1e30
        rest = [i for i, _ in got[2:]]
        assert rest == [i for i, _ in base if i not in pins[:2]]

    # distance_feature: boost * pivot / (pivot + |x - origin|)
    r = dist
    docs = r.docs.select("doc_id", "turn_idx").toPandas()
    t = docs["turn_idx"].to_numpy(np.float64)
    ids = docs["doc_id"].to_numpy(np.int64)
    sc = 2.0 * 25.0 / (25.0 + np.abs(t - 40.0))
    order = np.lexsort((ids, -sc))[:15]
    want = list(zip(ids[order], np.round(sc[order], 10)))
    got = _pairs(es_search(r, {"query": {"distance_feature": {
        "field": "turn_idx", "origin": 40, "pivot": 25, "boost": 2.0}},
        "size": 15}))
    assert got == want

    # loud error surface
    for bad in (
            {"wrapper": {"query": "!!!notb64"}},
            {"pinned": {"ids": [], "organic": organic}},
            {"pinned": {"ids": [1, 1], "organic": organic}},
            {"pinned": {"ids": list(range(101)), "organic": organic}},
            {"distance_feature": {"field": "turn_idx", "origin": 1}},
            {"distance_feature": {"field": "nope", "origin": 1,
                                  "pivot": 5}},
            {"distance_feature": {"field": "turn_idx", "origin": 1,
                                  "pivot": 0}},
    ):
        with pytest.raises(ESQueryError):
            es_search(dist, {"query": bad}).collect()


def test_field_caps(spark, es_setup):
    from research_engine_spark.api import ResearchEngine

    d, _ = es_setup
    caps = ResearchEngine(spark, d).field_caps()
    assert caps["text"]["searchable"] and caps["text"]["type"] == "string"
    assert caps["turn_idx"]["aggregatable"]
    assert not caps["role"]["searchable"]
    assert "doc_id" not in caps


def test_auto_date_histogram(spark, es_setup):
    """auto_date_histogram: smallest ladder interval fitting the
    bucket target, buckets == pandas recompute at that interval,
    metric sub-aggs ride along."""
    from research_engine_spark.operators.esdsl import (
        _ADH_FIXED,
        es_aggregations,
    )

    d, _ = es_setup
    r = IndexReader(spark, d)
    q = {"match": {"text": "neural"}}
    base = (r.docs.join(
        search(r, "neural", k=10**6, with_text=False,
               _all_matches=True).select("doc_id"), "doc_id",
        "left_semi").select("doc_id", "ts", "turn_idx").toPandas())
    span = (base["ts"].max() - base["ts"].min()).total_seconds()

    for target in (4, 12, 40):
        out = es_aggregations(r, {"query": q, "aggs": {"a": {
            "auto_date_histogram": {"field": "ts", "buckets": target},
            "aggs": {"m": {"max": {"field": "turn_idx"}}}}}}).toPandas()
        assert len(out) <= target
        assert out["doc_count"].sum() == len(base)
        label = out["interval"].iloc[0]
        secs = dict(_ADH_FIXED)
        assert label in secs  # this corpus spans days, not years
        sec = secs[label]
        assert span / sec + 1 <= target  # fits...
        smaller = [s for _, s in _ADH_FIXED if s < sec]
        if smaller:  # ...and is the SMALLEST ladder entry that fits
            assert span / smaller[-1] + 1 > target
        grp = base.assign(
            key=(base["ts"].astype("int64") // 10**9 // sec) * sec)
        want = grp.groupby("key").agg(n=("doc_id", "count"),
                                      m=("turn_idx", "max"))
        got_keys = out["key"].astype("int64") // 10**9
        assert dict(zip(got_keys, out["doc_count"])) == \
            dict(want["n"])
        assert dict(zip(got_keys, out["m"])) == dict(want["m"])
        assert list(got_keys) == sorted(got_keys)

    with pytest.raises(ESQueryError):
        es_aggregations(r, {"query": q, "aggs": {"a": {
            "auto_date_histogram": {"field": "ts"},
            "aggs": {"c": {"cumulative_sum":
                           {"buckets_path": "_count"}}}}}}).collect()


def test_min_score_top_level(spark, es_setup):
    """Top-level `min_score`: hits scoring below the threshold are
    excluded BEFORE pagination, identically on the serving and
    distributed paths and under every result-shaping mode (plain,
    sort, collapse, knn-hybrid); rescore rejects it loudly."""
    d, _ = es_setup
    local, dist = _readers(spark, d)
    q = {"match": {"text": Q}}
    base = _pairs(es_search(dist, {"query": q, "size": 10**6}))
    distinct = sorted({s for _, s in base}, reverse=True)
    assert len(distinct) > 3
    # midway between two adjacent distinct values: no score ties the
    # cut, so rounding in _pairs can't flip a boundary doc
    mid = len(distinct) // 2
    cut = (distinct[mid] + distinct[mid + 1]) / 2.0
    want = [(i, s) for i, s in base if s >= cut]
    assert 0 < len(want) < len(base)
    for r in (local, dist):
        got = _pairs(es_search(
            r, {"query": q, "min_score": cut, "size": 10**6}))
        assert got == want
        # pagination applies AFTER the cut
        page = _pairs(es_search(
            r, {"query": q, "min_score": cut, "from": 2, "size": 3}))
        assert page == want[2:5]

    # with a field sort: the survivor set is the same, order by field
    srt = es_search(dist, {"query": q, "min_score": cut, "size": 10**6,
                           "sort": [{"turn_idx": "asc"}]})
    assert sorted(i for i, _ in _pairs(srt)) == \
        sorted(i for i, _ in want)

    # with collapse: groups form over survivors only
    col = _pairs(es_search(dist, {"query": q, "min_score": cut,
                                  "size": 10**6,
                                  "collapse": {"field": "role"}}))
    assert set(col) <= set(want)
    assert all(s >= cut for _, s in col)

    # a cut above the max score yields zero rows, not an error
    top = max(s for _, s in base)
    assert es_search(dist, {"query": q, "min_score": top * 2 + 1,
                            "size": 10}).count() == 0

    with pytest.raises(ESQueryError, match="min_score with rescore"):
        es_search(dist, {
            "query": q, "min_score": cut,
            "rescore": {"window_size": 20,
                        "query": {"rescore_query": q}}}).collect()


def test_date_range_missing_param_min_doc_count(spark, es_setup):
    """Round-5 additions: date_range buckets ([from,to) on a timestamp
    column, overlap allowed, verbatim ISO keys), the terms `missing`
    param (nulls bucket under the substitute), and histogram /
    date_histogram min_doc_count — >1 filters buckets, 0 returns the
    empty buckets of the span (extended_bounds widens it), with the
    ladder keys bit-identical to populated groupBy keys."""
    import pandas as pd

    from research_engine_spark.operators.esdsl import es_aggregations

    d, _ = es_setup
    r = IndexReader(spark, d)
    q = {"match": {"text": "neural"}}
    base = (search(r, "neural", k=10**6, with_text=False,
                   _all_matches=True).select("doc_id")
            .join(r.docs, "doc_id").toPandas())

    # date_range: [from,to) semantics, overlapping + open-edged ranges
    ts = base["ts"]
    lo_iso = str(ts.quantile(0.25).floor("s"))
    hi_iso = str(ts.quantile(0.75).floor("s"))
    out = es_aggregations(r, {"query": q, "aggs": {"g": {
        "date_range": {"field": "ts", "ranges": [
            {"from": lo_iso, "to": hi_iso},
            {"from": lo_iso},
            {"to": lo_iso},
        ]}}}}).toPandas()
    lo_t, hi_t = pd.Timestamp(lo_iso), pd.Timestamp(hi_iso)
    want = [int(((ts >= lo_t) & (ts < hi_t)).sum()),
            int((ts >= lo_t).sum()), int((ts < lo_t).sum())]
    assert out["doc_count"].tolist() == want
    assert out["key"].tolist() == [f"{lo_iso}-{hi_iso}",
                                   f"{lo_iso}-*", f"*-{lo_iso}"]
    assert want[0] > 0 and want[1] != want[0]

    # terms `missing`: nulls bucket under the substitute (tool is null
    # on every non-tool turn in this corpus)
    tx = synth_transcripts(spark, n_convs=20, seed=77)
    import tempfile as _tf

    d2 = _tf.mkdtemp(prefix="esdsl_missing_")
    build_index(tx, d2, n_buckets=2, stored_fields=["tool"])
    r2 = IndexReader(spark, d2)
    got = es_aggregations(r2, {"query": {"match_all": {}}, "aggs": {
        "g": {"terms": {"field": "tool", "missing": "(none)",
                        "size": 100}}}}).toPandas()
    tools = r2.docs.select("tool").toPandas()["tool"]
    exp = tools.fillna("(none)").value_counts()
    assert dict(zip(got["key"], got["doc_count"])) == dict(exp)
    assert "(none)" in set(got["key"])
    # without `missing`, nulls are dropped
    got0 = es_aggregations(r2, {"query": {"match_all": {}}, "aggs": {
        "g": {"terms": {"field": "tool", "size": 100}}}}).toPandas()
    assert dict(zip(got0["key"], got0["doc_count"])) == \
        dict(tools.dropna().value_counts())

    # histogram min_doc_count: default sparse frame as the reference
    hargs = {"field": "turn_idx", "interval": 50.0}
    dflt = es_aggregations(r, {"query": q, "aggs": {"g": {
        "histogram": hargs}}}).toPandas()
    # >1 filters
    flt = es_aggregations(r, {"query": q, "aggs": {"g": {
        "histogram": {**hargs, "min_doc_count": 2}}}}).toPandas()
    assert flt["key"].tolist() == \
        dflt[dflt["doc_count"] >= 2]["key"].tolist()
    # 0 fills the span; populated buckets unchanged, fills are 0
    full = es_aggregations(r, {"query": q, "aggs": {"g": {
        "histogram": {**hargs, "min_doc_count": 0},
        "aggs": {"m": {"avg": {"field": "turn_idx"}}}}}}).toPandas()
    ks = full["key"].to_numpy()
    assert np.allclose(np.diff(ks), 50.0)
    assert ks[0] == dflt["key"].min() and ks[-1] == dflt["key"].max()
    pop = full[full["doc_count"] > 0]
    assert dict(zip(pop["key"], pop["doc_count"])) == \
        dict(zip(dflt["key"], dflt["doc_count"]))
    empt = full[full["doc_count"] == 0]
    assert empt["m"].isna().all()
    # extended_bounds widens beyond the data span
    ext = es_aggregations(r, {"query": q, "aggs": {"g": {
        "histogram": {**hargs, "min_doc_count": 0,
                      "extended_bounds": {"min": -100,
                                          "max": ks[-1] + 100}}}}}) \
        .toPandas()
    assert ext["key"].iloc[0] == -100.0
    assert ext["key"].iloc[-1] == (ks[-1] + 100) // 50 * 50
    assert ext["doc_count"].sum() == dflt["doc_count"].sum()

    # pipeline aggs slide over the gap-filled ladder (the canonical
    # ES use of min_doc_count 0): derivative of _count sees the empty
    # buckets as 0, not a skipped key
    der = es_aggregations(r, {"query": q, "aggs": {"g": {
        "histogram": {**hargs, "min_doc_count": 0},
        "aggs": {"d": {"derivative": {"buckets_path": "_count"}}}}}}) \
        .toPandas()
    assert der["key"].tolist() == full["key"].tolist()
    cnt = full["doc_count"].to_numpy(np.float64)
    assert der["d"].iloc[0] is None or np.isnan(der["d"].iloc[0])
    assert np.allclose(der["d"].to_numpy(np.float64)[1:],
                       np.diff(cnt))

    # date_histogram min_doc_count 0: consecutive day ladder
    dh = es_aggregations(r, {"query": q, "aggs": {"g": {
        "date_histogram": {"field": "ts", "calendar_interval": "day",
                           "min_doc_count": 0}}}}).toPandas()
    days = pd.to_datetime(dh["key"])
    assert (days.diff().dropna() == pd.Timedelta(days=1)).all()
    assert dh["doc_count"].sum() == len(base)

    # loud error surface
    for bad in (
            {"histogram": {**hargs, "min_doc_count": 1,
                           "extended_bounds": {"min": 0, "max": 1}}},
            {"date_histogram": {"field": "ts",
                                "calendar_interval": "day",
                                "min_doc_count": 0,
                                "extended_bounds": {"min": 0,
                                                    "max": 1}}},
            {"histogram": {**hargs, "min_doc_count": -1}},
            {"histogram": {**hargs, "min_doc_count": 0},
             "aggs": {"t": {"terms": {"field": "role"}}}},
            {"date_range": {"field": "ts",
                            "ranges": [{"from": {"bad": 1}}]}},
    ):
        with pytest.raises(ESQueryError):
            es_aggregations(r, {"query": q, "aggs": {"g": bad}})
    import shutil as _sh

    _sh.rmtree(d2, ignore_errors=True)
