"""Tests for R8 multi-query RRF, R9 highlighting, W1 re-chunking, and R2
multi-field best_fields (engine vs oracle max-combination)."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest

from research_engine_spark.operators.retrieval_extras import (
    assemble_context,
    last_n_turns,
    multi_query_search,
    rechunk_conversations,
    with_highlights,
)
from research_engine_spark.operators.scorer import search


def test_multi_query_rrf_matches_manual(reader, oracle):
    queries = ["neural networks", "machine learning"]
    got = multi_query_search(reader, queries, k=10, per_query_k=15).toPandas()
    # manual fusion over oracle lists with the same formula
    scores: dict[int, float] = {}
    for q in queries:
        ora = oracle.search(q, k=15)
        for rank, doc in enumerate(ora["doc_id"], start=1):
            scores[doc] = scores.get(doc, 0.0) + 1.0 / (60 + rank)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got["doc_id"]) == [d for d, _ in want]
    assert np.allclose(got["rrf_score"], [s for _, s in want], atol=1e-12)


def test_highlights(reader):
    hits = search(reader, "neural networks", k=5, with_text=True)
    hl = with_highlights(hits, "neural networks").toPandas()
    assert len(hl) == 5
    assert (hl["highlight"].str.len() > 0).all()
    # the fragment should contain an analyzed query term for top hits
    assert any("neural" in h.lower() or "network" in h.lower()
               for h in hl["highlight"])


def test_assemble_context_and_history(spark, reader, transcripts_df):
    hits = search(reader, "neural networks", k=10, with_text=True)
    ctx = assemble_context(hits, max_chunks=3)
    assert ctx.count("\n\n") <= 2 and len(ctx) > 0
    hist = last_n_turns(transcripts_df, n=4)
    counts = hist.groupBy("conv_id").count().toPandas()
    assert (counts["count"] <= 4).all()


def test_rechunk_geometry(spark):
    # reference semantics (chunk_pdfs_oai.py:71-80): i=0,600,1200 ->
    # windows (0,800),(600,1400),(1200,2000); j==n stops. 3 full chunks.
    # 2100 tokens -> 4th window (1800,2100) = 300 tokens >= min_chunk.
    t2000 = " ".join(f"w{i}" for i in range(2000))
    t2100 = " ".join(f"w{i}" for i in range(2100))
    df = spark.createDataFrame(
        [("c1", 0, "user", t2000, None, None),
         ("c2", 0, "user", "too short", None, None),
         ("c3", 0, "user", t2100, None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    got = rechunk_conversations(df).toPandas().sort_values(
        ["conv_id", "chunk_index"])
    assert sorted(got["conv_id"].unique()) == ["c1", "c3"]  # c2 < min_doc
    c1 = got[got["conv_id"] == "c1"]
    c3 = got[got["conv_id"] == "c3"]
    assert list(c1["token_count"]) == [800, 800, 800]
    assert list(c3["token_count"]) == [800, 800, 800, 300]
    # overlap: chunk 1 starts at step=600 -> first token w600
    assert c1.iloc[1]["chunk_text"].split()[0] == "w600"
    assert c1.iloc[0]["chunk_text"].split()[0] == "w0"


@pytest.mark.parametrize("path", ["driver_local", "distributed"])
def test_multifield_best_fields(spark, transcripts_df, transcripts_pd, path):
    from research_engine_spark.operators.multifield import (
        MultiFieldReader, build_multifield_index, search_multifield)
    from research_engine_spark.oracle import BM25Oracle

    d = tempfile.mkdtemp()
    try:
        boosts = {"text": 3.0, "role": 1.0}
        build_multifield_index(transcripts_df, d, boosts, n_buckets=4)
        mf = MultiFieldReader(spark, d)
        if path == "distributed":
            # pin budget 0 so the union+agg machinery keeps oracle
            # coverage (default readers take the zero-job pandas twin)
            for r in mf.readers.values():
                r.driver_local_max_postings = 0
        # oracle: independent per-field BM25, max-combination
        oracles = {}
        for field in boosts:
            pdf = transcripts_pd.copy()
            pdf["text"] = pdf[field].fillna("").astype(str)
            oracles[field] = BM25Oracle(pdf[["conv_id", "turn_idx", "text"]])
        for q, tb in [("neural assistant", 0.0), ("machine learning", 0.3)]:
            got = search_multifield(mf, q, k=10, tie_breaker=tb).toPandas()
            scores: dict[int, float] = {}
            sums: dict[int, float] = {}
            for field, orc in oracles.items():
                full = orc.search(q, k=orc.n_docs)
                for doc, s in zip(full["doc_id"], full["score"]):
                    v = boosts[field] * s
                    scores[doc] = max(scores.get(doc, 0.0), v)
                    sums[doc] = sums.get(doc, 0.0) + v
            want = sorted(
                ((d_, scores[d_] + tb * (sums[d_] - scores[d_]))
                 for d_ in scores),
                key=lambda kv: (-kv[1], kv[0]))[:10]
            assert list(got["doc_id"]) == [d_ for d_, _ in want], (q, tb)
            assert np.allclose(got["score"], [s for _, s in want],
                               rtol=0, atol=1e-12), (q, tb)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_multi_fragment_highlights(spark):
    from research_engine_spark.operators.retrieval_extras import (
        with_highlights)

    df = spark.createDataFrame(
        [(1, "alpha starts here and then much later the word neural appears "
             "and even later networks shows up at the end")],
        "doc_id long, text string")
    out = with_highlights(df, "neural networks", width=20,
                          max_fragments=3).collect()[0]
    assert len(out["highlights"]) == 2          # one fragment per term
    assert "neural" in out["highlights"][0]     # ordered by match position
    assert "networks" in out["highlights"][1]
    assert " ... " in out["highlight"]
    # cap respected
    out1 = with_highlights(df, "neural networks", width=20,
                           max_fragments=1).collect()[0]
    assert "neural" in out1["highlight"] and " ... " not in out1["highlight"]
