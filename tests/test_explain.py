"""explain() — the ES _explain analog: per-term BM25 breakdown whose
folded score is bit-identical to search()'s, via block-metadata point
lookup (never an O(df) read)."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest

from research_engine_spark.corpus import synth_transcripts
from research_engine_spark.operators.deletes import delete_ids
from research_engine_spark.operators.indexer import append_segment, build_index
from research_engine_spark.operators.scorer import (
    IndexReader,
    explain,
    search,
)

QUERIES = ["neural networks", "machine learning models",
           "What is BERT and how does it work?", "transformer"]


@pytest.fixture(scope="module")
def xp_index(spark):
    tx = synth_transcripts(spark, n_convs=40, seed=13)
    first = tx.filter("conv_id < 'conv_00000020'")
    second = tx.filter("conv_id >= 'conv_00000020'")
    d = tempfile.mkdtemp(prefix="explain_idx_")
    build_index(first, d, n_buckets=4)
    append_segment(second, d)  # multi-segment: overlapping block spans
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("q", QUERIES)
def test_explained_score_is_bit_identical(spark, xp_index, q):
    r = IndexReader(spark, xp_index)
    hits = search(r, q, k=5, with_text=False).collect()
    assert hits
    for h in hits:
        ex = explain(r, q, h.doc_id)
        assert ex["matched"] and not ex["deleted"]
        assert ex["score"] == h.score  # bit-exact, not approx
        # contributions decompose the score
        assert ex["terms"]
        assert np.isclose(sum(t["contribution"] for t in ex["terms"]),
                          ex["score"], rtol=0, atol=1e-12)


def test_explain_term_stats_match_text(spark, xp_index):
    """tf and dl in the breakdown equal recounts over the raw text."""
    from research_engine_spark.functions.analyzer import analyze

    r = IndexReader(spark, xp_index)
    h = search(r, "neural networks", k=1).collect()[0]
    ex = explain(r, "neural networks", h.doc_id)
    toks = analyze(h.text)
    for t in ex["terms"]:
        assert t["tf"] == toks.count(t["term"])
        assert t["dl"] == len(toks)
        assert t["df"] > 0 and t["idf"] > 0


def test_explain_unmatched_and_missing_doc(spark, xp_index):
    r = IndexReader(spark, xp_index)
    ex = explain(r, "zzznonexistentterm", 0)
    assert not ex["matched"] and ex["score"] == 0.0
    ex2 = explain(r, "neural", 10**12)  # doc_id beyond the corpus
    assert not ex2["matched"]


def test_explain_deleted_doc(spark, xp_index):
    r = IndexReader(spark, xp_index)
    victim = search(r, "neural", k=1, with_text=False).collect()[0].doc_id
    delete_ids(xp_index, [victim])
    r = IndexReader(spark, xp_index)
    ex = explain(r, "neural", victim)
    assert ex["deleted"] and not ex["matched"]


def test_explain_fuzzy_clauses(spark, xp_index):
    r = IndexReader(spark, xp_index)
    hits = search(r, "neural netwrks", k=3, with_text=False,
                  fuzzy=True).collect()
    assert hits
    for h in hits:
        ex = explain(r, "neural netwrks", h.doc_id, fuzzy=True)
        assert ex["matched"]
        assert ex["score"] == h.score
