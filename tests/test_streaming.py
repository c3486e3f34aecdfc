"""Incremental indexing tests: streamed segments must answer queries with
scores consistent with the CURRENT corpus stats, and the Structured
Streaming path must be idempotent on batch replay."""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from research_engine_spark.corpus import synth_transcripts, transcripts_pandas
from research_engine_spark.operators.indexer import append_segment, build_index
from research_engine_spark.operators.scorer import IndexReader, search
from research_engine_spark.oracle import BM25Oracle


@pytest.fixture(scope="module")
def split_corpus(spark):
    # conv 0..19 -> initial build; conv 20..39 -> appended segment.
    full_pd = transcripts_pandas(n_convs=40, seed=13)
    tx = synth_transcripts(spark, n_convs=40, seed=13)
    first = tx.filter(F.col("conv_id") < "conv_00000020")
    second = tx.filter(F.col("conv_id") >= "conv_00000020")
    return full_pd, first, second


def test_append_segment_scores_match_oracle(spark, split_corpus):
    """Batch build of part 1 + appended segment of part 2 must produce the
    same top-k SCORES as the oracle over the full corpus (docIDs are
    segment-ordered like Lucene, so compare via (conv_id, turn_idx))."""
    full_pd, first, second = split_corpus
    d = tempfile.mkdtemp()
    try:
        build_index(first, d, n_buckets=4)
        append_segment(second, d)
        r = IndexReader(spark, d)
        oracle = BM25Oracle(full_pd)
        assert r.stats["n_docs"] == oracle.n_docs
        assert abs(r.stats["avgdl"] - oracle.avgdl) < 1e-12
        for q in ["neural networks", "machine learning",
                  "What is BERT and how does it work?"]:
            eng = search(r, q, k=10).toPandas()
            ora = oracle.search(q, k=10)
            # same docs by natural key, same scores
            assert (sorted(zip(eng["conv_id"], eng["turn_idx"]))
                    == sorted(zip(ora["conv_id"], ora["turn_idx"]))), q
            assert np.allclose(sorted(eng["score"]), sorted(ora["score"]),
                               rtol=0, atol=1e-12), q
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_incremental_index(spark, split_corpus):
    """End-to-end Structured Streaming: parquet files land -> foreachBatch
    appends segments -> queries see all data; batch replay is a no-op."""
    from research_engine_spark.streaming.incremental import (
        incremental_index_stream, make_foreach_batch)

    full_pd, first, second = split_corpus
    src = tempfile.mkdtemp()
    ckpt = tempfile.mkdtemp()
    d = tempfile.mkdtemp()
    try:
        build_index(first, d, n_buckets=4)
        n0 = IndexReader(spark, d).stats["n_docs"]
        # land the second half as a parquet file in the watched dir
        second.write.mode("overwrite").parquet(os.path.join(src, "batch1"))
        q = incremental_index_stream(
            spark, os.path.join(src, "batch1"), d, ckpt)
        q.awaitTermination(120)
        r = IndexReader(spark, d)
        assert r.stats["n_docs"] == len(full_pd)
        assert r.stats["n_docs"] > n0
        # replay the same batch id -> idempotent (no double count)
        fb = make_foreach_batch(d)
        fb(second, 0)
        r2 = IndexReader(spark, d)
        assert r2.stats["n_docs"] == len(full_pd)
        # queries over the streamed index match the full-corpus oracle
        oracle = BM25Oracle(full_pd)
        eng = search(r2, "neural networks", k=5).toPandas()
        ora = oracle.search("neural networks", k=5)
        assert np.allclose(sorted(eng["score"]), sorted(ora["score"]),
                           rtol=0, atol=1e-12)
    finally:
        for p in (src, ckpt, d):
            shutil.rmtree(p, ignore_errors=True)


def test_crash_replay_no_duplicates(spark, split_corpus):
    """Exactly-once under mid-batch crash: a batch whose append completed
    (or partially completed) but whose applied-marker write never happened
    leaves a pending marker; the replay must roll the partial segment back
    and re-apply, ending with exactly one copy of every doc and corpus
    stats equal to a clean two-segment build."""
    import json

    from research_engine_spark.operators.indexer import append_segment
    from research_engine_spark.streaming.incremental import (
        _pending_marker, _read_pending, make_foreach_batch)

    full_pd, first, second = split_corpus
    d = tempfile.mkdtemp()
    try:
        build_index(first, d, n_buckets=4)
        with open(os.path.join(d, "corpus_stats.json")) as f:
            before = json.load(f)
        # simulate the crashed attempt: pending marker written, append ran
        # to completion, but the batch was never marked applied
        with open(_pending_marker(d), "w") as f:
            json.dump({"batch_id": 7, "snapshot_id": "stream_7",
                       "n_docs_before": int(before["n_docs"]),
                       "total_tokens_before": int(before["total_tokens"])},
                      f)
        append_segment(second, d, snapshot_id="stream_7")
        # replay the batch through the streaming sink
        fb = make_foreach_batch(d)
        fb(second, 7)
        assert _read_pending(d) is None
        r = IndexReader(spark, d).refresh()
        assert r.stats["n_docs"] == len(full_pd)
        # no duplicate docs
        dup = (r.docs.groupBy("conv_id", "turn_idx")
               .count().filter(F.col("count") > 1).count())
        assert dup == 0
        # scores match the full-corpus oracle (df/tf not doubled)
        oracle = BM25Oracle(full_pd)
        eng = search(r, "neural networks", k=5).toPandas()
        ora = oracle.search("neural networks", k=5)
        assert np.allclose(sorted(eng["score"]), sorted(ora["score"]),
                           rtol=0, atol=1e-12)
        # second replay of an applied batch is a no-op
        fb(second, 7)
        r2 = IndexReader(spark, d)
        assert r2.stats["n_docs"] == len(full_pd)
    finally:
        shutil.rmtree(d, ignore_errors=True)
