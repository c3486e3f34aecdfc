"""Segment compaction (Lucene forceMerge / ES _forcemerge analog):
compacting appended segments must be result-invariant (bit-identical
top-k docIDs and scores), reduce block count, keep the lineage
covers-every-posting-once invariant, and survive a crash at any point:
before the generation-pointer commit the live index is untouched, after
it the new generation is fully live (operators/generations.py)."""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from research_engine_spark.corpus import synth_transcripts
from research_engine_spark.operators import indexer
from research_engine_spark.operators.generations import (
    current_gen,
    gc_generations,
    read_generation,
    resolve,
)
from research_engine_spark.operators.indexer import (
    append_segment,
    build_index,
    compact_index,
)
from research_engine_spark.operators.scorer import IndexReader, search

QUERIES = ["neural networks", "machine learning",
           "What is BERT and how does it work?", "transformer attention"]


@pytest.fixture(scope="module")
def segmented_index(spark, tmp_path_factory):
    """Build over convs 0..14, then append 15..29 and 30..44 as separate
    segments — three snapshots on disk."""
    d = str(tmp_path_factory.mktemp("compact_idx"))
    tx = synth_transcripts(spark, n_convs=45, seed=23)
    first = tx.filter(F.col("conv_id") < "conv_00000015")
    mid = tx.filter((F.col("conv_id") >= "conv_00000015")
                    & (F.col("conv_id") < "conv_00000030"))
    last = tx.filter(F.col("conv_id") >= "conv_00000030")
    build_index(first, d, n_buckets=4)
    append_segment(mid, d)
    append_segment(last, d)
    return d


def _topk(spark, d, k=10):
    r = IndexReader(spark, d)
    out = {}
    for q in QUERIES:
        pdf = search(r, q, k=k).toPandas()
        out[q] = list(zip(pdf["doc_id"].tolist(), pdf["score"].tolist()))
    return out


def test_compact_preserves_results_exactly(spark, segmented_index):
    d = segmented_index
    before = _topk(spark, d)
    n_snaps_before = (spark.read.parquet(os.path.join(d, "postings"))
                      .select("snapshot_id").distinct().count())
    assert n_snaps_before == 3
    res = compact_index(spark, d)
    assert res["compacted"] is True
    assert res["n_snapshots_before"] == 3
    # fewer-or-equal blocks: per-segment tail blocks merged into full ones
    assert res["n_blocks_after"] <= res["n_blocks_before"]
    post = spark.read.parquet(resolve(d, "postings"))
    assert post.select("snapshot_id").distinct().count() == 1
    ts = spark.read.parquet(resolve(d, "term_stats"))
    assert ts.select("snapshot_id").distinct().count() == 1
    # one term_stats row per term after compaction
    dup = (ts.groupBy("term").count().filter(F.col("count") > 1).count())
    assert dup == 0
    after = _topk(spark, d)
    for q in QUERIES:
        assert before[q] == after[q], q  # bit-identical ids AND scores
    # the compaction committed generation 1 atomically: the pointer maps
    # the rewritten tables to @1 dirs, and (keep_generations=2 default)
    # the flat generation-0 dirs survive for readers opened pre-commit
    gen = read_generation(d)
    assert gen is not None and gen["gen"] == 1
    for tbl in ("postings", "term_stats", "lineage"):
        assert gen["tables"][tbl] == f"{tbl}@1"
        assert os.path.isdir(os.path.join(d, f"{tbl}@1"))
        assert os.path.isdir(os.path.join(d, tbl))  # kept for old readers


def test_compact_lineage_covers_every_posting_once(spark, segmented_index):
    d = segmented_index  # already compacted by the previous test
    post = spark.read.parquet(resolve(d, "postings"))
    lin = spark.read.parquet(resolve(d, "lineage"))
    n_postings = post.agg(F.sum("posting_count")).collect()[0][0]
    n_lineage = lin.agg(F.sum("posting_count")).collect()[0][0]
    assert n_postings == n_lineage
    # doc-sorted disjoint blocks within each (term, salt) group survive
    bad = (post.groupBy("term", "salt")
           .agg(F.sum("posting_count").alias("n"),
                F.countDistinct("block_id").alias("nb"),
                F.max("block_id").alias("mx"))
           .filter(F.col("nb") != F.col("mx") + 1).count())
    assert bad == 0


def test_compact_noop_on_single_snapshot(spark, tmp_path):
    d = str(tmp_path / "single")
    tx = synth_transcripts(spark, n_convs=8, seed=5)
    build_index(tx, d, n_buckets=2)
    before = _topk(spark, d, k=5)
    res = compact_index(spark, d)
    assert res["compacted"] is False
    assert res["n_blocks_after"] == res["n_blocks_before"]
    assert _topk(spark, d, k=5) == before


def test_compact_crash_before_commit_leaves_live_index(spark, tmp_path,
                                                       monkeypatch):
    """Crash at ANY point before the pointer commit: the live generation
    is untouched (identical results, no pointer), the stage leftovers
    are swept by the next compact_index call, which then succeeds."""
    d = str(tmp_path / "crashy_precommit")
    tx = synth_transcripts(spark, n_convs=20, seed=31)
    first = tx.filter(F.col("conv_id") < "conv_00000010")
    second = tx.filter(F.col("conv_id") >= "conv_00000010")
    build_index(first, d, n_buckets=2)
    append_segment(second, d)
    before = _topk(spark, d, k=8)

    def exploding_commit(*a, **kw):
        raise RuntimeError("simulated crash before pointer commit")

    monkeypatch.setattr(indexer, "commit_generation", exploding_commit)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_index(spark, d)
    monkeypatch.undo()
    # nothing committed: still generation 0, staged @1 dirs are garbage
    assert read_generation(d) is None
    assert os.path.isdir(os.path.join(d, "postings@1"))  # the leftover
    mid = _topk(spark, d, k=8)
    for q in QUERIES:
        assert before[q] == mid[q], q
    res = compact_index(spark, d)  # sweeps the stage, compacts cleanly
    assert res["compacted"] is True
    assert current_gen(d) == 1
    after = _topk(spark, d, k=8)
    for q in QUERIES:
        assert before[q] == after[q], q
    shutil.rmtree(d, ignore_errors=True)


def test_compact_crash_after_commit_is_committed(spark, tmp_path,
                                                 monkeypatch):
    """Crash right after the pointer replace (before gc): the new
    generation is fully live; a rerun no-ops and gc reclaims the old
    generation's dirs."""
    d = str(tmp_path / "crashy_postcommit")
    tx = synth_transcripts(spark, n_convs=20, seed=33)
    first = tx.filter(F.col("conv_id") < "conv_00000010")
    second = tx.filter(F.col("conv_id") >= "conv_00000010")
    build_index(first, d, n_buckets=2)
    append_segment(second, d)
    before = _topk(spark, d, k=8)

    def exploding_gc(*a, **kw):
        raise RuntimeError("simulated crash after pointer commit")

    monkeypatch.setattr(indexer, "gc_generations", exploding_gc)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_index(spark, d)
    monkeypatch.undo()
    assert current_gen(d) == 1  # committed despite the crash
    after = _topk(spark, d, k=8)
    for q in QUERIES:
        assert before[q] == after[q], q
    res = compact_index(spark, d)  # nothing left to merge
    assert res["compacted"] is False
    removed = gc_generations(d, keep=1)
    assert "postings" in removed  # old flat generation reclaimed
    assert _topk(spark, d, k=8) == after
    shutil.rmtree(d, ignore_errors=True)


def test_compact_positional_phrase_identical(spark, tmp_path):
    """Positional index: phrase results identical across compaction."""
    from research_engine_spark.operators.scorer import phrase_search

    d = str(tmp_path / "positional")
    tx = synth_transcripts(spark, n_convs=24, seed=7)
    first = tx.filter(F.col("conv_id") < "conv_00000012")
    second = tx.filter(F.col("conv_id") >= "conv_00000012")
    build_index(first, d, n_buckets=2, with_positions=True)
    append_segment(second, d)
    r = IndexReader(spark, d)
    phrase = "machine learning"
    before = phrase_search(r, phrase, k=10).toPandas()
    res = compact_index(spark, d)
    assert res["compacted"] is True
    r = IndexReader(spark, d)
    after = phrase_search(r, phrase, k=10).toPandas()
    assert before["doc_id"].tolist() == after["doc_id"].tolist()
    assert np.allclose(before["score"], after["score"], rtol=0, atol=0)
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_auto_compaction(spark, tmp_path):
    """compact_every=K in the foreachBatch sink: segments accrete per
    micro-batch, then auto-force-merge keeps the snapshot count bounded;
    scores still match the full-corpus oracle exactly."""
    from research_engine_spark.oracle import BM25Oracle
    from research_engine_spark.corpus import transcripts_pandas
    from research_engine_spark.streaming.incremental import (
        make_foreach_batch,
    )

    full_pd = transcripts_pandas(n_convs=24, seed=17)
    tx = synth_transcripts(spark, n_convs=24, seed=17)
    d = str(tmp_path / "autocompact")
    build_index(tx.filter(F.col("conv_id") < "conv_00000006"), d,
                n_buckets=2)
    fb = make_foreach_batch(d, compact_every=2)
    for i, (lo, hi) in enumerate([(6, 12), (12, 18), (18, 24)]):
        batch = tx.filter(
            (F.col("conv_id") >= f"conv_{lo:08d}")
            & (F.col("conv_id") < f"conv_{hi:08d}"))
        fb(batch, i)
    from research_engine_spark.operators.indexer import snapshot_census
    census = snapshot_census(resolve(d, "postings"))
    assert census is not None and len(census) <= 2, census
    r = IndexReader(spark, d)
    assert r.stats["n_docs"] == len(full_pd)
    oracle = BM25Oracle(full_pd)
    for q in ["neural networks", "machine learning"]:
        eng = search(r, q, k=8).toPandas()
        ora = oracle.search(q, k=8)
        assert np.allclose(sorted(eng["score"]), sorted(ora["score"]),
                           rtol=0, atol=1e-12), q


def test_compact_resalts_hot_terms(spark, tmp_path):
    """A term whose aggregated df crosses max_group_postings at compact
    time must be re-salted (multiple salts, each doc-sorted), and
    results must stay bit-identical."""
    d = str(tmp_path / "resalt")
    tx = synth_transcripts(spark, n_convs=30, seed=41)
    first = tx.filter(F.col("conv_id") < "conv_00000015")
    second = tx.filter(F.col("conv_id") >= "conv_00000015")
    build_index(first, d, n_buckets=2)
    append_segment(second, d)
    before = _topk(spark, d, k=8)
    res = compact_index(spark, d, max_group_postings=50)
    assert res["compacted"] is True
    post = spark.read.parquet(resolve(d, "postings"))
    n_salted = (post.groupBy("term")
                .agg(F.countDistinct("salt").alias("ns"))
                .filter(F.col("ns") > 1).count())
    assert n_salted > 0  # hot terms split across salts
    # each (term, salt) group stays doc-sorted and contiguous
    bad = (post.groupBy("term", "salt")
           .agg(F.countDistinct("block_id").alias("nb"),
                F.max("block_id").alias("mx"))
           .filter(F.col("nb") != F.col("mx") + 1).count())
    assert bad == 0
    after = _topk(spark, d, k=8)
    for q in QUERIES:
        assert before[q] == after[q], q
    shutil.rmtree(d, ignore_errors=True)
