"""Distributed BPE tokenizer (functions/bpe.py): Sennrich-faithful
training on the classic published example, determinism, exact
roundtrip, and the Arrow-vectorized Spark encode surface."""

from __future__ import annotations

import pytest

from research_engine_spark.functions.bpe import (
    EOW,
    BPETokenizer,
    _train_merges,
    train_bpe,
)


def test_sennrich_example_merge_order():
    """The worked example from Sennrich et al. 2016 §3.2: corpus
    {low:5, lower:2, newest:6, widest:3} must merge
    (e,s) -> (es,t) -> (est,</w>) -> (l,o) -> (lo,w) in that order
    (count desc, lexicographic tie-break)."""
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = _train_merges(wc, 5)
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW),
                      ("l", "o"), ("lo", "w")]


def test_training_is_deterministic(spark, transcripts_df):
    t1 = train_bpe(transcripts_df, n_merges=80, max_vocab_words=2000)
    t2 = train_bpe(transcripts_df, n_merges=80, max_vocab_words=2000)
    assert t1.merges == t2.merges
    assert len(t1.merges) == 80


def test_encode_decode_roundtrip(spark, transcripts_df):
    tok = train_bpe(transcripts_df, n_merges=120, max_vocab_words=2000)
    texts = [r["text"] for r in transcripts_df.limit(20).collect()]
    for t in texts:
        norm = " ".join(t.lower().split())
        assert tok.decode(tok.encode(t)) == norm


def test_unknown_characters_stay_char_tokens():
    tok = BPETokenizer([("a", "b")])
    toks = tok.encode_word("abxq")
    assert toks == ["ab", "x", "q", EOW]
    assert tok.decode(toks) == "abxq"


def test_more_merges_never_more_tokens(spark, transcripts_df):
    small = train_bpe(transcripts_df, n_merges=40, max_vocab_words=2000)
    big = train_bpe(transcripts_df, n_merges=160, max_vocab_words=2000)
    assert small.merges == big.merges[:40]  # training is prefix-stable
    texts = [r["text"] for r in transcripts_df.limit(10).collect()]
    for t in texts:
        assert len(big.encode(t)) <= len(small.encode(t))


def test_save_load_roundtrip(tmp_path, spark, transcripts_df):
    tok = train_bpe(transcripts_df, n_merges=50, max_vocab_words=1000)
    p = str(tmp_path / "bpe.json")
    tok.save(p)
    back = BPETokenizer.load(p)
    assert back.merges == tok.merges
    assert back.encode("machine learning") == tok.encode("machine learning")


def test_spark_token_count_matches_python(spark, transcripts_df):
    from pyspark.sql import functions as F

    tok = train_bpe(transcripts_df, n_merges=100, max_vocab_words=2000)
    sample = transcripts_df.limit(25)
    got = (sample.select("conv_id", "turn_idx",
                         tok.token_count_col(F.col("text")).alias("n"))
           .collect())
    texts = {(r["conv_id"], r["turn_idx"]): r["text"]
             for r in sample.collect()}
    for r in got:
        want = len(tok.encode(texts[(r["conv_id"], r["turn_idx"])]))
        assert r["n"] == want


def test_spark_encode_col_roundtrip(spark, transcripts_df):
    from pyspark.sql import functions as F

    tok = train_bpe(transcripts_df, n_merges=100, max_vocab_words=2000)
    rows = (transcripts_df.limit(10)
            .select("text", tok.encode_col(F.col("text")).alias("toks"))
            .collect())
    for r in rows:
        norm = " ".join(r["text"].lower().split())
        assert tok.decode(list(r["toks"])) == norm
