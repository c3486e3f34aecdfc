"""Corpus-trained unigram language-model quality filter (the CCNet
shape: Wenzek et al. 2019 score web text with a KenLM model and keep
the low-perplexity tail; the unigram variant here is the same
pipeline stage with an in-engine, exactly-reproducible model).

The reference has no statistical quality filter at all (its quality
gate is the boolean predicate in chunk_pdfs_final.py:133-160, ported
as functions/textstats.is_quality_content); a pretraining pipeline
needs a perplexity-style score to rank and threshold documents.

Spark-first and scale-shaped:
- TRAIN: one explode + groupBy(term) over the corpus — the same
  single-shuffle shape as the index build's term statistics; the
  model is vocabulary-sized, never corpus-sized. The only driver
  materialization is the (total_tokens, vocab_size) scalar pair.
- SCORE: one explode + one equi-join against the model table +
  one groupBy(doc). The model side is tiny relative to the corpus
  (Heaps' law), so AQE broadcasts it; OOV tokens take the add-one
  floor probability, so scoring never drops a token.
- Everything is add-one (Laplace) smoothed and computed in float64
  from exact integer counts, so DuckDB can recompute the model AND
  the per-doc scores bit-for-bit from the same parquet (driver row
  ``lm_quality_documents``) — a property a KenLM binary can't offer.

Perplexity here = exp(-mean token log-prob), natural log.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col


def unigram_model(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Train: (term, logprob) with add-one smoothing,
    logprob = ln((count + 1) / (total_tokens + vocab_size)).

    One corpus shuffle (groupBy term); the (total, vocab) scalar pair
    is the only driver materialization. The returned frame carries the
    model constants on every row (``oov_logprob``, ``total_tokens``,
    ``vocab_size``) so scoring needs no side channel and the model
    persists as a plain parquet table.
    """
    counts = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    )
    counts = counts.persist()
    total, vocab = counts.agg(
        F.sum("cnt"), F.count(F.lit(1))).first()
    denom = float((total or 0) + vocab)
    if denom == 0.0:
        raise ValueError("empty corpus: no tokens to train on")
    return counts.select(
        "term",
        F.log((F.col("cnt") + F.lit(1)).cast("double") / F.lit(denom))
        .alias("logprob"),
        F.lit(math.log(1.0 / denom)).alias("oov_logprob"),
        F.lit(int(total)).alias("total_tokens"),
        F.lit(int(vocab)).alias("vocab_size"),
    )


def score_documents(df: DataFrame, model: DataFrame,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Score: (id, n_tokens, mean_logprob, ppl) per document.
    ppl = exp(-mean_logprob); lower = more like the training corpus.
    Zero-token documents get n_tokens 0 and NULL scores (never
    silently dropped). One explode + one join + one groupBy; the OOV
    floor is ONE scalar read off the model frame."""
    oov_lp = float(model.select("oov_logprob").first()[0])
    toks = df.select(
        F.col(id_col),
        F.explode_outer(tokens_col(F.col(text_col))).alias("term"))
    scored = (
        toks.join(model.select("term", "logprob"), "term", "left")
        .select(
            id_col, "term",
            F.coalesce("logprob", F.lit(oov_lp)).alias("lp"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count("term").alias("n_tokens"),
        F.sum(F.when(F.col("term").isNotNull(), F.col("lp")))
        .alias("_sum_lp"))
    mean = F.when(F.col("n_tokens") > 0,
                  F.col("_sum_lp") / F.col("n_tokens"))
    return agg.select(
        id_col, "n_tokens",
        mean.alias("mean_logprob"),
        F.exp(-mean).alias("ppl"))


def lm_filter(df: DataFrame, model: DataFrame, max_ppl: float,
              text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Keep documents with ppl <= max_ppl (the CCNet "head/middle"
    cut). Join is on the id only — the text rides through."""
    keep = (score_documents(df, model, text_col, id_col)
            .filter(F.col("ppl") <= F.lit(float(max_ppl)))
            .select(id_col))
    return df.join(keep, id_col, "left_semi")
