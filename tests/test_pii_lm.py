"""PII scrubbing (functions/pii.py) and the CCNet-style unigram LM
quality filter (functions/lmfilter.py): planted-positive masking,
count precedence, and an exact numpy recomputation of the LM model
and per-doc perplexities."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from research_engine_spark.corpus import synth_transcripts
from research_engine_spark.functions.lmfilter import (
    lm_filter,
    score_documents,
    unigram_model,
)
from research_engine_spark.functions.pii import (
    PII_PATTERNS,
    mask_pii,
    pii_counts,
    scrub_pii,
)


def _one(spark, text):
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

PLANTED = ("Write to jane.doe+x@sub.example.co.uk or call (415) 555-0142 "
           "/ 415-555-0142; server 192.168.0.1, ssn 219-09-9999, "
           "card 4242-4242-4242-4242 or 4242424242424242.")


def test_mask_pii_masks_every_planted_kind(spark):
    out = _one(spark, PLANTED).select(
        mask_pii(F.col("text")).alias("t")).first()["t"]
    assert "jane.doe" not in out and "@" not in out
    assert "555-0142" not in out
    assert "192.168.0.1" not in out
    assert "219-09-9999" not in out
    assert "4242" not in out
    for kind in ("email", "phone", "ipv4", "ssn", "card"):
        assert f"[PII-{kind}]" in out


def test_mask_pii_leaves_clean_text_alone(spark):
    clean = "No identifiers here: version 1.2 of chapter 10, room 300."
    out = _one(spark, clean).select(
        mask_pii(F.col("text")).alias("t")).first()["t"]
    assert out == clean


def test_pii_counts_precedence_card_not_phone(spark):
    # a card number must count once as card and never as phone/ssn
    row = _one(spark, PLANTED).select(
        *pii_counts(F.col("text"))).first().asDict()
    assert row["email_n"] == 1
    assert row["card_n"] == 2
    assert row["ssn_n"] == 1
    assert row["phone_n"] == 2
    assert row["ipv4_n"] == 1


def test_scrub_pii_kinds_subset_and_token(spark):
    df = _one(spark, PLANTED)
    out = scrub_pii(df, kinds=["email"], token="<{kind}>").first()["text"]
    assert "<email>" in out and "555-0142" in out  # phone untouched
    with pytest.raises(ValueError, match="unknown PII kinds"):
        scrub_pii(df, kinds=["iban"]).collect()


def test_scrub_pii_with_counts_schema(spark):
    df = scrub_pii(_one(spark, PLANTED), with_counts=True)
    assert [k + "_n" for k, _ in PII_PATTERNS] == \
        [c for c in df.columns if c.endswith("_n")]


# ---------------------------------------------------------------------------
# unigram LM filter
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def lm_setup(spark):
    tx = (synth_transcripts(spark, n_convs=30, seed=44)
          .select(F.monotonically_increasing_id().alias("doc_id"), "text")
          .persist())
    tx.count()
    model = unigram_model(tx).persist()
    yield tx, model
    tx.unpersist()
    model.unpersist()


def _np_tokens(text):
    import re
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def test_unigram_model_matches_numpy(spark, lm_setup):
    tx, model = lm_setup
    texts = [r["text"] for r in tx.select("text").collect()]
    from collections import Counter
    cnt = Counter(t for s in texts for t in _np_tokens(s))
    total, vocab = sum(cnt.values()), len(cnt)
    got = {r["term"]: r["logprob"] for r in model.collect()}
    assert len(got) == vocab
    first = model.first()
    assert first["total_tokens"] == total
    assert first["vocab_size"] == vocab
    denom = float(total + vocab)
    for term in list(cnt)[:50]:
        # JVM Math.log vs libm can differ by 1 ulp
        assert got[term] == pytest.approx(
            math.log((cnt[term] + 1) / denom), rel=1e-14)
    assert first["oov_logprob"] == pytest.approx(
        math.log(1.0 / denom), rel=1e-14)


def test_score_documents_matches_numpy(spark, lm_setup):
    tx, model = lm_setup
    rows = tx.limit(40).collect()
    texts = {r["doc_id"]: r["text"] for r in rows}
    from collections import Counter
    all_texts = [r["text"] for r in tx.select("text").collect()]
    cnt = Counter(t for s in all_texts for t in _np_tokens(s))
    denom = float(sum(cnt.values()) + len(cnt))
    scored = {r["doc_id"]: r for r in
              score_documents(tx, model).collect()}
    for did, text in texts.items():
        toks = _np_tokens(text)
        lps = np.array([math.log((cnt[t] + 1) / denom) for t in toks])
        r = scored[did]
        assert r["n_tokens"] == len(toks)
        assert abs(r["mean_logprob"] - lps.mean()) < 1e-9
        assert abs(r["ppl"] - math.exp(-lps.mean())) < 1e-6


def test_oov_takes_floor_probability(spark, lm_setup):
    _, model = lm_setup
    oov_lp = float(model.first()["oov_logprob"])
    df = _one(spark, "zzzunseen qqqunseen")
    r = score_documents(df, model).first()
    assert r["n_tokens"] == 2
    assert abs(r["mean_logprob"] - oov_lp) < 1e-12


def test_zero_token_docs_kept_with_null_scores(spark, lm_setup):
    _, model = lm_setup
    df = _one(spark, "!!! ???")
    r = score_documents(df, model).first()
    assert r["n_tokens"] == 0
    assert r["mean_logprob"] is None and r["ppl"] is None


def test_lm_filter_threshold_semantics(spark, lm_setup):
    tx, model = lm_setup
    scored = score_documents(tx, model)
    med = scored.approxQuantile("ppl", [0.5], 0.0)[0]
    kept = lm_filter(tx, model, max_ppl=med)
    want = scored.filter(F.col("ppl") <= med).count()
    assert kept.count() == want
    assert set(kept.columns) == set(tx.columns)


def test_empty_corpus_fails_loudly(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(Exception, match="empty corpus"):
        unigram_model(df)
