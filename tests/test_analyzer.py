"""Analyzer chain tests — token identity between the oracle path
(analyze) and the vectorized pandas path (analyze_series) must be exact,
since BM25 rank-identity depends on it (SURVEY.md §2.8 F1)."""

import pandas as pd

from research_engine_spark.functions.analyzer import (
    analyze,
    analyze_query,
    analyze_series,
)


def test_basic_chain():
    assert analyze("Neural Networks!") == ["neural", "network"]
    assert analyze("The transformers' attention-mechanisms.") == [
        "the", "transform", "attent", "mechan"]


def test_empty_and_whitespace():
    assert analyze("") == []
    assert analyze("   \t\n ") == []
    assert analyze(None if False else "...!!!") == []


def test_digits_kept():
    assert analyze("GPT-4 scored 95.5%") == ["gpt", "4", "score", "95", "5"]


def test_series_matches_scalar():
    texts = pd.Series([
        "Neural Networks are great", "", "   ", "BERT, RoBERTa; GPT!",
        "running runner ran", None, "Attention mechanisms work",
    ])
    vec = analyze_series(texts)
    for t, v in zip(texts, vec):
        assert v == analyze(t or "")


def test_analyze_query_qtf_and_order():
    # duplicate terms accumulate query-tf; output sorted by term
    q = analyze_query("networks network neural")
    assert q == [("network", 2), ("neural", 1)]
    assert analyze_query("") == []


def test_two_tier_regex_bit_exact():
    """The ASCII fast tier must emit exactly what the Unicode tier emits
    on ASCII rows — mixed batches route rows by str.isascii and must be
    indistinguishable from running TOKEN_RE on everything."""
    from research_engine_spark.functions.analyzer import (
        ASCII_TOKEN_RE, TOKEN_RE, _findall_tokens)

    samples = [
        "the quick brown fox", "don't stop believing", "gpt-4 scored 95.5%",
        "foo_bar __init__ a'b'c", "", "  ", "x", "'leading 'quoted' trail'",
        "café au lait", "don’t panic", "架构 systems naïve",
        "ascii then café mixed", "1234 5_6 7'8",
    ]
    low = pd.Series(samples).str.lower()
    got = _findall_tokens(low)
    want = low.str.findall(TOKEN_RE)
    assert list(got) == list(want)
    # and per-string: ASCII regex == Unicode regex on any ASCII input
    for s in samples:
        s = s.lower()
        if s.isascii():
            assert ASCII_TOKEN_RE.findall(s) == TOKEN_RE.findall(s), s


def test_analyze_flat_matches_series():
    from research_engine_spark.functions.analyzer import analyze_flat

    import numpy as np

    texts = pd.Series(["Neural networks are neural", "", "running ran",
                       None, "café don't"])
    codes, terms, lens = analyze_flat(texts)
    flat = terms[codes]
    splits = np.split(flat, np.cumsum(lens)[:-1])
    for t, s in zip(texts, splits):
        assert list(s) == analyze(t or "")


def test_unicode_and_apostrophe_tokens():
    """ADVICE r1: non-ASCII letters survive and mid-word apostrophes join
    (UAX#29 approximation), instead of 'café'->'caf' / 'don't'->'don','t'."""
    from research_engine_spark.functions.analyzer import analyze

    assert "café" in analyze("Café au lait")
    toks = analyze("don't panic")
    assert "don't" in toks and "don" not in toks and "t" not in toks
    assert analyze("foo_bar baz")[0] == "foo_bar"
    assert analyze("架构 systems") [0] == "架构"


def test_simple_mode_matches_sql_split():
    """analyzer="simple" must tokenize exactly like splitting lowercased
    text on [^a-z0-9]+ (the ANSI-SQL-portable chain) — no stemming."""
    import re

    from research_engine_spark.functions.analyzer import analyze

    cases = ["Spark JOINS shuffling!", "don't stop", "café au lait",
             "a1-b2_c3", "", "   ", "running runs ran"]
    for t in cases:
        sql_style = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        assert analyze(t, mode="simple") == sql_style, t


def test_simple_mode_flat_consistent():
    import pandas as pd

    from research_engine_spark.functions.analyzer import (analyze,
                                                          analyze_flat)

    texts = pd.Series(["Spark joins", "running RUNS!", None, "café x9"])
    codes, terms, lens = analyze_flat(texts, mode="simple")
    off = 0
    for i, t in enumerate(texts):
        got = [terms[c] for c in codes[off:off + lens[i]]]
        off += lens[i]
        assert got == analyze(t or "", mode="simple"), t
    # no stemming in simple mode: "running" stays intact
    assert "running" in set(terms)


def test_simple_mode_index_query_agree(spark, tmp_path):
    """An index built with analyzer="simple" must analyze queries the
    same way (mode recorded in corpus_stats, read by search), and the
    mode must survive appends."""
    from pyspark.sql import functions as F

    from research_engine_spark.corpus import synth_transcripts
    from research_engine_spark.operators.indexer import (append_segment,
                                                         build_index)
    from research_engine_spark.operators.scorer import IndexReader, search

    d = str(tmp_path / "simple_idx")
    tx = synth_transcripts(spark, n_convs=12, seed=3)
    build_index(tx.filter(F.col("conv_id") < "conv_00000008"), d,
                n_buckets=2, analyzer="simple")
    r = IndexReader(spark, d)
    assert r.stats["analyzer"] == "simple"
    # "networks" must NOT match docs containing only "network" (no stem)
    hits_plural = set(search(r, "networks", k=50,
                             with_text=False).toPandas()["doc_id"])
    hits_singular = set(search(r, "network", k=50,
                               with_text=False).toPandas()["doc_id"])
    assert hits_plural != hits_singular or (not hits_plural)
    append_segment(tx.filter(F.col("conv_id") >= "conv_00000008"), d)
    r = IndexReader(spark, d)
    assert r.stats["analyzer"] == "simple"
    assert search(r, "neural", k=5, with_text=False).count() > 0
