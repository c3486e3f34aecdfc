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
