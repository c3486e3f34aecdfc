"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, fingerprinting.

The reference's quality predicate (database/scripts/chunk_pdfs_final.py:
133-160 ``is_quality_content``: citation ratio, URL count, sentence count,
keyword hits) is re-expressed as JVM-side column expressions — no Python in
the hot path. Language ID is an n-gram/stopword heuristic (the reference
corpus is English-only; ours must handle mixed corpora at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword marker sets (top function words).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans"],
    "es": ["el", "la", "los", "que", "es", "no", "una", "por", "para"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + [
    "a", "an", "on", "as", "by", "be", "are", "was", "this", "we",
]


def tokens_col(text_col: Column) -> Column:
    """Whitespace/punct word split of lowercased text (built-in, no UDF)."""
    return F.filter(
        F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != ""
    )


def token_count(text_col: Column) -> Column:
    return F.size(tokens_col(text_col))


def stopword_ratio(text_col: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    toks = tokens_col(text_col)
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0,
                  n_sw.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text_col: Column) -> Column:
    n = F.length(text_col)
    n_punct = n - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    return F.when(n > 0, n_punct.cast("double") / n).otherwise(F.lit(0.0))


def upper_ratio(text_col: Column) -> Column:
    n = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", ""))
    n_up = F.length(F.regexp_replace(text_col, r"[^A-Z]", ""))
    return F.when(n > 0, n_up.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text_col: Column) -> Column:
    """Composite [0,1] quality score (analog of is_quality_content,
    chunk_pdfs_final.py:133-160): length in range, sane punctuation,
    enough stopwords (prose-ness), not shouting."""
    tc = token_count(text_col)
    len_ok = F.when((tc >= 5) & (tc <= 5000), 1.0).otherwise(
        F.when(tc > 0, 0.5).otherwise(0.0))
    punct_ok = F.when(punct_ratio(text_col) <= 0.2, 1.0).otherwise(0.3)
    sw_ok = F.when(stopword_ratio(text_col) >= 0.05, 1.0).otherwise(0.4)
    case_ok = F.when(upper_ratio(text_col) <= 0.5, 1.0).otherwise(0.5)
    return (len_ok * 0.4 + punct_ok * 0.2 + sw_ok * 0.3 + case_ok * 0.1)


CITATION_RE = r"\[[\d,\s-]+\]|\([A-Za-z]+\s+et\s+al\.?\s*,\s*\d{4}\)"
URL_RE = r"https?://|www\."
ACADEMIC_WORDS = [
    "analysis", "method", "approach", "model", "algorithm", "experiment",
    "result", "conclusion", "study", "research", "data", "performance",
    "evaluation", "comparison",
]


def is_quality_content(text_col: Column) -> Column:
    """The reference's EXACT boolean quality predicate (P5:
    database/scripts/chunk_pdfs_final.py:133-160 ``is_quality_content``),
    as pure column expressions:

    1. non-null, len(strip) >= 50;
    2. citation matches (bracket refs or "(Author et al., 2019)")
       <= 10% of whitespace-split word count;
    3. <= 3 URL markers;
    4. >= 2 meaningful sentences (split on [.!?]+, stripped length > 20,
       contains a letter);
    5. >= 2 of the 14 academic keywords present as substrings.
    """
    stripped = F.trim(text_col)
    words = F.when(stripped == "", F.lit(0)).otherwise(
        F.size(F.split(stripped, r"\s+")))
    citations = F.regexp_count(text_col, F.lit(CITATION_RE))
    urls = F.regexp_count(text_col, F.lit(URL_RE))
    sentences = F.split(text_col, r"[.!?]+")
    meaningful = F.size(F.filter(
        sentences,
        lambda s: (F.length(F.trim(s)) > 20) & s.rlike("[a-zA-Z]"),
    ))
    lower = F.lower(text_col)
    academic = sum(
        (F.when(F.contains(lower, F.lit(w)), 1).otherwise(0)
         for w in ACADEMIC_WORDS),
        F.lit(0),
    )
    return (
        text_col.isNotNull()
        & (F.length(stripped) >= 50)
        & (citations.cast("double") <= words.cast("double") * 0.1)
        & (urls <= 3)
        & (meaningful >= 2)
        & (academic >= 2)
    )


def lang_guess(text_col: Column) -> Column:
    """Heuristic language ID: argmax over per-language marker-hit ratios,
    'und' (undetermined) when nothing matches. Pure column expressions."""
    toks = tokens_col(text_col)
    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct(
            (F.when(F.size(toks) > 0,
                    hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))
             ).alias("score"),
            F.lit(lang).alias("lang"),
        ))
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0.0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text_col: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text
    (rolling-hash analog; stable across engines for oracle checks)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stats column family in one projection."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_guess(c).alias("lang_guess"),
        fingerprint(c).alias("fingerprint"),
    )
