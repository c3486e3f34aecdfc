"""Gopher-style repetition and document-quality filters for LLM
training-data pipelines (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", appendix A1.1 —
public spec; no reference-repo analog, this extends the training-data
axis the same way dedup/minhash do).

Two families:

``repetition_metrics``
    Per-document n-gram repetition statistics, all JVM-side except one
    explode+groupBy shuffle (the same shape a 100 TB run needs — the
    n-gram space is too large for per-doc driver loops, so counts are
    computed distributed per (doc, n, gram)):

    - ``top{n}_frac``: characters covered by the single most frequent
      n-gram divided by the document's character base (space-joined
      token length). Ties broken by the lexicographically LARGEST
      n-gram (mirrors the SQL oracle's ``ORDER BY cnt DESC, ng DESC``).
    - ``dup{n}_frac``: characters in n-grams occurring more than once
      divided by total n-gram characters (each occurrence counted —
      a bounded [0,1] variant of Gopher's overlap-aware definition;
      the deviation is deliberate so DuckDB can recompute it exactly).

``doc_quality_flags`` / ``gopher_pass``
    Gopher's document-level rules re-expressed as pure column
    expressions over the analyzer token array:

    - word count in [50, 100 000];
    - mean word length in [3, 10];
    - >= 80% of words contain an alphabetic character;
    - at least 2 of the 8 required English words present.

    (The symbol-to-word and bullet/ellipsis line rules are omitted:
    the engine's analyzer strips those characters before counting, so
    they are unobservable post-tokenization; apply them upstream on
    raw text via functions/text_clean.py.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col

#: Gopher A1.1 "required words" (stopword-presence prose check).
REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_ALPHA_WORD_RATIO = 0.8
MIN_REQUIRED_WORDS = 2


def _ngrams(toks: Column, n: int) -> Column:
    """Space-joined n-grams of a token array ([] when len(toks) < n)."""
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_base(toks: Column) -> Column:
    """Character base: length of the space-joined token stream."""
    return F.length(F.concat_ws(" ", toks))


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5,),
) -> DataFrame:
    """One row per document (with >= 1 token): ``top{n}_frac`` for each
    n in top_ns and ``dup{n}_frac`` for each n in dup_ns, 0.0 when the
    document is shorter than n tokens.

    Plan shape: one explode of all requested n-gram sizes tagged
    (n, gram) -> one groupBy(doc, n, gram) count -> one groupBy(doc, n)
    fold -> left join back onto the doc base. Two shuffles total for
    ANY number of n's; counts never leave the cluster.
    """
    ns = sorted(set(top_ns) | set(dup_ns))
    toks = tokens_col(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
    ).filter(F.size("toks") > 0).select(
        "doc_id", char_base(F.col("toks")).alias("char_base"), "toks"
    )

    def _tag(n: int):
        # NOTE: must be a 1-arg lambda — a 2-arg lambda (e.g. the
        # `lambda g, n=n` closure idiom) makes F.transform pass the
        # array INDEX as the second argument, clobbering the tag.
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("ng"))

    grams = F.flatten(F.array(*[
        F.transform(_ngrams(F.col("toks"), n), _tag(n)) for n in ns
    ]))
    counted = (
        base.select("doc_id", F.explode(grams).alias("g"))
        .groupBy("doc_id", F.col("g.n").alias("n"), F.col("g.ng").alias("ng"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # ONE doc-level groupBy pivots every n at once (per-n joins would
    # make Catalyst re-derive the explode once per n — plan-tested).
    aggs = []
    for n in top_ns:
        # max cnt, ties -> lexicographically largest gram (struct order)
        aggs.append(
            F.max(F.when(F.col("n") == n, F.struct(F.col("cnt"),
                                                   F.col("ng"))))
            .alias(f"top{n}")
        )
    for n in dup_ns:
        aggs.append(
            F.sum(F.when((F.col("n") == n) & (F.col("cnt") > 1),
                         F.col("cnt") * F.length("ng")).otherwise(0))
            .alias(f"dup{n}")
        )
        aggs.append(
            F.sum(F.when(F.col("n") == n,
                         F.col("cnt") * F.length("ng")).otherwise(0))
            .alias(f"tot{n}")
        )
    wide = counted.groupBy("doc_id").agg(*aggs)
    out = base.select("doc_id", "char_base").join(wide, "doc_id", "left")

    sel = [F.col("doc_id")]
    for n in top_ns:
        sel.append(
            F.coalesce(
                F.col(f"top{n}.cnt") * F.length(F.col(f"top{n}.ng"))
                / F.col("char_base").cast("double"),
                F.lit(0.0),
            ).alias(f"top{n}_frac")
        )
    for n in dup_ns:
        sel.append(
            F.when(F.coalesce(F.col(f"tot{n}"), F.lit(0)) > 0,
                   F.col(f"dup{n}").cast("double") / F.col(f"tot{n}"))
            .otherwise(F.lit(0.0)).alias(f"dup{n}_frac")
        )
    return out.select(*sel)


def doc_quality_flags(text_col: Column) -> dict[str, Column]:
    """Gopher document-level rule columns over the analyzer tokens.
    Documents with zero tokens fail every rule."""
    toks = tokens_col(text_col)
    wc = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t))
    mean_wl = F.when(wc > 0, total_len.cast("double") / wc).otherwise(0.0)
    alpha = F.when(
        wc > 0,
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double")
        / wc,
    ).otherwise(0.0)
    req = F.array(*[F.lit(w) for w in REQUIRED_WORDS])
    n_req = F.size(F.filter(req, lambda w: F.array_contains(toks, w)))
    return {
        "ok_word_count": (wc >= MIN_WORDS) & (wc <= MAX_WORDS),
        "ok_mean_word_len": (mean_wl >= MIN_MEAN_WORD_LEN)
        & (mean_wl <= MAX_MEAN_WORD_LEN) & (wc > 0),
        "ok_alpha_ratio": (alpha >= MIN_ALPHA_WORD_RATIO) & (wc > 0),
        "ok_required_words": n_req >= MIN_REQUIRED_WORDS,
    }


def gopher_pass(text_col: Column) -> Column:
    """True iff every document-level Gopher rule passes."""
    flags = doc_quality_flags(text_col)
    out = F.lit(True)
    for c in flags.values():
        out = out & c
    return out
