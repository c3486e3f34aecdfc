"""Text-clean function tests (F3-F6, F8)."""

import pytest
from pyspark.sql import functions as F

from research_engine_spark.functions.text_clean import (
    clean_text,
    dehyphenate_eol,
    fix_ligatures,
    normalize_ws,
    sanitize_id,
    scrub_metadata,
    truncate_references,
)


def _run(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r[0] for r in df.select(col_fn(F.col("v"))).collect()]


def test_normalize_ws(spark):
    assert _run(spark, normalize_ws, ["  a \t b\n\nc  "]) == ["a b c"]


def test_truncate_references(spark):
    got = _run(spark, truncate_references,
               ["intro text References [1] Foo 2020", "no refs here",
                "case REFERENCES tail"])
    assert got[0] == "intro text "
    assert got[1] == "no refs here"
    assert got[2] == "case "


def test_fix_ligatures(spark):
    assert _run(spark, fix_ligatures, ["eﬃ?ﬁtﬂy", "soft­hyphen nb sp"]) == [
        "eﬃ?fitfly", "softhyphen nb sp"]


def test_dehyphenate_eol(spark):
    """F5 HARD_HYPHEN rule (old_scripts/text_clean.py:10,33): rejoin
    letter-hyphen-newline-letter; leave numeric ranges and mid-line
    hyphens alone."""
    got = _run(spark, dehyphenate_eol, [
        "exam-\nple", "multi-\nword de-\nhyphen", "range 1-\n2 stays",
        "mid-line hyphen", "trailing-\n", "naï-\nve",
    ])
    assert got == ["example", "multiword dehyphen", "range 1-\n2 stays",
                   "mid-line hyphen", "trailing-\n", "naïve"]


def test_clean_text_dehyphenates(spark):
    got = _run(spark, clean_text, ["The exam-\nple held up"])
    assert got == ["The example held up"]


def test_scrub_metadata(spark):
    got = _run(spark, scrub_metadata, [
        "see https://x.io/a and mail a@b.com cite [1, 2] arXiv:2101.00001v2 ok",
    ])
    assert got == ["see and mail cite ok"]


def test_clean_text_chain(spark):
    got = _run(spark, clean_text, [
        "The ﬁrst result https://a.io [3] References junk [4]",
    ])
    assert got == ["The first result"]


def test_sanitize_id(spark):
    assert _run(spark, sanitize_id, ["cs/0112017", "oai:arXiv.org:1234"]) == [
        "cs_0112017", "oai_arXiv.org_1234"]


def test_fix_mojibake_str():
    """Native best-effort ftfy-core subset (old_scripts/text_clean.py:4
    fix_text): UTF-8-as-cp1252 mojibake repaired, double-encoding
    unwound, genuine Unicode and unrepairable mixes left untouched."""
    from research_engine_spark.functions.text_clean import _fix_mojibake_str

    assert _fix_mojibake_str("CafÃ©") == "Café"
    assert _fix_mojibake_str("naÃ¯ve rÃ©sumÃ©") == "naïve résumé"
    assert _fix_mojibake_str("â€œquotedâ€\x9d") == "“quoted”"
    assert _fix_mojibake_str("dash â€” here") == "dash — here"
    double = ("Café".encode("utf-8").decode("cp1252")
              .encode("utf-8").decode("cp1252"))
    assert _fix_mojibake_str(double) == "Café"
    assert _fix_mojibake_str("plain ascii") == "plain ascii"
    assert _fix_mojibake_str("真正的 unicode") == "真正的 unicode"
    # genuine non-latin chars mixed with mojibake: unrepairable -> no-op
    assert _fix_mojibake_str("mixed 真 with CafÃ©") == "mixed 真 with CafÃ©"


def test_fix_mojibake_udf(spark):
    from research_engine_spark.functions.text_clean import fix_mojibake_udf

    df = spark.createDataFrame(
        [("CafÃ©",), ("ok",), (None,)], "v string")
    got = [r[0] for r in df.select(fix_mojibake_udf()(F.col("v"))).collect()]
    assert got == ["Café", "ok", None]


def test_fold_diacritics_matches_nfkd():
    """Every 1:1 map in the frozen constant equals the NFKD base letter
    (the constants were generated from unicodedata; this guards typos)."""
    import unicodedata

    from research_engine_spark.functions.text_clean import (
        _DIA_DST,
        _DIA_SRC,
    )

    assert len(_DIA_SRC) == len(_DIA_DST)
    pinned = set("ĐđĦħŁłØøÐðıŦŧŊŋ")  # NFKD won't decompose these
    for s, d in zip(_DIA_SRC, _DIA_DST):
        if s in pinned:
            continue
        base = "".join(c for c in unicodedata.normalize("NFKD", s)
                       if not unicodedata.combining(c))
        assert base == d, f"{s!r}: NFKD base {base!r} != mapped {d!r}"


def test_fold_diacritics(spark):
    from research_engine_spark.functions.text_clean import fold_diacritics

    got = _run(spark, fold_diacritics, [
        "naïve café øre straße Æon Œuvre Þing",
        "Łódź İstanbul señor ātma",
        "真正的 unicode stays",
        "plain ascii",
    ])
    assert got == [
        "naive cafe ore strasse AEon OEuvre Thing",
        "Lodz Istanbul senor atma",
        "真正的 unicode stays",
        "plain ascii",
    ]
