"""Text cleaning functions (SURVEY.md §2.8 F3-F6, F8).

Reference behaviors re-expressed as JVM-side column expressions (no Python
in the hot path):
- F3 whitespace normalize/strip: retrieval-pipeline text_clean.py:14,23
- F4 references truncation: text_clean.py:17-18 (split at first
  word-boundary "References")
- F5 ligature/unicode fixes: text_clean.py:21 (fi/fl ligatures), soft
  hyphen + nbsp strip from old_scripts/text_clean.py:7-55
- F6 metadata scrubbing: chunk_pdfs_final.py:51-82 clean_metadata (URLs,
  emails, arXiv ids, page numbers, citation brackets)
- F8 id sanitization: download_oai.py:29-30 ('/'->'_', ':'->'_')
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_ws(col: Column) -> Column:
    """F3: collapse whitespace runs, strip."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def truncate_references(col: Column) -> Column:
    """F4: keep text before the first word-boundary 'References'."""
    return F.split(col, r"(?i)\bReferences\b").getItem(0)


def fix_ligatures(col: Column) -> Column:
    """F5: fi/fl ligatures -> ascii pairs; strip soft hyphen and nbsp."""
    c = F.regexp_replace(col, "ﬁ", "fi")
    c = F.regexp_replace(c, "ﬂ", "fl")
    c = F.regexp_replace(c, "­", "")        # soft hyphen
    c = F.regexp_replace(c, " ", " ")       # nbsp
    return c


def _fix_mojibake_str(s: str) -> str:
    """Best-effort mojibake repair — the core transform of the
    reference's ftfy.fix_text call (old_scripts/text_clean.py:4,46):
    UTF-8 bytes mis-decoded as cp1252/latin-1 ("CafÃ©" -> "Café",
    "â€œ" -> left double quote). Detection is marker-based (Ã/Â/â€
    sequences essentially never occur in real text); repair is the
    encode-roundtrip, applied up to twice for double-encoded input, and
    abandoned untouched when the string doesn't survive the roundtrip
    (mixed genuine-Unicode + mojibake). A deliberate subset of ftfy —
    no HTML entities, no lossy guessing."""
    import codecs

    # "sloppy windows-1252" (ftfy's trick): cp1252 encode, with the five
    # unmapped C1 positions falling through byte-identically via latin-1
    # — exactly how the original mis-decode produced them.
    try:
        codecs.lookup_error("re_sloppy1252")
    except LookupError:
        def _fallback(e):
            ch = e.object[e.start:e.end]
            try:
                return (ch.encode("latin-1"), e.end)
            except UnicodeEncodeError:
                raise e
        codecs.register_error("re_sloppy1252", _fallback)
    for _ in range(2):
        if ("Ã" not in s) and ("Â" not in s) and ("â€" not in s):
            return s
        try:
            fixed = s.encode("cp1252", errors="re_sloppy1252").decode(
                "utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return s
        if fixed == s:
            return s
        s = fixed
    return s


def fix_mojibake_udf():
    """Arrow-batched pandas UDF over _fix_mojibake_str; rows without the
    marker bytes short-circuit (the overwhelming majority)."""

    @F.pandas_udf("string")
    def fix(texts: pd.Series) -> pd.Series:
        return texts.map(lambda s: _fix_mojibake_str(s)
                         if isinstance(s, str) else s)

    return fix


def dehyphenate_eol(col: Column) -> Column:
    """F5: re-join words hyphen-wrapped at end-of-line ("exam-\\nple" ->
    "example") — the reference's HARD_HYPHEN rule
    (old_scripts/text_clean.py:10,33: ``(\\p{Letter})-\\n(\\p{Letter})``).
    Must run BEFORE whitespace normalization collapses the newline."""
    return F.regexp_replace(col, r"(\p{L})-\n(\p{L})", "$1$2")


def scrub_metadata(col: Column) -> Column:
    """F6: strip URLs, emails, arXiv ids, bracketed citations, standalone
    page numbers — the clean_metadata regex chain."""
    c = F.regexp_replace(col, r"https?://\S+", " ")
    c = F.regexp_replace(c, r"\S+@\S+\.\S+", " ")
    c = F.regexp_replace(c, r"arXiv:\d{4}\.\d{4,5}(v\d+)?", " ")
    c = F.regexp_replace(c, r"\[\d+(,\s*\d+)*\]", " ")      # [1], [2, 3]
    c = F.regexp_replace(c, r"^\s*\d+\s*$", " ")            # bare page no.
    return normalize_ws(c)


def clean_text(col: Column) -> Column:
    """Full chain: ligatures -> EOL de-hyphenation -> references cut ->
    scrub -> normalize (reference order: basic_clean, old_scripts/
    text_clean.py:43-55 — de-hyphenation precedes whitespace collapse)."""
    return scrub_metadata(
        truncate_references(dehyphenate_eol(fix_ligatures(col))))


def sanitize_id(col: Column) -> Column:
    """F8: '/'->'_', ':'->'_' (translate, no regex)."""
    return F.translate(col, "/:", "__")


# F5 tail (VERDICT r3 stretch #9): unidecode-lite transliteration of the
# Latin-1 Supplement + Latin Extended-A letters to ASCII — the common
# fold the reference gets from unidecode (old_scripts/text_clean.py:7,55)
# without the library. 1:1 maps are the NFKD base letter (generated from
# unicodedata, frozen here as constants and unit-verified against NFKD);
# the handful NFKD won't decompose (stroked/Norse letters) are pinned to
# unidecode's published choices. Deliberately NOT Cyrillic/Greek/CJK
# romanization — same "deliberate subset" posture as the mojibake repair.
_DIA_SRC = (
    "ÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝàáâãäåçèéêëìíîïñòóôõöùúûüýÿ"
    "ĀāĂăĄąĆćĈĉĊċČčĎďĒēĔĕĖėĘęĚěĜĝĞğĠġĢģĤĥĨĩĪīĬĭĮįİĴĵĶķĹĺĻļĽľ"
    "ŃńŅņŇňŌōŎŏŐőŔŕŖŗŘřŚśŜŝŞşŠšŢţŤťŨũŪūŬŭŮůŰűŲųŴŵŶŷŸŹźŻżŽžſ"
    "ĐđĦħŁłØøÐðıŦŧŊŋ"
)
_DIA_DST = (
    "AAAAAACEEEEIIIINOOOOOUUUUYaaaaaaceeeeiiiinooooouuuuyy"
    "AaAaAaCcCcCcCcDdEeEeEeEeEeGgGgGgGgHhIiIiIiIiIJjKkLlLlLl"
    "NnNnNnOoOoOoRrRrRrSsSsSsSsTtTtUuUuUuUuUuUuWwYyYZzZzZzs"
    "DdHhLlOoDdiTtNn"
)
# letters whose transliteration is 2 ASCII chars — translate() can't
# grow strings, so these are replace() passes (7 fixed literals)
_DIA_MULTI = (("ß", "ss"), ("Æ", "AE"), ("æ", "ae"), ("Œ", "OE"),
              ("œ", "oe"), ("Þ", "Th"), ("þ", "th"))


def fold_diacritics(col: Column) -> Column:
    """F5 tail: fold Latin diacritics/ligature letters to ASCII
    ("naïve café øre" -> "naive cafe ore"). JVM-side: one translate()
    for the 1:1 maps + seven literal replace() passes for the
    two-char expansions; non-Latin scripts pass through untouched.
    Display/cleaning aid — BM25 token identity already goes through the
    analyzer's own fold, which this does not alter."""
    c = F.translate(col, _DIA_SRC, _DIA_DST)
    for src, dst in _DIA_MULTI:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c
