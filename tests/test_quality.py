"""P5/P6 fidelity: the Spark column expressions must agree with a direct
Python port of the reference's is_quality_content
(database/scripts/chunk_pdfs_final.py:133-160) on texts exercising every
rule, and the replacement scan must implement the reference's
trigger/acceptance thresholds and greedy same-group pairing
(retrieval/content_generator_v2.py:115-200)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from research_engine_spark.functions.textstats import is_quality_content
from research_engine_spark.operators.retrieval_extras import replacement_scan


def _reference_is_quality_content(text: str) -> bool:
    """Line-faithful port of chunk_pdfs_final.py:133-160 (public logic)."""
    if not text or len(text.strip()) < 50:
        return False
    citation_count = len(re.findall(
        r"\[[\d,\s-]+\]|\([A-Za-z]+\s+et\s+al\.?\s*,\s*\d{4}\)", text))
    if citation_count > len(text.split()) * 0.1:
        return False
    if len(re.findall(r"https?://|www\.", text)) > 3:
        return False
    sentences = re.split(r"[.!?]+", text)
    meaningful = [s for s in sentences
                  if len(s.strip()) > 20 and re.search(r"[a-zA-Z]", s)]
    if len(meaningful) < 2:
        return False
    academic_words = ["analysis", "method", "approach", "model", "algorithm",
                      "experiment", "result", "conclusion", "study",
                      "research", "data", "performance", "evaluation",
                      "comparison"]
    lower = text.lower()
    return sum(1 for w in academic_words if w in lower) >= 2


CASES = [
    # passes everything
    "Our analysis shows the proposed method improves results. "
    "The experiment demonstrates strong performance on all datasets.",
    # too short
    "Short analysis text.",
    # citation-heavy (reference-section shape)
    "[1] A. Author 2019 [2,3] B. Author 2020 [4-6] C. Author 2021 "
    "analysis method results experiment data",
    # too many URLs
    "See https://a.com https://b.com https://c.com https://d.com for the "
    "full analysis. The method works well in every experiment we ran.",
    # no meaningful sentences (one long run-on, no terminator)
    "analysis method experiment data performance evaluation comparison "
    "model algorithm research study results conclusion approach",
    # meaningful sentences but no academic keywords
    "The quick brown fox jumped over the lazy sleeping dog today. "
    "Seventeen colorful balloons drifted across the quiet evening sky.",
    # unicode + et-al citation within budget
    "In our study (Smith et al., 2020) the approach performs well. "
    "Further analysis confirms the effect holds across datasets.",
    "",
]


def test_p5_matches_reference_port(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)],
                               "i int, text string")
    got = {r["i"]: r["q"] for r in df.select(
        "i", is_quality_content(F.col("text")).alias("q")).collect()}
    for i, t in enumerate(CASES):
        assert got[i] == _reference_is_quality_content(t), (i, t[:60])


def test_p6_trigger_acceptance_and_pairing(spark):
    # group g1: two failing rows, two acceptable replacements, one passing
    # row that is not a candidate target; group g2: failing row with no
    # replacement available -> kept as itself.
    rows = [
        # (group, doc_id, score, raw_len, clean_len)
        ("g1", 1, 9.0, 1000, 100),   # fail (ratio .1, len < 500)
        ("g1", 2, 8.0, 1000, 120),   # fail
        ("g1", 3, 7.0, 1000, 900),   # pass (ratio .9)
        ("g1", 4, 6.0, 1000, 450),   # fail ratio .45 BUT... len 450 < 500 -> fail
        ("g1", 5, 5.0, 1000, 600),   # pass (len >= 500 despite ratio .6)
        ("g2", 6, 4.0, 1000, 10),    # fail, no passing row in group
    ]
    df = spark.createDataFrame(
        rows, "group_id string, doc_id long, score double, "
              "raw_len long, clean_len long")
    out = {r["doc_id"]: (r["kept_id"], r["replaced"])
           for r in replacement_scan(df).collect()}
    # reference trigger: ratio < 0.5 AND clean < 500; acceptance:
    # ratio >= 0.5 OR clean >= 500
    assert out[3] == (3, False) and out[5] == (5, False)  # passing rows kept
    # failing rows ranked by score desc: 1, 2, 4; replacements by score
    # desc: 3, 5 -> greedy pairing, third failing row keeps itself
    assert out[1] == (3, True)
    assert out[2] == (5, True)
    assert out[4] == (4, False)
    assert out[6] == (6, False)  # no candidate in g2


def test_p6_boundary_thresholds(spark):
    rows = [
        ("g", 1, 2.0, 1000, 499),   # ratio .499 & len 499 -> fail
        ("g", 2, 1.0, 1000, 500),   # len == 500 -> acceptance holds
    ]
    df = spark.createDataFrame(
        rows, "group_id string, doc_id long, score double, "
              "raw_len long, clean_len long")
    out = {r["doc_id"]: (r["kept_id"], r["replaced"])
           for r in replacement_scan(df).collect()}
    assert out[1] == (2, True)
    assert out[2] == (2, False)


def _reference_identify_sections(text: str) -> dict:
    """Line-faithful port of chunk_pdfs_final.py:84-131."""
    sections = {"abstract": "", "introduction": "", "main_content": "",
                "references": "", "acknowledgments": ""}
    current, content = "main_content", []
    for line in text.split("\n"):
        line = line.strip()
        if not line:
            continue
        matched = None
        for name, pat in [
            ("abstract", r"^\d+\.?\s*(?:Abstract|ABSTRACT)"),
            ("introduction", r"^\d+\.?\s*(?:Introduction|INTRODUCTION)"),
            ("references",
             r"^\d+\.?\s*(?:References?|Bibliography|REFERENCES?|BIBLIOGRAPHY)"),
            ("acknowledgments", r"^\d+\.?\s*(?:Acknowledgments?|ACKNOWLEDGMENTS?)"),
        ]:
            if re.match(pat, line, re.IGNORECASE):
                matched = name
                break
        if matched:
            if content:
                sections[current] = "\n".join(content)
            current, content = matched, []
        else:
            content.append(line)
    if content:
        sections[current] = "\n".join(content)
    return sections


SECTION_DOCS = [
    "Title of the paper\n1. Abstract\nThis paper studies X.\nIt is great.\n"
    "2 Introduction\nWe introduce Y.\n3. References\n[1] Someone 2020",
    # bare headers (no digit) are NOT headers — reference quirk
    "Abstract\neverything lands in main content\nReferences\nstill main",
    # repeated section: last flush wins
    "1. Introduction\nfirst intro\n2. References\nrefs here\n"
    "3. Introduction\nsecond intro wins",
    # blank lines dropped, acknowledgments
    "some preamble\n\n\n4. Acknowledgments\nthanks everyone\n\nand you",
    "",
    "only main content here\nwith two lines",
]


def test_f7_sections_match_reference_port(spark):
    from research_engine_spark.operators.retrieval_extras import (
        identify_sections)

    df = spark.createDataFrame([(i, t) for i, t in enumerate(SECTION_DOCS)],
                               "doc_id long, text string")
    got: dict = {}
    for r in identify_sections(df).collect():
        got.setdefault(r["doc_id"], {})[r["section"]] = r["content"]
    for i, t in enumerate(SECTION_DOCS):
        want = {k: v for k, v in _reference_identify_sections(t).items() if v}
        assert got.get(i, {}) == want, (i, t[:50])
