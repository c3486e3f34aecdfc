"""Gopher-style repetition/quality filters (functions/gopher.py):
handcrafted documents with known n-gram structure, checked exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from research_engine_spark.functions.gopher import (
    doc_quality_flags,
    gopher_pass,
    repetition_metrics,
)


@pytest.fixture(scope="module")
def rep_df(spark):
    return spark.createDataFrame(
        [
            # "a b" x5 (cnt=5, len=3) over char_base 19 -> 15/19
            (0, "a b a b a b a b a b"),
            # all 2-grams unique; tie on cnt=1 broken by LARGEST gram:
            # "two three" (len 9) over char_base 39
            (1, "one two three four five six seven eight"),
            # every 5-gram duplicated -> dup5 == 1.0
            (2, "x y z x y z x y z x y z x y z"),
            # shorter than every n -> all fractions 0.0
            (3, "q"),
            # zero tokens -> excluded entirely
            (4, "!!! ???"),
        ],
        "doc_id long, text string",
    )


def test_repetition_metrics_exact(spark, rep_df):
    rows = {
        r["doc_id"]: r
        for r in repetition_metrics(
            rep_df, top_ns=(2, 3), dup_ns=(5,)
        ).collect()
    }
    assert set(rows) == {0, 1, 2, 3}  # doc 4 has no tokens
    assert rows[0]["top2_frac"] == pytest.approx(15 / 19)
    # doc 0 3-grams: "a b a" x4 (len 5) -> 20/19 > 1 (overlap; by design)
    assert rows[0]["top3_frac"] == pytest.approx(20 / 19)
    assert rows[0]["dup5_frac"] == 1.0
    assert rows[1]["top2_frac"] == pytest.approx(9 / 39)
    assert rows[1]["dup5_frac"] == 0.0
    assert rows[2]["dup5_frac"] == 1.0
    assert rows[3]["top2_frac"] == 0.0
    assert rows[3]["dup5_frac"] == 0.0


def test_repetition_single_explode_plan(spark, rep_df):
    """All n's ride ONE explode: the plan has exactly one Generate node."""
    plan = (
        repetition_metrics(rep_df, top_ns=(2, 3, 4), dup_ns=(5, 6))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("Generate explode") == 1


def test_doc_quality_flags(spark):
    passing = " ".join(
        ["the", "be", "to", "of", "and"] * 2 + ["word"] * 45
    )  # wc=55, has required words, mean len fine
    df = spark.createDataFrame(
        [
            (0, passing),
            (1, "the be " + " ".join(["word"] * 10)),  # wc=12 < 50
            (2, " ".join(["supercalifragilistic"] * 60)),  # mean wl > 10
            (3, " ".join(["12345"] * 60)),  # alpha ratio 0, no required
        ],
        "doc_id long, text string",
    )
    flags = doc_quality_flags(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[v.alias(k) for k, v in flags.items()],
            gopher_pass(F.col("text")).alias("ok"),
        ).collect()
    }
    assert out[0]["ok"]
    assert not out[1]["ok_word_count"] and out[1]["ok_required_words"]
    assert not out[2]["ok_mean_word_len"]
    assert not out[3]["ok_alpha_ratio"]
    assert not out[3]["ok_required_words"]
    assert out[3]["ok_word_count"]  # 60 tokens in range


def test_no_python_udf_in_plan(spark, rep_df):
    """Everything stays JVM-side: no BatchEvalPython / ArrowEvalPython."""
    for df in (
        repetition_metrics(rep_df),
        rep_df.select(gopher_pass(F.col("text"))),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
