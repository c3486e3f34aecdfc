"""Reciprocal Rank Fusion (R7) + rank assignment (W2).

Reference: retrieval/query_retriever.py:66-74 accumulates
``scores[doc] += 1/(k + rank)`` across ranked lists in a Python dict, then
sorts (query_retriever.py:354-355). Natively: a union of ranked DataFrames,
a hash aggregate, and a top-k — pure built-in Spark (A3 + T3).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60  # reference default: query_retriever.py:87


def with_rank(df: DataFrame, score_col: str, *tiebreak: str) -> DataFrame:
    """Attach 1-based ``rank`` by score desc with deterministic tiebreak
    (W2: rag_service.py:106 enumerate over sorted hits)."""
    order = [F.desc(score_col)] + [F.asc(c) for c in tiebreak]
    return df.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


def rrf_fuse(
    ranked_lists: list[DataFrame],
    key_cols: list[str],
    k: int = RRF_K,
    top_n: int | None = None,
) -> DataFrame:
    """Fuse ranked lists (each with a ``rank`` column) by RRF.

    Returns key_cols + rrf_score, ordered by (rrf_score desc, keys asc).
    """
    tagged = [df.select(*key_cols, "rank") for df in ranked_lists]
    unioned = reduce(DataFrame.unionByName, tagged)
    fused = (
        unioned.groupBy(*key_cols)
        .agg(F.sum(1.0 / (F.lit(float(k)) + F.col("rank"))).alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), *[F.asc(c) for c in key_cols])
    )
    if top_n is not None:
        fused = fused.limit(int(top_n))
    return fused
