"""Similarity search over embedding columns (the reference's FAISS path,
re-expressed on DataFrames).

Reference: retrieval/build_faiss.py:17-19 builds IndexFlatIP over
L2-normalized vectors (cosine == inner product); retrieval/vector_store.py:
146-161 does query-time top-k. Natively:

- brute_force_topk: exact cosine top-k — a broadcast of the (tiny) query
  vector + a JVM-side F.aggregate/zip_with dot product + distributed
  TakeOrderedAndProject. No crossJoin, no Python in the hot path.
- lsh_bucketed_topk: the scale path — random-hyperplane LSH buckets
  (SimHash for vectors); candidates share ≥1 hyperplane-sign bucket, exact
  rescoring only within candidates. At 100 TB the bucket join replaces the
  full scan; recall is tunable via n_planes/n_tables.
- pairwise near-dup: embedding-cosine near-duplicate candidates for dedup.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(vec_col, qvec: list[float]):
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col):
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0),
                              lambda acc, x: acc + x * x))


def cosine_to_query(vec_col, qvec: list[float]):
    qn = float(np.linalg.norm(np.asarray(qvec, dtype=np.float64)))
    return _dot(vec_col, qvec) / (_norm(vec_col) * F.lit(qn))


def brute_force_topk(
    embeddings: DataFrame,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k (T2/R6). Returns (id, cosine) by
    (cosine desc, id asc) — deterministic tiebreak as everywhere."""
    return (
        embeddings.select(
            F.col(id_col),
            cosine_to_query(F.col(vec_col), qvec).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(int(k))
    )


def _plane_signs(vec_col, planes: np.ndarray):
    """Bit-sign bucket id for a set of random hyperplanes (one LSH table)."""
    bits = []
    for i in range(planes.shape[0]):
        d = F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(float(x)) for x in planes[i]]),
                       lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_bucketed_topk(
    embeddings: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate NN: random-hyperplane LSH candidate generation + exact
    rescore. Scans only rows whose bucket matches the query in ≥1 table."""
    dim = len(qvec)
    rng = np.random.default_rng(seed)
    q = np.asarray(qvec, dtype=np.float64)
    cond = None
    for t in range(n_tables):
        planes = rng.standard_normal((n_planes, dim))
        qbucket = int(sum((1 << i) for i in range(n_planes)
                          if planes[i] @ q >= 0))
        c = _plane_signs(F.col(vec_col), planes) == F.lit(qbucket)
        cond = c if cond is None else (cond | c)
    candidates = embeddings.filter(cond)
    return brute_force_topk(candidates, qvec, k, id_col, vec_col)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate candidates: bucket by hyperplane
    signs, exact cosine within buckets only (id_a < id_b)."""
    first = embeddings.select(vec_col).first()
    if first is None:
        return embeddings.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine double")
    dim = len(first[0])
    planes = np.random.default_rng(seed).standard_normal((n_planes, dim))
    bucketed = embeddings.select(
        F.col(id_col), F.col(vec_col),
        _plane_signs(F.col(vec_col), planes).alias("bucket"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"),
                   lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn("cosine", dot / (F.col("a.nrm") * F.col("b.nrm")))
        .filter(F.col("cosine") >= F.lit(threshold))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"), "cosine")
    )
