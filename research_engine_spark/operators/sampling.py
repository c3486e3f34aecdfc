"""Deterministic stratified sampling and per-stratum capping — the
data-mixing primitives of a training pipeline ("downsample language X
to 3%", "cap every source domain at N documents").

Both are driven by a cryptographic-hash order instead of Spark's
``sample``/``rand()``: md5 of the row id gives a uniform, engine-
portable, run-stable coin — the same row set comes back on every run,
on every engine (the DuckDB oracle twins reproduce it byte-for-byte),
and after any repartition. The reference samples with ``random.sample``
(database/scripts/sample_paper_dates.py:33-39) — fine for eyeballing,
useless for reproducible corpus builds.

Scale notes (10^12 rows): ``stratified_sample`` is a pure map-side
filter — zero shuffles, the predicate pushes into the scan.
``cap_per_stratum`` is one window over (stratum, hash): row_number
streams, so the cost is the per-stratum sort, which spills rather than
OOMs; for tiny caps over huge strata, pre-thin with
``stratified_sample`` first (composable: both use the same hash coin,
and thinning then capping is still deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_coin", "stratified_sample", "cap_per_stratum"]

_COIN_WIDTH = 8  # hex chars: 16^8 = 2^32 distinct coin values


def hash_coin(id_col: Column, salt: str = "") -> Column:
    """An 8-hex-char uniform coin from a row id: lexicographic order on
    it IS uniform order (lowercase hex compares identically in Spark,
    DuckDB, and every collator). ``salt`` decorrelates independent
    draws over the same ids."""
    return F.substring(
        F.md5(F.concat(id_col.cast("string"), F.lit(salt))),
        1, _COIN_WIDTH)


def _cutoff(fraction: float) -> str:
    f = min(max(float(fraction), 0.0), 1.0)
    v = int(round(f * 16 ** _COIN_WIDTH))
    if v >= 16 ** _COIN_WIDTH:
        return "g"  # sorts above every hex string: fraction 1.0 keeps all
    return format(v, f"0{_COIN_WIDTH}x")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Keep each row iff its hash coin falls below its stratum's
    fraction cutoff — deterministic ``sampleBy``. ``fractions`` maps
    stratum values to keep-fractions; unlisted strata use ``default``
    (0.0 = drop, the data-mixing posture: unknown domains excluded
    loudly). Pure map-side filter; exact expected rates, zero shuffle."""
    coin = hash_coin(F.col(id_col), salt)
    expr = None
    for value, frac in sorted(fractions.items()):
        expr = (F.when if expr is None else expr.when)(
            F.col(strata_col) == value, F.lit(_cutoff(frac)))
    cutoff = (F.lit(_cutoff(default)) if expr is None
              else expr.otherwise(F.lit(_cutoff(default))))
    return df.filter(coin < cutoff)


def cap_per_stratum(
    df: DataFrame,
    strata_col: str,
    n: int,
    id_col: str = "doc_id",
    order_col: str | None = None,
    descending: bool = True,
    salt: str = "",
) -> DataFrame:
    """Keep at most ``n`` rows per stratum — the domain-capping step of
    a data mix. Selection order: an explicit ``order_col`` (e.g. a
    quality score, ``descending`` by default — "keep the best n per
    domain") or, when omitted, the hash coin (an unbiased deterministic
    n-subsample). The id column breaks all ties, so the kept set is
    unique for any input ordering."""
    if n < 1:
        raise ValueError("cap_per_stratum needs n >= 1")
    from pyspark.sql import Window

    if order_col is None:
        order = [F.asc("_coin")]
        frame = df.withColumn("_coin", hash_coin(F.col(id_col), salt))
    else:
        order = [F.col(order_col).desc() if descending
                 else F.col(order_col).asc()]
        frame = df
    w = Window.partitionBy(strata_col).orderBy(*order, F.asc(id_col))
    return (frame.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= int(n))
            .drop("_rk", "_coin"))
