"""Iceberg table support (gated: the Iceberg runtime jar is not in this
image, so everything degrades to partitioned parquet + a JSON snapshot
manifest, which is what build_index/resume_index use today).

On a cluster with `org.apache.iceberg:iceberg-spark-runtime` on the
classpath and a catalog configured, `iceberg_available()` flips to True
and the writers below use `writeTo(...).append()` / snapshot semantics
natively; resume-from-snapshot maps to `VERSION AS OF`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j package access is lazy and never raises — force a real
        # classloader lookup
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.Table")
        return True
    except Exception:
        return False


def write_table(df: DataFrame, identifier: str, path: str,
                partition_by: list[str] | None = None,
                mode: str = "overwrite") -> str:
    """Write a table; Iceberg when available, else partitioned parquet.
    Returns the storage location actually used."""
    spark = df.sparkSession
    if iceberg_available(spark):
        writer = df.writeTo(identifier).using("iceberg")
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return identifier
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return path


def read_table(spark: SparkSession, identifier: str, path: str) -> DataFrame:
    if iceberg_available(spark):
        return spark.read.table(identifier)
    return spark.read.parquet(path)
