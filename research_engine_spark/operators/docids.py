"""Global dense docID assignment under stable (conv_id, turn_idx) ordering.

The reference's document identity is ``f"{paper_id}::{chunk_index}"`` with
insertion order = chunk_index ascending per paper (retrieval/
es_index_chunks_final.py:19; database/scripts/chunk_pdfs_oai.py:123). The
north rule requires docIDs from "stable (conv_id, turn_idx) ordering".

A naive ``dense_rank().over(Window.orderBy(conv_id, turn_idx))`` is a
single-partition global sort — a non-starter at 10^12 turns. Instead:

1. build the conversation dimension (one row per conv: n_turns) — ~3
   orders of magnitude smaller than the turn table;
2. range-partition it by conv_id and cumulative-sum n_turns *within*
   partitions (parallel), collecting only the per-partition totals (a few
   hundred longs) to the driver to compute partition base offsets;
3. docID = conv_offset + row_number within the conversation (turn_idx
   ascending) — the per-conv window is keyed, never global.

Output docIDs are identical to the global-sort answer but the largest
shuffle is O(#convs), not O(#turns), and nothing is ever single-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conv_offsets(transcripts: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """Per-conversation global offset table: (conv_id, n_turns, conv_offset).

    conv_offset = number of turns in all conversations ordered before this
    one under lexicographic conv_id order.
    """
    spark = transcripts.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    conv_dim = transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns")
    )
    ranged = (
        conv_dim.repartitionByRange(n_partitions, "conv_id")
        .withColumn("pid", F.spark_partition_id())
    )
    # per-partition running sum (partition-local window: parallel)
    w = Window.partitionBy("pid").orderBy("conv_id")
    ranged = ranged.withColumn(
        "local_cum", F.sum("n_turns").over(w) - F.col("n_turns")
    )
    ranged = ranged.persist()
    # tiny collect: one (pid, total) row per partition
    totals = {
        r["pid"]: r["tot"]
        for r in ranged.groupBy("pid").agg(F.sum("n_turns").alias("tot")).collect()
    }
    base, acc = {}, 0
    for pid in sorted(totals):
        base[pid] = acc
        acc += totals[pid]
    base_df = spark.createDataFrame(
        [(int(p), int(b)) for p, b in base.items()], "pid int, base bigint"
    )
    out = (
        ranged.join(F.broadcast(base_df), "pid")
        .select(
            "conv_id",
            "n_turns",
            (F.col("base") + F.col("local_cum")).alias("conv_offset"),
        )
    )
    return out


def with_doc_ids(transcripts: DataFrame, offsets: DataFrame | None = None) -> DataFrame:
    """Attach a global dense ``doc_id`` column to the transcript table.

    doc_id = conv_offset + rank(turn_idx within conv) - 1; ranking within a
    conversation handles non-contiguous turn_idx while staying a keyed
    (never global) window.
    """
    if offsets is None:
        offsets = conv_offsets(transcripts)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        transcripts.join(offsets.select("conv_id", "conv_offset"), "conv_id")
        .withColumn(
            "doc_id",
            F.col("conv_offset") + F.row_number().over(w) - F.lit(1),
        )
        .drop("conv_offset")
    )
