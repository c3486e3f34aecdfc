"""Incremental index maintenance via Structured Streaming.

The reference's ingestion is a batch pipeline ending in ES bulk-index +
refresh (retrieval/es_index_chunks_final.py:47-56); new chunks require
re-running the pipeline. Here new transcript turns stream in and each
micro-batch becomes an index segment (Lucene-segment analog):

    readStream(transcripts) -> foreachBatch(append_segment)

Per-batch semantics: exactly-once via the streaming checkpoint (a replayed
batch is detected by batch_id and skipped); docIDs extend monotonically;
corpus stats update incrementally; queries immediately see new segments
because idf/norm/bounds are computed at query time from aggregated stats
(no rewrite of existing postings).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..corpus import TRANSCRIPT_SCHEMA
from ..operators.indexer import append_segment


def _batch_marker(index_dir: str) -> str:
    return os.path.join(index_dir, "stream_batches.json")


def _applied_batches(index_dir: str) -> set[int]:
    p = _batch_marker(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            return set(json.load(f))
    return set()


def make_foreach_batch(index_dir: str):
    """foreachBatch sink: append each micro-batch as an index segment,
    idempotent on batch replay (exactly-once effect)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        applied = _applied_batches(index_dir)
        if batch_id in applied:
            return  # replayed batch after checkpoint recovery
        if batch_df.isEmpty():
            return
        append_segment(batch_df, index_dir, snapshot_id=f"stream_{batch_id}")
        applied.add(int(batch_id))
        with open(_batch_marker(index_dir), "w") as f:
            json.dump(sorted(applied), f)

    return apply


def incremental_index_stream(
    spark: SparkSession,
    input_path: str,
    index_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Start a streaming query that indexes transcript parquet files as
    they land in ``input_path``. Returns the StreamingQuery handle."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_path)
    )
    writer = (
        stream.writeStream.foreachBatch(make_foreach_batch(index_dir))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
