"""Incremental index maintenance via Structured Streaming.

The reference's ingestion is a batch pipeline ending in ES bulk-index +
refresh (retrieval/es_index_chunks_final.py:47-56); new chunks require
re-running the pipeline. Here new transcript turns stream in and each
micro-batch becomes an index segment (Lucene-segment analog):

    readStream(transcripts) -> foreachBatch(append_segment)

Per-batch semantics: exactly-once effect via a write-ahead pending marker
+ the applied-batch set. ``append_segment`` itself is not atomic (docs
are appended before postings/stats/markers land), so a crash mid-batch
would otherwise leave a partial segment that a checkpoint replay
re-appends at the same doc_ids — duplicate rows and doubled df/tf.
The protocol here:

1. BEFORE any write, record the pending segment (batch_id, snapshot_id,
   and the pre-append corpus stats = the segment's doc_id base) in
   ``stream_pending.json`` (atomic rename).
2. Run append_segment.
3. Mark the batch applied and remove the pending marker.

On replay after a crash, a leftover pending marker for a not-yet-applied
batch triggers cleanup: corpus_stats.json is restored to the recorded
pre-append values, docs part-files whose footer min(doc_id) >= the
recorded base are deleted, and postings/term_stats/lineage part-files
tagged with the pending snapshot_id are deleted — all from parquet footer
metadata, no data scan. Only then is the batch re-applied.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..corpus import TRANSCRIPT_SCHEMA
from ..operators.indexer import append_segment


def _batch_marker(index_dir: str) -> str:
    return os.path.join(index_dir, "stream_batches.json")


def _pending_marker(index_dir: str) -> str:
    return os.path.join(index_dir, "stream_pending.json")


def _applied_batches(index_dir: str) -> set[int]:
    p = _batch_marker(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            return set(json.load(f))
    return set()


def _write_json_atomic(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _read_pending(index_dir: str) -> dict | None:
    p = _pending_marker(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def _parquet_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out.extend(os.path.join(dirpath, f) for f in files
                   if f.endswith(".parquet"))
    return out


def _footer_col_min(path: str, col: str):
    """min over row-group footer statistics for one column; None if any
    row group lacks stats (caller falls back to reading the column)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins = []
    for rg in range(md.num_row_groups):
        rgm = md.row_group(rg)
        for ci in range(rgm.num_columns):
            c = rgm.column(ci)
            if c.path_in_schema == col:
                if c.statistics is None or not c.statistics.has_min_max:
                    return None
                mins.append(c.statistics.min)
    return min(mins) if mins else None


def _col_min_any(path: str, col: str):
    v = _footer_col_min(path, col)
    if v is not None:
        return v
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=[col])
    vals = t[col].to_pylist()
    return min(vals) if vals else None


def _cleanup_partial_segment(index_dir: str, pending: dict) -> None:
    """Remove every file the interrupted segment may have written and
    restore corpus_stats.json to its pre-append values."""
    from ..operators.generations import table_mapping

    gen_map = table_mapping(index_dir)
    # file-removal threshold is the docID high-water mark, not n_docs:
    # after a purging compaction surviving ids can exceed n_docs, but all
    # are < next_doc_id, while the interrupted append wrote only >= it
    base = int(pending.get("next_doc_id_before", pending["n_docs_before"]))
    snap = pending["snapshot_id"]

    for tbl in ("docs", "doc_stats"):
        tdir = os.path.join(index_dir, gen_map[tbl])
        if not os.path.isdir(tdir):
            continue
        for fp in _parquet_files(tdir):
            mn = _col_min_any(fp, "doc_id")
            # every pre-existing file holds at least one doc_id < base;
            # every file of the interrupted append holds only >= base
            if mn is not None and int(mn) >= base:
                os.remove(fp)

    for tbl in ("postings", "term_stats", "lineage"):
        root = os.path.join(index_dir, gen_map[tbl])
        if not os.path.isdir(root):
            continue
        for fp in _parquet_files(root):
            mn = _col_min_any(fp, "snapshot_id")
            # appended part-files hold rows of exactly one snapshot
            if mn == snap:
                os.remove(fp)

    stats_path = os.path.join(index_dir, gen_map["corpus_stats.json"])
    with open(stats_path) as f:
        stats = json.load(f)
    stats["n_docs"] = int(pending["n_docs_before"])
    stats["next_doc_id"] = base
    stats["total_tokens"] = int(pending["total_tokens_before"])
    stats["avgdl"] = (stats["total_tokens"] / stats["n_docs"]
                      if stats["n_docs"] else 0.0)
    _write_json_atomic(stats_path, stats)


def make_foreach_batch(index_dir: str, compact_every: int | None = None):
    """foreachBatch sink: append each micro-batch as an index segment,
    idempotent on batch replay (exactly-once effect, crash-safe via the
    pending-segment marker; see module docstring).

    compact_every=K: after a successful append, force-merge once the
    index holds more than K snapshots (the Lucene tiered-merge analog —
    unbounded micro-batching otherwise accretes one segment per batch
    and every query decodes ever more small tail blocks). The gate is a
    driver-side parquet-footer census (zero Spark jobs between
    compactions); compaction itself commits atomically via the
    generation pointer (operators/generations.py) — an interrupted
    attempt leaves only unreferenced staged dirs, swept by the next
    compact_index call.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        applied = _applied_batches(index_dir)
        pending = _read_pending(index_dir)
        if batch_id in applied:
            return  # replayed batch after checkpoint recovery
        if pending is not None:
            # interrupted earlier attempt (this batch or an older one that
            # never got marked applied): roll its partial writes back
            _cleanup_partial_segment(index_dir, pending)
            os.remove(_pending_marker(index_dir))
        if batch_df.isEmpty():
            # still record it: an empty batch id must not look "unseen"
            # to a later replay carrying different content
            applied.add(int(batch_id))
            _write_json_atomic(_batch_marker(index_dir), sorted(applied))
            return
        from ..operators.generations import resolve

        with open(resolve(index_dir, "corpus_stats.json")) as f:
            stats_before = json.load(f)
        snapshot_id = f"stream_{batch_id}"
        _write_json_atomic(_pending_marker(index_dir), {
            "batch_id": int(batch_id),
            "snapshot_id": snapshot_id,
            "n_docs_before": int(stats_before["n_docs"]),
            "next_doc_id_before": int(stats_before.get(
                "next_doc_id", stats_before["n_docs"])),
            "total_tokens_before": int(stats_before["total_tokens"]),
        })
        append_segment(batch_df, index_dir, snapshot_id=snapshot_id)
        applied.add(int(batch_id))
        _write_json_atomic(_batch_marker(index_dir), sorted(applied))
        os.remove(_pending_marker(index_dir))
        if compact_every:
            from ..operators.indexer import compact_index, snapshot_census

            census = snapshot_census(resolve(index_dir, "postings"),
                                     stop_after=int(compact_every))
            if census is None or len(census) > int(compact_every):
                compact_index(batch_df.sparkSession, index_dir)

    return apply


def incremental_index_stream(
    spark: SparkSession,
    input_path: str,
    index_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    compact_every: int | None = None,
):
    """Start a streaming query that indexes transcript parquet files as
    they land in ``input_path``. Returns the StreamingQuery handle.
    compact_every=K auto-force-merges whenever more than K segments have
    accumulated (see make_foreach_batch)."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_path)
    )
    writer = (
        stream.writeStream.foreachBatch(
            make_foreach_batch(index_dir, compact_every=compact_every))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
