"""Document deletion: tombstones now, physical purge at compaction.

The reference cannot delete individual documents at all — its FAISS store
says so outright ("no deletions (rebuild to delete)", retrieval/
vector_store.py:13,125) and its ES index is only ever dropped and
recreated whole (retrieval/es_create_index_final.py:10-13). A 100 TB
training-data pipeline needs better: dedup removal, takedown requests,
and turn-level corrections must not force an O(corpus) rebuild.

This module implements the Lucene/ES document lifecycle the reference
delegates to Elasticsearch and then never uses:

- ``delete_ids`` / ``delete_by_query`` append docIDs to an append-only
  ``tombstones/`` parquet table (the liveDocs-bitset analog; ES
  ``_delete_by_query`` analog). No index table is touched — a delete is
  O(|deleted|), never O(corpus).
- Query time: every search path anti-joins its scored candidates against
  the tombstone set BEFORE top-k, so deleted docs never surface. Exactly
  like Lucene before a merge, corpus statistics (df, N, avgdl) still
  include the deleted docs until compaction — scores of surviving docs
  are bit-identical to their pre-delete values (asserted in tests).
- ``compact_index`` physically purges: tombstoned postings are dropped
  during the run-merge decode, docs/doc_stats rows are removed,
  term_stats and corpus stats are recomputed exactly, and the tombstone
  files are deleted inside the same crash-safe staged swap. After the
  purge the index is bit-identical (scores and ranks) to a fresh build
  over the surviving corpus (asserted in tests).
- ``upsert_turns`` = tombstone the old (conv_id, turn_idx) versions +
  append_segment the new rows: the ES ``index`` (overwrite-by-id)
  analog, without rewriting any existing segment.

Scale notes (10^12 turns): the tombstone table is tiny relative to the
corpus (deletes are a fraction of ingest); query-time exclusion is a
broadcast hash anti-join while the set fits a broadcast, and falls back
to a shuffled anti-join — never a collect — beyond that. Compaction
materializes the deleted-id set once on the driver as a sorted int64
array for the in-merge mask; a 10^8-id set is ~800 MB, past which the
right move is segment-scoped bitmaps — documented, not yet needed at any
tested scale.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterable

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOMBSTONE_DIR = "tombstones"


def _tomb_path(index_dir: str) -> str:
    return os.path.join(index_dir, TOMBSTONE_DIR)


def delete_ids(index_dir: str, doc_ids: Iterable[int]) -> int:
    """Tombstone explicit docIDs. Driver-side pyarrow append (a delete
    of a handful of ids must not pay a Spark job); one new part-file per
    call, deduplicated within the call. Returns ids written."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = sorted({int(x) for x in doc_ids})
    if not ids:
        return 0
    d = _tomb_path(index_dir)
    os.makedirs(d, exist_ok=True)
    tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    pq.write_table(tbl, os.path.join(d, f"del-{uuid.uuid4().hex}.parquet"))
    return len(ids)


def delete_by_query(reader, where: Column | str) -> int:
    """Tombstone every doc matching a predicate over the forward docs
    table (ES ``_delete_by_query`` analog). One distributed filter job
    writes matching docIDs straight into the tombstone table — the
    matching set never passes through the driver. Returns the count.
    Call ``reader.refresh()`` afterwards (done here) so subsequent
    searches on this reader see the tombstones."""
    cond = F.expr(where) if isinstance(where, str) else where
    d = _tomb_path(reader.index_dir)
    before = n_tombstone_rows(reader.index_dir)
    matched = reader.docs.filter(cond).select("doc_id")
    matched.write.mode("append").parquet(d)
    written = n_tombstone_rows(reader.index_dir) - before
    reader.refresh()
    return int(written)


def tombstones_df(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Distinct tombstoned docIDs as a DataFrame, or None if there are
    none. (Distinct: the same id may be deleted twice, and upserts of
    the same turn tombstone repeatedly.)"""
    d = _tomb_path(index_dir)
    if not os.path.isdir(d) or not any(
            f.endswith(".parquet") for f in os.listdir(d)):
        return None
    return spark.read.parquet(d).select("doc_id").distinct()


def n_tombstone_rows(index_dir: str) -> int:
    """Row count over the tombstone files from parquet footers only
    (duplicates across files included — an upper bound used to decide
    whether deletes exist and whether the set is broadcast-sized)."""
    import pyarrow.dataset as pads

    d = _tomb_path(index_dir)
    if not os.path.isdir(d):
        return 0
    try:
        return int(pads.dataset(d, format="parquet").count_rows())
    except Exception:
        return 0


def deleted_ids_sorted(index_dir: str) -> np.ndarray:
    """The distinct deleted-id set as a sorted int64 numpy array
    (driver-side pyarrow read; see the module docstring's scale note).
    Used by compaction's in-merge mask."""
    import pyarrow.dataset as pads

    d = _tomb_path(index_dir)
    if not os.path.isdir(d):
        return np.empty(0, dtype=np.int64)
    ds = pads.dataset(d, format="parquet")
    arr = ds.to_table(columns=["doc_id"]).column("doc_id").to_numpy()
    return np.unique(arr.astype(np.int64))


def clear_tombstones(index_dir: str) -> None:
    """Remove the tombstone table (after a purge has applied it)."""
    import shutil

    d = _tomb_path(index_dir)
    if os.path.isdir(d):
        shutil.rmtree(d)


def upsert_turns(transcripts: DataFrame, index_dir: str, **append_kwargs):
    """Overwrite-by-key (the ES ``index`` action analog): tombstone any
    existing docs with the incoming rows' (conv_id, turn_idx) keys, then
    append the new rows as a fresh segment. The old versions disappear
    from results immediately (tombstone anti-join) and physically at the
    next compaction; no existing segment is rewritten.

    Returns append_segment's stats dict plus ``n_replaced``."""
    from .indexer import append_segment
    from .scorer import IndexReader

    spark = transcripts.sparkSession
    reader = IndexReader(spark, index_dir)
    keys = transcripts.select("conv_id", "turn_idx").distinct()
    # broadcast the incoming key set only while it is broadcast-sized
    # (same posture as IndexReader.live_only): a bulk upsert of tens of
    # millions of keys must fall back to a shuffled semi-join, not pin
    # the whole set on the driver. The count is one cheap job over the
    # incoming batch, which the append below scans anyway.
    if keys.count() <= 5_000_000:
        keys = F.broadcast(keys)
    old = (reader.docs.join(keys, ["conv_id", "turn_idx"], "left_semi")
           .select("doc_id"))
    d = _tomb_path(index_dir)
    before = n_tombstone_rows(index_dir)
    old.write.mode("append").parquet(d)
    n_replaced = n_tombstone_rows(index_dir) - before
    stats = append_segment(transcripts, index_dir, **append_kwargs)
    stats["n_replaced"] = int(n_replaced)
    return stats
