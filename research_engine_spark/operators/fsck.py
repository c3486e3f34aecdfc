"""Index integrity verification (the Lucene ``CheckIndex`` analog).

A 100 TB deployment runs this after compactions, restores, and storage
migrations. Two tiers:

- **fast** (default): driver-side, no Spark job. Pointer existence and
  row counts are pure parquet-FOOTER metadata; the cross-table sums
  (Σ cf, Σ posting_count) and max(df) are single-column pyarrow reads
  of the VOCABULARY- and block-count-sized tables — O(vocabulary), not
  O(corpus), so still cheap after every commit (Heaps' law keeps the
  term dictionary orders of magnitude below the posting data; the
  corpus-sized docs/postings payloads are never read). Verifies: the
  generation pointer's referenced physical dirs all exist;
  corpus_stats.json parses and its ``n_docs`` equals the docs table's
  footer row count; Σ cf over term_stats equals ``total_tokens``;
  Σ posting_count over the lineage table equals Σ posting_count over
  the postings block metadata (the "lineage covers every posting
  exactly once" invariant the build promises).
- **deep** (``deep=True``): adds distributed checks — docs doc_ids are
  distinct; doc_stats doc_ids ⊆ docs; tombstoned ids ⊆ docs; every
  (term, salt) group's blocks are doc-sorted and contiguous
  (``countDistinct(block_id) == max(block_id) + 1``, the block layout
  every query path assumes); every block's write-time payload XXH64
  matches a recompute over the compressed payload columns (bit-rot
  detection; pre-checksum indexes are recorded skipped).

Returns ``{"ok": bool, "checks": {name: {"ok": bool, ...detail}}}`` —
no exceptions for integrity failures (callers alert on ``ok=False``);
only a missing/unreadable index raises.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .generations import table_mapping


def _footer_rows(path: str) -> int | None:
    import pyarrow.dataset as pads

    if not os.path.isdir(path):
        return None
    try:
        return int(pads.dataset(path, format="parquet").count_rows())
    except Exception:
        return None


def _footer_sum(path: str, col: str) -> int | None:
    """Exact column sum via a column-only pyarrow read (vocab/lineage
    sized tables — tiny relative to the corpus)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    if not os.path.isdir(path):
        return None
    try:
        ds = pads.dataset(path, format="parquet")
        if col not in ds.schema.names:
            return 0 if ds.count_rows() == 0 else None
        return int(pc.sum(ds.to_table(columns=[col])[col]).as_py() or 0)
    except Exception:
        return None


def verify_index(spark: SparkSession, index_dir: str,
                 deep: bool = False) -> dict:
    checks: dict[str, dict] = {}
    mapping = table_mapping(index_dir)

    def path(name: str) -> str:
        return os.path.join(index_dir, mapping[name])

    # 1. generation pointer: every referenced physical entry exists
    # (tombstones may legitimately be absent — no pending deletes)
    missing = [
        phys for logical, phys in mapping.items()
        if logical != "tombstones"
        and not os.path.exists(os.path.join(index_dir, phys))]
    checks["generation_pointer"] = {"ok": not missing, "missing": missing}
    if missing:
        return {"ok": False, "checks": checks}

    with open(path("corpus_stats.json")) as f:
        stats = json.load(f)

    # 2. n_docs == docs footer rows
    n_docs_files = _footer_rows(path("docs"))
    checks["n_docs"] = {
        "ok": n_docs_files == int(stats["n_docs"]),
        "corpus_stats": int(stats["n_docs"]), "docs_files": n_docs_files}

    # 3. token-total invariant, per the index's dl source: Σ cf over
    # term_stats (analyzer dl, the default) or Σ dl over doc_stats
    # (dl_source="bpe": doc lengths are trained-BPE counts, so Σ cf
    # counts a different unit)
    if stats.get("dl_source") == "bpe":
        tok_sum = _footer_sum(path("doc_stats"), "dl")
        checks["total_tokens"] = {
            "ok": tok_sum == int(stats["total_tokens"]),
            "corpus_stats": int(stats["total_tokens"]),
            "doc_stats": tok_sum}
    else:
        cf_sum = _footer_sum(path("term_stats"), "cf")
        checks["total_tokens"] = {
            "ok": cf_sum == int(stats["total_tokens"]),
            "corpus_stats": int(stats["total_tokens"]), "term_stats": cf_sum}

    # 4. lineage covers every posting exactly once (both sides are
    # fallible reads: None==None must be a FAILURE, not a pass — an
    # unreadable pair is exactly the corruption this check exists for)
    lin = _footer_sum(path("lineage"), "posting_count")
    post = _footer_sum(path("postings"), "posting_count")
    checks["lineage_coverage"] = {
        "ok": lin is not None and lin == post,
        "lineage": lin, "postings": post}

    # 5. df sanity: every term's df ≤ n_docs (a violation means postings
    # merged across builds without stats aggregation)
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    try:
        ds = pads.dataset(path("term_stats"), format="parquet")
        max_df = (int(pc.max(ds.to_table(columns=["df"])["df"]).as_py())
                  if ds.count_rows() else 0)
    except Exception:
        max_df = None
    checks["df_bound"] = {
        "ok": max_df is not None and max_df <= int(stats["n_docs"]),
        "max_df": max_df, "n_docs": int(stats["n_docs"])}

    if deep:
        docs = spark.read.parquet(path("docs"))
        n_distinct = docs.select("doc_id").distinct().count()
        checks["doc_ids_distinct"] = {
            "ok": n_distinct == int(stats["n_docs"]),
            "distinct": n_distinct, "n_docs": int(stats["n_docs"])}

        ds_tbl = spark.read.parquet(path("doc_stats"))
        orphans = (ds_tbl.select("doc_id").distinct()
                   .join(docs.select("doc_id"), "doc_id", "left_anti")
                   .count())
        checks["doc_stats_subset"] = {"ok": orphans == 0,
                                      "orphans": orphans}

        tomb = os.path.join(index_dir, mapping["tombstones"])
        if os.path.isdir(tomb):
            t_orphans = (spark.read.parquet(tomb).select("doc_id")
                         .distinct()
                         .join(docs.select("doc_id"), "doc_id",
                               "left_anti").count())
            checks["tombstones_subset"] = {"ok": t_orphans == 0,
                                           "orphans": t_orphans}

        post_tbl = spark.read.parquet(path("postings"))
        bad_groups = (
            post_tbl.groupBy("term", "salt")
            .agg(F.countDistinct("block_id").alias("nb"),
                 F.max("block_id").alias("mx"))
            .filter(F.col("nb") != F.col("mx") + 1).count())
        checks["block_layout"] = {"ok": bad_groups == 0,
                                  "bad_groups": bad_groups}

        # payload checksums: every block's stored write-time XXH64 must
        # match a recompute over the compressed payload columns —
        # bit-rot / torn-copy detection for snapshot/restore/migration.
        # Pre-checksum indexes (no payload_xxh column) are recorded as
        # skipped, not failed.
        if "payload_xxh" in post_tbl.columns:
            bad_blocks = post_tbl.filter(
                ~F.xxhash64("doc_gaps", "tfs", "dls", "poss")
                .eqNullSafe(F.col("payload_xxh"))).count()
            checks["payload_checksums"] = {"ok": bad_blocks == 0,
                                           "bad_blocks": bad_blocks}
        else:
            checks["payload_checksums"] = {
                "ok": True, "skipped": "pre-checksum index"}

    return {"ok": all(c["ok"] for c in checks.values()), "checks": checks}
