"""7M-turn evidence for the round-4 generation/DSL/explain machinery.

Builds the same 7,017,796-turn corpus as the scaling legs on tmpfs at
local[32] (unpinned — this measures FEATURE latencies at scale, not
core-scaling), then exercises each new surface:

- es_search: the reference's full bool/should body, distributed (the
  7M corpus exceeds every driver-local budget — the gate must fall back
  at zero overhead), vs the plain search baseline.
- explain: per-doc breakdown latency — the block-metadata range probe
  must stay in tens of ms regardless of term df, and the folded score
  must equal search's bit-for-bit.
- delete_by_query -> purging compaction committed via the atomic
  generation pointer (keep_generations=2) -> post-purge search; then a
  generation-0 TIME-TRAVEL read against the retained snapshot, and
  gc_generations(keep=1) reclaim.

    python scripts/lifecycle_7m_job.py [n_convs]  # default 1_200_000

Prints one JSON line; copy to BENCH/lifecycle_7m_r4.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    base = "/dev/shm/lifecycle7m"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    idx = os.path.join(base, "idx")

    from research_engine_spark.session import get_spark

    spark = get_spark(
        app_name="lifecycle7m", cores=32, shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false",
                    "spark.local.dir": os.path.join(base, "tmp")})
    spark.sparkContext.setLogLevel("ERROR")

    from research_engine_spark.corpus import synth_transcripts
    from research_engine_spark.operators.deletes import delete_by_query
    from research_engine_spark.operators.esdsl import es_search
    from research_engine_spark.operators.generations import (
        current_gen, gc_generations)
    from research_engine_spark.operators.indexer import (build_index,
                                                         compact_index)
    from research_engine_spark.operators.scorer import (IndexReader,
                                                        explain, search)
    from research_engine_spark.reference_queries import REFERENCE_QUERIES

    out: dict = {"n_convs": n_convs}
    tx = synth_transcripts(spark, n_convs=n_convs, seed=1)
    t0 = time.monotonic()
    stats = build_index(tx, idx, n_buckets=64, n_partitions=64,
                        with_positions=True)
    out["build_sec"] = round(time.monotonic() - t0, 1)
    out["n_turns"] = int(stats["n_docs"])
    out["turns_per_sec"] = round(stats["n_docs"] / out["build_sec"], 1)

    reader = IndexReader(spark, idx)
    search(reader, "architecture", k=1, with_text=False).collect()  # warm

    def body(q):
        return {"query": {"bool": {"should": [
            {"match": {"text": q}},
            {"match_phrase": {"text": {"query": q, "boost": 2.0}}}],
            "minimum_should_match": 1}}, "size": 10}

    # warm the composed plan shape once (like bench section 2g)
    es_search(reader, body("architecture design")).collect()
    es, plain = [], []
    for q in REFERENCE_QUERIES[:4]:
        t0 = time.monotonic()
        es_search(reader, body(q)).collect()
        es.append(round(time.monotonic() - t0, 3))
        t0 = time.monotonic()
        search(reader, q, k=10, with_text=False).collect()
        plain.append(round(time.monotonic() - t0, 3))
    out["esdsl_sec"] = es
    out["plain_search_sec"] = plain

    # explain: the top hit of each query; verify bit-identity
    ex_times, ex_exact = [], True
    for q in REFERENCE_QUERIES[:4]:
        hit = search(reader, q, k=1, with_text=False).collect()[0]
        t0 = time.monotonic()
        ex = explain(reader, q, hit.doc_id)
        ex_times.append(round(time.monotonic() - t0, 4))
        ex_exact = ex_exact and (ex["score"] == hit.score)
    out["explain_sec"] = ex_times
    out["explain_bit_identical"] = bool(ex_exact)

    # lifecycle: delete ~1/16 of docs, purge via the generation commit
    t0 = time.monotonic()
    n_del = delete_by_query(reader, "doc_id % 16 = 0")
    out["delete_by_query_sec"] = round(time.monotonic() - t0, 2)
    out["n_deleted"] = int(n_del)
    t0 = time.monotonic()
    res = compact_index(spark, idx)  # keep_generations=2
    out["purge_commit_sec"] = round(time.monotonic() - t0, 1)
    out["n_purged"] = int(res.get("n_purged", 0))
    out["generation"] = current_gen(idx)

    fresh = IndexReader(spark, idx)
    t0 = time.monotonic()
    search(fresh, REFERENCE_QUERIES[0], k=10, with_text=False).collect()
    out["post_purge_search_sec"] = round(time.monotonic() - t0, 3)

    # time travel to the retained pre-purge generation
    t0 = time.monotonic()
    old = IndexReader(spark, idx, generation=0)
    rows = search(old, REFERENCE_QUERIES[0], k=10,
                  with_text=False).collect()
    out["time_travel_search_sec"] = round(time.monotonic() - t0, 3)
    out["time_travel_n_docs"] = int(old.stats["n_docs"])
    out["time_travel_rows"] = len(rows)

    t0 = time.monotonic()
    removed = gc_generations(idx, keep=1)
    out["gc_sec"] = round(time.monotonic() - t0, 2)
    out["gc_removed"] = sorted(removed)

    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
