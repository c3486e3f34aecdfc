"""Measure the block-max pruned path against the plain scan on a large
(multi-million-turn) index — the crossover evidence the small-SF bench
cannot give (there, per-job overhead dominates and pruning always loses).

Usage: python scripts/prune_crossover.py [corpus_parquet] [cores]
Prints one JSON line: per-query unpruned/pruned seconds + means.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else \
        "/dev/shm/bench/scaling_corpus_1200000"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    os.environ.setdefault("TMPDIR", "/dev/shm/bench/tmp")
    os.makedirs(os.environ["TMPDIR"], exist_ok=True)

    from research_engine_spark.operators.indexer import build_index
    from research_engine_spark.operators.scorer import IndexReader, search
    from research_engine_spark.reference_queries import REFERENCE_QUERIES
    from research_engine_spark.session import get_spark

    spark = get_spark(app_name="prune_crossover", cores=cores,
                      shuffle_partitions=128,
                      extra_conf={"spark.ui.showConsoleProgress": "false",
                                  "spark.local.dir": os.environ["TMPDIR"]})
    tx = spark.read.parquet(corpus)
    idx = tempfile.mkdtemp(prefix="crossover_idx_")
    stats = build_index(tx, idx, n_buckets=64, n_partitions=128)
    reader = IndexReader(spark, idx)

    out = {"n_turns": stats["n_docs"], "cores": cores, "queries": {}}
    for mode, prune in (("plain", False), ("pruned", True)):
        # warmup once so JIT/broadcast costs don't bias the first mode
        search(reader, REFERENCE_QUERIES[0], k=10, with_text=False,
               prune=prune).collect()
        total = 0.0
        for i, q in enumerate(REFERENCE_QUERIES):
            t0 = time.monotonic()
            search(reader, q, k=10, with_text=False, prune=prune).collect()
            dt = time.monotonic() - t0
            out["queries"][f"{mode}_q{i+1:02d}"] = round(dt, 3)
            total += dt
        out[f"{mode}_mean_sec"] = round(total / len(REFERENCE_QUERIES), 3)
    print(json.dumps(out))
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
