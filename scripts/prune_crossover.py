"""Measure the block-max pruned path against the plain scan — the
crossover evidence the small-SF bench cannot give (there, per-job
overhead dominates and θ can't prune a tf-uniform corpus).

Two ingredients make pruning winnable (r2 VERDICT #1):
1. the gate + θ are now driver-side (pyarrow block metadata), so a
   fallback costs ZERO extra Spark jobs and a prune decision costs no
   full-payload pass;
2. the corpus must have real per-document tf burstiness (Church & Gale)
   — iid-Zipf text gives every 128-posting block the same max_tf, so no
   exact skip bound can ever exclude one. ``--burstiness`` (default 0.3)
   turns on the topic-repeat mechanism in the synthesizer.

Usage: python scripts/prune_crossover.py [n_convs] [cores] [burstiness]
                                         [corpus_parquet]
Prints one JSON line: per-query plain/pruned seconds and means for two
query classes (multi-term reference set, single-term), plus the prune
decision stats (theta, blocks kept/total, candidates) per query.
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
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    burstiness = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    os.environ.setdefault("TMPDIR", "/dev/shm/bench/tmp")
    os.makedirs(os.environ["TMPDIR"], exist_ok=True)

    from research_engine_spark.corpus import synth_transcripts
    from research_engine_spark.operators.indexer import build_index
    from research_engine_spark.operators.scorer import IndexReader, search
    from research_engine_spark.reference_queries import REFERENCE_QUERIES
    from research_engine_spark.session import get_spark

    spark = get_spark(app_name="prune_crossover", cores=cores,
                      shuffle_partitions=max(cores * 4, 32),
                      extra_conf={"spark.ui.showConsoleProgress": "false",
                                  "spark.local.dir": os.environ["TMPDIR"]})
    keep_src = len(sys.argv) > 4
    if keep_src:
        src = sys.argv[4]
    else:
        src = tempfile.mkdtemp(prefix="crossover_src_")
        synth_transcripts(spark, n_convs=n_convs, seed=42,
                          n_partitions=max(cores * 2, 16),
                          burstiness=burstiness).write.mode(
                              "overwrite").parquet(src)
    tx = spark.read.parquet(src)
    idx = tempfile.mkdtemp(prefix="crossover_idx_")
    stats = build_index(tx, idx, n_buckets=64,
                        n_partitions=max(cores * 4, 32))
    reader = IndexReader(spark, idx)

    # two query classes: the multi-term reference set (θ rarely beats the
    # sum of the other terms' bounds -> expected fallback at zero extra
    # jobs) and single-term queries (one clause -> exact skyline bounds
    # prune hard; the class where block-max machinery pays rent)
    single_terms = ["neural", "attention", "learning", "architecture",
                    "transformer", "healthcare"]
    # rare ∧ common: the doc-range-aligned phase-A bound prunes the
    # common term's blocks wherever the rare term is absent (the classic
    # selective-conjunction BMW win); tail-vocab synthetics are the
    # corpus's rare terms
    selective = ["term03900 learning", "term03500 neural",
                 "term03899 attention", "term03499 architecture"]
    out = {"n_turns": stats["n_docs"], "cores": cores,
           "burstiness": burstiness, "queries": {}, "prune_stats": {}}
    for cls, qset in (("ref", list(REFERENCE_QUERIES)),
                      ("single", single_terms),
                      ("selective", selective)):
        for mode, prune in (("plain", False), ("pruned", True)):
            # warmup once so JIT/broadcast costs don't bias the first mode
            search(reader, qset[0], k=10, with_text=False,
                   prune=prune).collect()
            total = 0.0
            for i, q in enumerate(qset):
                ps: dict = {}
                t0 = time.monotonic()
                search(reader, q, k=10, with_text=False, prune=prune,
                       prune_stats=ps if prune else None).collect()
                dt = time.monotonic() - t0
                out["queries"][f"{cls}_{mode}_q{i+1:02d}"] = round(dt, 3)
                total += dt
                if prune:
                    if "theta" in ps:
                        t = float(ps["theta"])
                        ps["theta"] = round(t, 4) if abs(t) != float(
                            "inf") else None
                    out["prune_stats"][f"{cls}_q{i+1:02d}"] = ps
            out[f"{cls}_{mode}_mean_sec"] = round(total / len(qset), 3)
    print(json.dumps(out))
    shutil.rmtree(idx, ignore_errors=True)
    if not keep_src:
        shutil.rmtree(src, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
