"""Big-corpus evidence for the block-max-gated driver-local serving tier
(VERDICT r4 #3): at 7M turns no reference query fits the flat Σ df
budget (BENCH/serving_7m_r4.json: n_local = 0, every interactive query
paid the distributed path), but the skyline prune's kept-block decode is
corpus-size-free for single/common-term top-k — those queries must now
serve driver-locally (zero Spark jobs) at any corpus size.

For each query class (multi-term reference set; single-term common
terms) this measures, on a freshly built bursty 7M-turn index with
DEFAULT reader budgets:
  - the serving dispatch outcome (path, θ, blocks kept/total, decode
    postings) and wall time (min of 2 passes),
  - a statusTracker zero-job probe for every query that served locally,
  - bit-identity of every query against the distributed-pinned reader.

Usage: python scripts/serving_blockmax_job.py [n_convs] [cores]
                                              [burstiness] [out_json]
Prints one JSON line and writes it to out_json
(default BENCH/serving_blockmax_7m_r5.json).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    burstiness = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    out_path = (sys.argv[4] if len(sys.argv) > 4
                else os.path.join(REPO, "BENCH",
                                  "serving_blockmax_7m_r5.json"))
    os.environ.setdefault("TMPDIR", "/dev/shm/bench/tmp")
    os.makedirs(os.environ["TMPDIR"], exist_ok=True)

    import numpy as np

    from research_engine_spark.corpus import synth_transcripts
    from research_engine_spark.operators.indexer import build_index
    from research_engine_spark.operators.scorer import IndexReader, search
    from research_engine_spark.reference_queries import REFERENCE_QUERIES
    from research_engine_spark.session import get_spark

    spark = get_spark(app_name="serving_blockmax", cores=cores,
                      shuffle_partitions=max(cores * 4, 32),
                      extra_conf={"spark.ui.showConsoleProgress": "false",
                                  "spark.local.dir": os.environ["TMPDIR"]})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    idx = tempfile.mkdtemp(prefix="srvbm_idx_", dir=os.environ["TMPDIR"])
    tx = synth_transcripts(spark, n_convs=n_convs, seed=11,
                           burstiness=burstiness)
    t0 = time.monotonic()
    st = build_index(tx, idx, n_buckets=32)
    build_sec = round(time.monotonic() - t0, 1)

    serving = IndexReader(spark, idx)  # DEFAULT budgets
    dist = IndexReader(spark, idx, driver_local_max_postings=0,
                       driver_local_max_vocab=0)
    search(serving, "architecture", k=1, with_text=False).collect()  # warm

    single_terms = ["neural", "attention", "learning", "architecture",
                    "language", "data"]
    queries = {f"ref_q{i+1:02d}": q for i, q in enumerate(REFERENCE_QUERIES)}
    queries.update({f"single_q{i+1:02d}": q
                    for i, q in enumerate(single_terms)})

    per_query: dict[str, dict] = {}
    n_local = 0
    for name, q in queries.items():
        stats: dict = {}
        best = float("inf")
        rows = None
        for _ in range(2):
            stats = {}
            t0 = time.monotonic()
            rows = search(serving, q, k=10, with_text=False,
                          prune_stats=stats).collect()
            best = min(best, time.monotonic() - t0)
        local = str(stats.get("path", "")).startswith("driver_local")
        zero_jobs = None
        if local:
            sc.setJobGroup(f"probe_{name}", "probe")
            try:
                search(serving, q, k=10, with_text=False).collect()
                zero_jobs = (list(sc.statusTracker()
                                  .getJobIdsForGroup(f"probe_{name}")) == [])
            finally:
                sc.setJobGroup(None, None)
            n_local += 1
        t0 = time.monotonic()
        drows = search(dist, q, k=10, with_text=False,
                       prune=False).collect()
        dist_sec = time.monotonic() - t0
        identical = ([r["doc_id"] for r in rows]
                     == [r["doc_id"] for r in drows]
                     and bool(np.allclose([r["score"] for r in rows],
                                          [r["score"] for r in drows],
                                          rtol=0, atol=0)))
        per_query[name] = {
            "serving_sec": round(best, 3),
            "dist_sec": round(dist_sec, 3),
            "path": stats.get("path"),
            "n_blocks": stats.get("n_blocks"),
            "n_keep": stats.get("n_keep"),
            "kept_postings": stats.get("blockmax_kept_postings"),
            "rescore_postings": stats.get("blockmax_rescore_postings"),
            "n_candidates": stats.get("n_candidates"),
            "local": local,
            "zero_jobs": zero_jobs,
            "identical": identical,
        }

    out = {
        "n_turns": int(st["n_docs"]),
        "cores": cores,
        "burstiness": burstiness,
        "build_sec": build_sec,
        "n_local": n_local,
        "n_queries": len(queries),
        "all_identical": all(v["identical"] for v in per_query.values()),
        "per_query": per_query,
    }
    line = json.dumps(out)
    print(line)
    with open(out_path, "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
