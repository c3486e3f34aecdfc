"""Before/after evidence for IndexReader.cache_postings() on the 7M-turn
corpus (VERDICT r3 #7): the interactive query mean at few cores is
dominated by re-scanning + re-decoding the postings parquet per query;
pinning the scan trades that for an InMemoryTableScan over Spark's own
columnar batches.

Run pinned, like a scaling leg (same contention posture as
scripts/scaling_bench.py):

    taskset -c 0-3 spark-submit --master local[4] \
        --conf spark.local.dir=/dev/shm/bench/tmp \
        --py-files BENCH/pkg.zip scripts/query_cache_job.py <index_dir>

Prints one JSON line: uncached/cached per-query latencies (2 passes
each; min per query), means, and a rank-identity bit (cached results
must equal uncached exactly, doc ids AND scores).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    index_dir = sys.argv[1]
    spark = (SparkSession.builder.appName("query_cache_job")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from research_engine_spark.operators.scorer import IndexReader, search
    from research_engine_spark.reference_queries import REFERENCE_QUERIES

    reader = IndexReader(spark, index_dir)
    search(reader, "architecture", k=1, with_text=False).collect()  # warm

    def one_pass(tag: str) -> dict[str, float]:
        out = {}
        for i, q in enumerate(REFERENCE_QUERIES):
            t0 = time.monotonic()
            search(reader, q, k=10, with_text=False, prune=False).collect()
            out[f"{tag}_q{i+1:02d}"] = round(time.monotonic() - t0, 3)
        return out

    def min_of(passes: list[dict]) -> dict[str, float]:
        return {k: min(p[k] for p in passes) for k in passes[0]}

    plain = min_of([one_pass("plain"), one_pass("plain")])
    plain_rows = [
        [tuple(r) for r in search(reader, q, k=10, with_text=False,
                                  prune=False).collect()]
        for q in REFERENCE_QUERIES]

    t0 = time.monotonic()
    reader.cache_postings(eager=True)
    fill_sec = round(time.monotonic() - t0, 3)
    cached = min_of([one_pass("cached"), one_pass("cached")])
    cached_rows = [
        [tuple(r) for r in search(reader, q, k=10, with_text=False,
                                  prune=False).collect()]
        for q in REFERENCE_QUERIES]
    reader.uncache()

    mean = lambda d: round(sum(d.values()) / len(d), 3)  # noqa: E731
    print(json.dumps({
        "index_dir": index_dir,
        "n_docs": reader.stats["n_docs"],
        "cores": spark.sparkContext.defaultParallelism,
        "cache_fill_sec": fill_sec,
        "plain_mean_sec": mean(plain),
        "cached_mean_sec": mean(cached),
        "rank_identical": plain_rows == cached_rows,
        "queries": {**plain, **cached},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
