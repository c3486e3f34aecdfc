"""Production index-build job for spark-submit.

    spark-submit --master <cluster> --py-files pkg.zip \
        scripts/build_index_job.py \
        --input /path/to/transcripts_parquet --output /path/to/index \
        [--n-buckets 512] [--positions] [--resume] [--k1 1.2] [--b 0.75] \
        [--max-group-postings 500000]

On a real cluster set --n-buckets to ~2-4x total executor count and
spark.sql.shuffle.partitions to 2-3x total cores via --conf. The job is
resumable: rerun with --resume after a failure and only missing term
buckets are rebuilt (manifest checkpoint).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--positions", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--max-group-postings", type=int, default=500_000)
    args = ap.parse_args()

    spark = (SparkSession.builder.appName("research_engine_build")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from research_engine_spark.operators.indexer import (
        build_index, resume_index)
    from research_engine_spark.sources.io import read_transcripts

    tx = read_transcripts(spark, args.input)
    fn = resume_index if args.resume else build_index
    stats = fn(tx, args.output, k1=args.k1, b=args.b,
               n_buckets=args.n_buckets,
               max_group_postings=args.max_group_postings,
               with_positions=args.positions)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
