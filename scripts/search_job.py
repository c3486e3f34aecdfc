"""Query CLI — the native analog of the reference's es_search_final.py
search CLI (which prints top-k hits with scores for a query list).

    spark-submit --py-files pkg.zip scripts/search_job.py \
        --index /path/to/index "neural networks" "machine learning" \
        [--k 10] [--k1 1.2] [--b 0.75] [--prune] [--phrase] [--json]
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--k1", type=float, default=None)
    ap.add_argument("--b", type=float, default=None)
    ap.add_argument("--prune", action="store_true")
    ap.add_argument("--phrase", action="store_true")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    spark = (SparkSession.builder.appName("research_engine_search")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from research_engine_spark.operators.scorer import (
        IndexReader, phrase_search, search)

    reader = IndexReader(spark, args.index)
    for q in args.queries:
        if args.phrase:
            hits = phrase_search(reader, q, k=args.k, k1=args.k1, b=args.b,
                                 with_text=True)
        else:
            hits = search(reader, q, k=args.k, k1=args.k1, b=args.b,
                          prune=args.prune, with_text=True)
        rows = hits.collect()
        if args.json:
            print(json.dumps({
                "query": q,
                "hits": [{"doc_id": r["doc_id"], "score": r["score"],
                          "conv_id": r["conv_id"], "turn_idx": r["turn_idx"]}
                         for r in rows],
            }))
        else:
            print(f"\n=== {q!r} (top {args.k}) ===")
            for i, r in enumerate(rows, 1):
                text = (r["text"] or "")[:100].replace("\n", " ")
                print(f"{i:2d}. {r['score']:.4f}  "
                      f"{r['conv_id']}:{r['turn_idx']}  {text}")
    spark.stop()


if __name__ == "__main__":
    main()
