"""Skewed-corpus scaling legs (VERDICT r4 next-round #4): the published
0.897 N-vs-4N efficiency was measured on the standard synthetic corpus;
the index build's salting machinery (run-granular salts,
max_group_postings splits) had never been *scaling-measured* under a
deliberately hot vocabulary. This runs the same pinned interleaved
1-vs-4-core pair as scripts/scaling_bench.py on a corpus where ONE term
("hotterm") is planted in >=20% of all turns — the df skew that would
serialize a naive groupBy(term) build on the hot key.

Legs append to BENCH/legs_r5_skew.jsonl (all raw legs, best-per-core
kept for the efficiency number; narrative goes to BENCH/BASELINE.md by
hand).

Usage: python scripts/scaling_skew.py [n_convs] [N] [hot_frac]
       (defaults 1_200_000 convs ~ 7M turns, N=1 -> 1 vs 4 cores,
        hot term planted in 25% of turns)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scaling_bench import make_pkg_zip, run_leg  # noqa: E402


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    hot_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    shuffle = 128
    pkg_zip = os.path.join(REPO, "BENCH", "pkg.zip")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    make_pkg_zip(pkg_zip)

    # One shared skewed corpus on tmpfs: the standard deterministic
    # transcripts PLUS "hotterm" appended to a deterministic hot_frac of
    # turns (crc32-bucketed, partitioning-independent) — hot term df
    # = hot_frac * N >= the >=20%-of-N bar.
    src = f"/dev/shm/bench/scaling_corpus_skew_{n_convs}_{hot_frac}"
    if not os.path.exists(src):
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "from pyspark.sql import functions as F\n"
            "from research_engine_spark.session import get_spark\n"
            "from research_engine_spark.corpus import synth_transcripts\n"
            "spark = get_spark(cores=32, extra_conf={"
            "'spark.ui.showConsoleProgress': 'false'})\n"
            "tx = synth_transcripts(spark, n_convs=%d, seed=42, "
            "n_partitions=128)\n"
            "tx = tx.withColumn('text', F.when("
            "(F.crc32(F.concat(F.col('conv_id'), F.lit(':'), "
            "F.col('turn_idx').cast('string'))) %% 100) < %d, "
            "F.concat(F.col('text'), F.lit(' hotterm')))"
            ".otherwise(F.col('text')))\n"
            "tx.write.mode('overwrite').parquet(%r)\n"
            "spark.stop()\n"
        ) % (REPO, n_convs, int(hot_frac * 100), src)
        gen = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=1800)
        if gen.returncode != 0:
            raise RuntimeError(f"corpus gen failed:\n{gen.stderr[-2000:]}")

    legs_path = os.path.join(REPO, "BENCH", "legs_r5_skew.jsonl")
    legs: dict[int, dict] = {}
    for cores in (n, 4 * n, n, 4 * n, n, 4 * n):
        res = run_leg(cores, n_convs, pkg_zip, shuffle, src=src)
        res["skew_hot_frac"] = hot_frac
        print(json.dumps(res), flush=True)
        with open(legs_path, "a") as f:
            f.write(json.dumps(res) + "\n")
        if (cores not in legs
                or res["turns_per_sec"] > legs[cores]["turns_per_sec"]):
            legs[cores] = res

    eff = (legs[4 * n]["turns_per_sec"]
           / (4 * legs[n]["turns_per_sec"]))
    print(json.dumps({"skew_hot_frac": hot_frac,
                      "best": {c: legs[c]["turns_per_sec"] for c in legs},
                      "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
