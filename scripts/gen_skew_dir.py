"""Skewed-vocabulary correctness corpus (VERDICT r5 next-round #2).

Clones an sf test-table dir, planting " hotterm hotterm" into a
deterministic ~25% of documents (crc32(doc_id) bucket — partitioning-
independent), so the FULL 111-query sweep runs under a hot vocabulary:
the shape where fuzzy/suggester expansion volume, significant_terms
backgrounds, rare_terms tails, and the build's salted-merge paths
would first diverge from the oracle. The DuckDB oracle recomputes from
the same parquet, so `scripts/correctness_sf.py --sf-dir <out>` is a
complete value-checked sweep on the skewed corpus.

Result (r6): CORRECTNESS_skew.json — 111/111 hash-green.

Usage: python scripts/gen_skew_dir.py [--src /root/testdata/sf0.01]
         [--out /dev/shm/skew_sf0.01] [--hot-pct 25]
"""

from __future__ import annotations

import argparse
import os
import shutil
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/dev/shm/skew_sf0.01")
    ap.add_argument("--hot-pct", type=int, default=25)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for t in TABLES:
        shutil.copy(f"{args.src}/{t}.parquet", f"{args.out}/{t}.parquet")
    tbl = pq.read_table(f"{args.src}/documents.parquet")
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    hot = [zlib.crc32(str(i).encode()) % 100 < args.hot_pct for i in ids]
    new_texts = [(t + " hotterm hotterm") if h else t
                 for h, t in zip(hot, texts)]
    cols = {name: tbl.column(name) for name in tbl.column_names}
    cols["text"] = pa.array(new_texts, type=tbl.schema.field("text").type)
    pq.write_table(pa.table(cols, schema=tbl.schema),
                   f"{args.out}/documents.parquet")
    print(f"{args.out}: {sum(hot)}/{len(ids)} docs carry hotterm")


if __name__ == "__main__":
    main()
