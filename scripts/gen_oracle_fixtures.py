"""Generate the deterministic oracle fixtures (VERDICT r3 #3).

The three rows-only correctness entries (lsh_ann_topk, ann_index_topk,
simhash_near_pairs) were unverifiable only because their LSH hyperplanes
are seeded-numpy draws DuckDB cannot reproduce. This script PERSISTS the
exact planes the engine draws — `_table_planes(default_rng(42), 4, 8,
dim)`, mirroring the reference's random-projection trade-off against
retrieval/build_faiss.py:17-19's IndexFlatIP exactness — as a parquet
fixture, so the DuckDB twin recomputes bucket membership relationally
(sign = list_dot_product(v, plane) >= 0, bucket = bit-weighted sum) from
the same numbers.

Deterministic by construction (seeded rng, no wall-clock); safe to re-run
— output is content-identical. Committed under fixtures/ so the driver's
oracle runs need no generation step. SimHash needs NO fixture: its token
hash is the first 8 bytes of md5, which DuckDB computes natively.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from research_engine_spark.operators.similarity import _table_planes  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")

# the (seed, n_tables, n_planes) the registered queries use; dim matches
# /root/testdata/sf*/embeddings.parquet (64 at every sf)
SEED, N_TABLES, N_PLANES, DIM = 42, 4, 8, 64


def main() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rng = np.random.default_rng(SEED)
    planes_list = _table_planes(rng, N_TABLES, N_PLANES, DIM)
    tbl_col, plane_col, vec_col = [], [], []
    for t, planes in enumerate(planes_list):
        for p in range(planes.shape[0]):
            tbl_col.append(t)
            plane_col.append(p)
            vec_col.append(planes[p].astype(np.float64).tolist())
    out = pa.table({
        "tbl": pa.array(tbl_col, type=pa.int32()),
        "plane": pa.array(plane_col, type=pa.int32()),
        "vec": pa.array(vec_col, type=pa.list_(pa.float64())),
    })
    path = os.path.join(FIXTURE_DIR, f"ann_planes_d{DIM}.parquet")
    pq.write_table(out, path)
    print(f"wrote {path}: {out.num_rows} planes "
          f"({N_TABLES} tables x {N_PLANES})")


if __name__ == "__main__":
    main()
