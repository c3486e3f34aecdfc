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


def write_transcript_fixture() -> None:
    """VERDICT r4 #2: the last rows-only driver row
    (transcript_bm25_engine) was unverifiable only because its corpus is
    a seeded-numpy draw DuckDB cannot reproduce. Persist that corpus —
    transcripts_pandas(30, 42), byte-identical to the query's
    synth_transcripts input — plus its analyzed (doc_id, term) token
    rows (english_folded: tokenize → lowercase → porter, the part SQL
    cannot express; the analyzer itself is pytest-verified against 96
    published-vector porter cases). The DuckDB twin then recomputes
    df/tf/dl/avgdl/idf and the full BM25 top-k relationally from these
    files — verifying the ENGINE (SPIMI pack, codec, stats, fold, top-k)
    end-to-end under the reference-faithful analyzer."""
    from research_engine_spark.corpus import transcripts_pandas
    from research_engine_spark.functions.analyzer import (analyze,
                                                          analyze_query)
    from research_engine_spark.functions.porter import CachedStemmer

    pdf = transcripts_pandas(30, 42)
    pdf = pdf.sort_values(["conv_id", "turn_idx"],
                          kind="mergesort").reset_index(drop=True)
    corpus_path = os.path.join(FIXTURE_DIR, "transcripts_c30_s42.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   corpus_path)
    stemmer = CachedStemmer()
    ids, terms = [], []
    for i, t in enumerate(pdf["text"].fillna("")):
        for term in analyze(t, stemmer):
            ids.append(i)
            terms.append(term)
    tokens_path = os.path.join(FIXTURE_DIR,
                               "transcripts_c30_s42_tokens.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "term": pa.array(terms, type=pa.string()),
    }), tokens_path)
    print(f"wrote {corpus_path}: {len(pdf)} turns")
    print(f"wrote {tokens_path}: {len(ids)} tokens")
    print("analyzed query 'neural networks' ->",
          analyze_query("neural networks"))


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
    write_transcript_fixture()


if __name__ == "__main__":
    main()
