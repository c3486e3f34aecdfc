"""Generate an sf1-equivalent, ≥1M-document test-table directory for the
full 57-query correctness sweep (VERDICT r4 next-round #1: every
hash-green row so far ran at ≤116k turns; broadcast thresholds, block-
metadata budgets, fuzzy candidate volume, and the nested-agg groupBy
only crack at larger data).

Everything is synthesised deterministically — no external data:

- TPC-H-ish tables (customer/supplier/part/orders/lineitem/events) are
  the driver's sf0.1 tables tiled x`--tile` with key-stride offsets that
  preserve referential integrity (o_custkey references the tiled
  customer keys, l_orderkey the tiled orders, etc.). region/nation are
  copied (nationkeys stay shared across tiles, like TPC-H itself).
- documents is generated FRESH at `--n-docs` rows (default 1.2M — the
  ">=1M-turn corpus": the engine_* sweep family builds its index over
  this table, so this is the index scale) from one seeded PCG64 stream
  over the same Zipf vocabulary as corpus._build_vocab (query terms
  pinned hot, so the sweep's search queries match). Planted structure:
  exact-duplicate pairs every `--dup-every` docs (exact_dedup), near-dup
  pairs every `--near-every` docs (one token swapped -> ngram-Jaccard
  >= 0.2 edges for the pair + cluster queries), and near-dups INSIDE
  doc_id<100 / doc_id<40 so the capped simhash/minhash queries stay
  non-trivial.
- embeddings: seeded gaussian float32 at dim 64 (matches the persisted
  ANN plane fixture), `--n-vecs` rows.

Each table is ONE parquet file named {table}.parquet (the sweep
harness's DuckDB views read single files).

Usage: python scripts/gen_bigsf.py [--out /dev/shm/bigsf/sf1big]
         [--n-docs 1200000] [--tile 10] [--n-vecs 20000] [--seed 42]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"

# (table, {column: stride-source-table}) — stride = max(key)+1 of the
# SOURCE table so tiled foreign keys keep pointing inside the tiled
# parent.
TILED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": None},  # user stride below
}
COPIED = ["region", "nation"]


def _tile_table(name: str, key_cols: dict, tile: int,
                strides: dict, out_dir: str) -> int:
    tbl = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    parts = []
    for t in range(tile):
        cols = {}
        for c in tbl.column_names:
            arr = tbl.column(c)
            if c in key_cols:
                stride = strides[name][c]
                cols[c] = pa.chunked_array([
                    pa.compute.add(ch, t * stride) for ch in arr.chunks])
            else:
                cols[c] = arr
        parts.append(pa.table(cols, schema=tbl.schema))
    big = pa.concat_tables(parts)
    pq.write_table(big, os.path.join(out_dir, f"{name}.parquet"))
    return big.num_rows


# the driver's documents tables draw from this 31-word engine-flavored
# vocabulary (profiled from /root/testdata/sf0.1/documents.parquet) —
# every search term the sweep's documents-family queries use ("spark
# join shuffle", "merge stream", wildcard/term-filter literals) lives
# here, so it must sit at the Zipf HEAD of the scaled corpus too
ENGINE_WORDS = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch", "dup",
]


def gen_documents(n_docs: int, seed: int, dup_every: int,
                  near_every: int) -> pa.Table:
    from research_engine_spark.corpus import _build_vocab, _zipf_probs

    vocab_size = 30_000
    # engine words first (hot ranks -> realistic 10^5-class dfs at 1.2M
    # docs), then the transcript vocab's fillers/query terms, then the
    # synthetic tail — the tail keeps 3-gram shingles diverse so the
    # near-dup pair queries measure the PLANTED structure, not a
    # tiny-vocab shingle soup
    base = _build_vocab(vocab_size).tolist()
    vocab = np.array(
        ENGINE_WORDS + [w for w in base if w not in set(ENGINE_WORDS)],
        dtype=object)[:vocab_size]
    probs = _zipf_probs(len(vocab))
    rng = np.random.default_rng(np.random.SeedSequence([seed, 77]))
    lens = rng.integers(8, 100, size=n_docs)
    total = int(lens.sum())
    toks = rng.choice(len(vocab), size=total, p=probs)
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    vlist = vocab.tolist()
    texts = [" ".join(vlist[t] for t in toks[offs[i]:offs[i + 1]])
             for i in range(n_docs)]
    # planted structure (applied AFTER base generation so the base draw
    # stays one deterministic stream):
    # - exact duplicates: doc i+1 := doc i at every dup_every boundary
    # - near-duplicates: doc i+1 := doc i with ONE token replaced at
    #   every near_every boundary (>=0.2 3-gram Jaccard for len>=8)
    for i in range(0, n_docs - 1, dup_every):
        texts[i + 1] = texts[i]
    for i in range(near_every // 2, n_docs - 1, near_every):
        if i % dup_every == 0:
            continue
        w = texts[i].split()
        w[len(w) // 2] = "zznear"
        texts[i + 1] = " ".join(w)
    # capped-query structure: near-dups inside doc_id<100 (simhash) and
    # an exact pair inside doc_id<40 (minhash)
    texts[11] = texts[10]
    w = texts[20].split()
    w[0] = "zznear"
    texts[21] = " ".join(w)
    texts[51] = texts[50]
    langs = np.array(["en", "zh", "es", "fr", "de"], dtype=object)
    lang_idx = rng.choice(5, size=n_docs, p=[0.41, 0.15, 0.15, 0.15, 0.14])
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs[lang_idx], type=pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)],
                           type=pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64)),
    })


def gen_embeddings(n_vecs: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(np.random.SeedSequence([seed, 88]))
    X = rng.standard_normal((n_vecs, 64)).astype(np.float32)
    # plant near neighbours of vec 0 (the sweep queries' query vector)
    for j in range(1, 6):
        X[j * 7] = X[0] + 0.1 * rng.standard_normal(64).astype(np.float32)
    flat = pa.array(X.reshape(-1), type=pa.float32())
    emb = pa.FixedSizeListArray.from_arrays(flat, 64).cast(
        pa.list_(pa.float32()))
    return pa.table({
        "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
        "embedding": emb,
        "label": pa.array(rng.integers(0, 10, n_vecs).astype(np.int32)),
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/dev/shm/bigsf/sf1big")
    ap.add_argument("--n-docs", type=int, default=1_200_000)
    ap.add_argument("--tile", type=int, default=10)
    ap.add_argument("--n-vecs", type=int, default=20_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--dup-every", type=int, default=100_000)
    ap.add_argument("--near-every", type=int, default=2_000)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    pk = {"customer": "c_custkey", "supplier": "s_suppkey",
          "part": "p_partkey", "orders": "o_orderkey",
          "events": "event_id"}

    def _stride(src_table: str, col: str) -> int:
        t = pq.read_table(os.path.join(SRC, f"{src_table}.parquet"),
                          columns=[col])
        return int(pa.compute.max(t.column(0)).as_py()) + 1

    strides: dict[str, dict] = {
        name: {col: _stride(src, pk[src])
               for col, src in keys.items() if src is not None}
        for name, keys in TILED.items()
    }
    # events.user_id: stride by max(user_id)+1 of the source events table
    strides["events"]["user_id"] = _stride("events", "user_id")

    for name in COPIED:
        pq.write_table(pq.read_table(os.path.join(SRC, f"{name}.parquet")),
                       os.path.join(args.out, f"{name}.parquet"))
        print(f"{name}: copied", file=sys.stderr, flush=True)
    for name, keys in TILED.items():
        n = _tile_table(name, keys, args.tile, strides, args.out)
        print(f"{name}: {n} rows", file=sys.stderr, flush=True)

    docs = gen_documents(args.n_docs, args.seed, args.dup_every,
                         args.near_every)
    pq.write_table(docs, os.path.join(args.out, "documents.parquet"))
    print(f"documents: {docs.num_rows} rows", file=sys.stderr, flush=True)
    emb = gen_embeddings(args.n_vecs, args.seed)
    pq.write_table(emb, os.path.join(args.out, "embeddings.parquet"))
    print(f"embeddings: {emb.num_rows} rows", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
