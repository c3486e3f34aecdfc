"""ANN recall-vs-tables curve at dim 768 (VERDICT r3 stretch #8).

The reference's FAISS IndexFlatIP is exact (retrieval/build_faiss.py:17-19,
vector_store.py:146-161); the engine's bucket-partitioned LSH index trades
that exactness for pruned I/O. This publishes the trade: recall@10 of
ann_index_topk vs exact cosine on a planted dim-768 corpus, for
n_tables ∈ {2, 4, 8} (n_planes=8), plus the candidate fraction each
setting actually reads (the I/O prune factor).

Corpus: n_base seeded-gaussian background vectors PLUS, per query, a
planted cluster of 10 noised copies of the query's base vector. In pure
gaussian high-dim data only ONE vector can be near a query — exact
top-10 would be 9 near-orthogonal random vectors no sublinear method
can (or should) find, and recall@10 would measure noise (~0.05,
observed). With a planted 10-cluster the exact top-10 IS the cluster,
so recall@10 measures what an ANN index is for: retrieving genuinely
near vectors. Exact top-10 is computed with numpy over the same vectors
(identical cosine math to brute_force_topk; verified in
tests/test_operators.py).

Usage: python scripts/ann_recall.py [--n-base 10000] [--n-queries 20]
       [--dim 768] [--cores 16] [--out BENCH/ann_recall_dim768.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-base", type=int, default=10_000)
    ap.add_argument("--n-queries", type=int, default=20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--noise", type=float, default=0.35)
    ap.add_argument("--tables", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--planes", type=int, default=8)
    ap.add_argument("--probes", type=int, nargs="+", default=[1])
    ap.add_argument("--out", default=os.path.join(
        REPO, "BENCH", "ann_recall_dim768.json"))
    args = ap.parse_args()

    import pandas as pd

    from research_engine_spark.operators.similarity import (
        ann_candidates,
        ann_index_topk,
        build_ann_index,
    )
    from research_engine_spark.session import get_spark

    rng = np.random.default_rng(7)
    bg = rng.standard_normal((args.n_base, args.dim))
    bases = rng.standard_normal((args.n_queries, args.dim))
    planted = np.concatenate([
        b[None, :] + args.noise * rng.standard_normal((10, args.dim))
        for b in bases])                       # 10 cluster members / query
    X = np.concatenate([bg, planted])
    Q = bases + args.noise * rng.standard_normal(
        (args.n_queries, args.dim))
    n_total = X.shape[0]

    # exact cosine top-10 per query (numpy twin of brute_force_topk:
    # same scores, same (cosine desc, id asc) tiebreak)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    cos = Qn @ Xn.T                                   # (n_queries, n_total)
    exact_top = []
    for i in range(args.n_queries):
        order = np.lexsort((np.arange(n_total), -cos[i]))
        exact_top.append(set(order[:10].tolist()))

    spark = get_spark(app_name="ann_recall", cores=args.cores,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(n_total, dtype=np.int64),
        "embedding": [r.astype(np.float32).tolist() for r in X],
    }))

    # (n_tables, n_probes) grid: n_probes=1 reproduces the r4 curve;
    # n_probes>1 is multiprobe LSH (VERDICT r4 #8 stretch) — neighboring
    # buckets by smallest flip margin, recall bought with bucket READS
    # instead of extra index COPIES (each table duplicates the vectors).
    grid = [(t, p) for t in args.tables for p in args.probes]
    curve = []
    for n_tables in sorted({t for t, _ in grid}):
        d = tempfile.mkdtemp(prefix=f"ann_recall_t{n_tables}_")
        build_ann_index(emb, d, n_planes=args.planes,
                        n_tables=n_tables, seed=42)
        for _, n_probes in [g for g in grid if g[0] == n_tables]:
            hits, cand_frac = 0, []
            for i in range(args.n_queries):
                qvec = [float(v) for v in Q[i]]
                got = {int(r["vec_id"]) for r in
                       ann_index_topk(spark, d, qvec, k=10,
                                      n_probes=n_probes).collect()}
                hits += len(got & exact_top[i])
                cand_frac.append(
                    ann_candidates(spark, d, qvec,
                                   n_probes=n_probes).count() / n_total)
            curve.append({
                "n_tables": n_tables, "n_planes": args.planes,
                "n_probes": n_probes,
                "recall_at_10": round(hits / (10 * args.n_queries), 4),
                "mean_candidate_fraction": round(
                    float(np.mean(cand_frac)), 4),
            })
            print(json.dumps(curve[-1]), file=sys.stderr, flush=True)
        shutil.rmtree(d, ignore_errors=True)

    payload = {"dim": args.dim, "n_base": args.n_base,
               "n_total": int(n_total),
               "n_queries": args.n_queries, "noise": args.noise,
               "curve": curve}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
