"""ANN recall-vs-tables curve at dim 768 (VERDICT r3 stretch #8).

The reference's FAISS IndexFlatIP is exact (retrieval/build_faiss.py:17-19,
vector_store.py:146-161); the engine's bucket-partitioned LSH index trades
that exactness for pruned I/O. This publishes the trade: recall@10 of
ann_index_topk vs exact cosine on a planted dim-768 corpus, for
n_tables ∈ {2, 4, 8} (n_planes=8), plus the candidate fraction each
setting actually reads (the I/O prune factor).

Corpus: n_base seeded-gaussian vectors; every query is a noised copy of a
corpus vector (so true near neighbors exist — recall over pure-random
queries would measure noise). Exact top-10 is computed with numpy over
the same vectors (identical cosine math to brute_force_topk; verified in
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
    X = rng.standard_normal((args.n_base, args.dim))
    q_src = rng.choice(args.n_base, size=args.n_queries, replace=False)
    Q = X[q_src] + args.noise * rng.standard_normal(
        (args.n_queries, args.dim))

    # exact cosine top-10 per query (numpy twin of brute_force_topk:
    # same scores, same (cosine desc, id asc) tiebreak)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    cos = Qn @ Xn.T                                   # (n_queries, n_base)
    exact_top = []
    for i in range(args.n_queries):
        order = np.lexsort((np.arange(args.n_base), -cos[i]))
        exact_top.append(set(order[:10].tolist()))

    spark = get_spark(app_name="ann_recall", cores=args.cores,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(args.n_base, dtype=np.int64),
        "embedding": [r.astype(np.float32).tolist() for r in X],
    }))

    curve = []
    for n_tables in (2, 4, 8):
        d = tempfile.mkdtemp(prefix=f"ann_recall_t{n_tables}_")
        build_ann_index(emb, d, n_planes=8, n_tables=n_tables, seed=42)
        hits, cand_frac = 0, []
        for i in range(args.n_queries):
            qvec = [float(v) for v in Q[i]]
            got = {int(r["vec_id"]) for r in
                   ann_index_topk(spark, d, qvec, k=10).collect()}
            hits += len(got & exact_top[i])
            cand_frac.append(
                ann_candidates(spark, d, qvec).count() / args.n_base)
        curve.append({
            "n_tables": n_tables, "n_planes": 8,
            "recall_at_10": round(hits / (10 * args.n_queries), 4),
            "mean_candidate_fraction": round(
                float(np.mean(cand_frac)), 4),
        })
        print(json.dumps(curve[-1]), file=sys.stderr, flush=True)
        shutil.rmtree(d, ignore_errors=True)

    payload = {"dim": args.dim, "n_base": args.n_base,
               "n_queries": args.n_queries, "noise": args.noise,
               "curve": curve}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
