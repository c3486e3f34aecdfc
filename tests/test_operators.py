"""Operator-level tests: dedup family vs brute-force ground truth,
similarity search recall, text stats, fusion, murmur3 parity, multimodal
plumbing."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from research_engine_spark.functions.mmh3 import spark_hash_string
from research_engine_spark.operators import dedup as DD
from research_engine_spark.operators import similarity as SIM
from research_engine_spark.operators.fusion import rrf_fuse, with_rank

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),        # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat"),        # near dup of 0
    (3, "completely different content about spark joins"),
    (4, "  The   QUICK brown fox jumps over the lazy dog  "),  # ws/case dup of 0
    (5, "spark joins require shuffle unless broadcast is used"),
    (6, "tiny"),                                               # < n tokens
    (7, ""),                                                   # empty
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = " ".join(text.lower().split()).split(" ") if text.strip() else []
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_exact_dedup(docs_df):
    kept = sorted(r["doc_id"] for r in DD.exact_dedup(docs_df).collect())
    # 0,1,4 collapse (normalization folds case+whitespace); keeper is min id
    assert 0 in kept and 1 not in kept and 4 not in kept
    assert set(kept) >= {0, 2, 3, 5, 6, 7}


def test_exact_dedup_digest_options_agree(docs_df):
    """xxhash64 (scale default) and md5 (oracle-portable) must keep the
    same survivors."""
    a = sorted(r["doc_id"] for r in
               DD.exact_dedup(docs_df, digest="xxhash64").collect())
    b = sorted(r["doc_id"] for r in
               DD.exact_dedup(docs_df, digest="md5").collect())
    assert a == b


def test_word_shingles_match_python(docs_df):
    got = (DD.word_shingles(docs_df).groupBy("doc_id")
           .agg(F.collect_set("shingle").alias("s")).collect())
    got = {r["doc_id"]: set(r["s"]) for r in got}
    for doc_id, text in DOCS:
        want = _py_shingles(text)
        assert got.get(doc_id, set()) == want, doc_id


def test_ngram_jaccard_vs_bruteforce(docs_df):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in DD.ngram_jaccard_pairs(docs_df, threshold=0.1).collect()}
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        sa, sb = _py_shingles(ta), _py_shingles(tb)
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.1:
            assert (ia, ib) in pairs
            assert abs(pairs[(ia, ib)] - j) < 1e-12
        else:
            assert (ia, ib) not in pairs


def test_lsh_candidates_superset_of_high_jaccard(docs_df):
    # banding guarantee: identical signatures in >=1 band -> candidate;
    # exact dups must always be candidates
    cands = {(r["id_a"], r["id_b"])
             for r in DD.lsh_candidate_pairs(docs_df).collect()}
    assert (0, 1) in cands and (0, 4) in cands and (1, 4) in cands


def test_simhash_properties(spark, docs_df):
    sh = {r["doc_id"]: r["simhash"] for r in DD.simhash(docs_df).collect()}
    assert sh[0] == sh[1]  # identical text -> identical fingerprint
    h02 = bin(sh[0] ^ sh[2]).count("1")
    h03 = bin(sh[0] ^ sh[3]).count("1")
    assert h02 < h03  # near dup closer than unrelated
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in DD.simhash_near_pairs(docs_df, max_hamming=3).collect()}
    assert pairs.get((0, 1)) == 0


def test_mmh3_matches_spark_hash(spark):
    terms = ["neural", "network", "", "a", "架构", "café", "x" * 100,
             "term00042", "UPPER case", "123", "\t\n"]
    rows = spark.createDataFrame([(t,) for t in terms], "t string").select(
        "t", F.hash("t").alias("h")).collect()
    for r in rows:
        assert spark_hash_string(r["t"]) == r["h"], r["t"]


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((100, 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs[7] = vecs[0] * 0.999 + 0.001 * vecs[1]  # near-dup of 0
    pdf = pd.DataFrame({"vec_id": range(100),
                        "embedding": [v.astype(np.float32).tolist()
                                      for v in vecs]})
    return (spark.createDataFrame(pdf), vecs)


def test_brute_force_cosine_matches_numpy(emb_df):
    df, vecs = emb_df
    q = vecs[0].tolist()
    got = SIM.brute_force_topk(df.filter(F.col("vec_id") != 0), q, k=5).collect()
    f32 = np.array([np.asarray(v, dtype=np.float32) for v in vecs])
    cos = (f32 @ np.asarray(q)) / (np.linalg.norm(f32, axis=1)
                                   * np.linalg.norm(q))
    cos[0] = -np.inf
    want = np.argsort(-cos, kind="stable")[:5]
    assert [r["vec_id"] for r in got] == list(want)
    assert got[0]["vec_id"] == 7  # the planted near-dup


def test_lsh_ann_finds_near_dup(emb_df):
    df, vecs = emb_df
    q = vecs[0].tolist()
    got = SIM.lsh_bucketed_topk(df.filter(F.col("vec_id") != 0), q, k=5,
                                n_planes=6, n_tables=6)
    ids = [r["vec_id"] for r in got.collect()]
    assert 7 in ids  # near-identical vector lands in the query's bucket


def test_embedding_near_dup_pairs(emb_df):
    df, _ = emb_df
    pairs = {(r["id_a"], r["id_b"]) for r in
             SIM.embedding_near_dup_pairs(df, threshold=0.99).collect()}
    assert (0, 7) in pairs


def test_rrf_matches_reference_formula(spark):
    # reference: scores[doc] += 1/(k + rank), k=60 (query_retriever.py:66-74)
    l1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc long, rank int")
    l2 = spark.createDataFrame([(3, 1), (1, 2), (4, 3)], "doc long, rank int")
    got = {r["doc"]: r["rrf_score"]
           for r in rrf_fuse([l1, l2], ["doc"], k=60).collect()}
    assert abs(got[1] - (1 / 61 + 1 / 62)) < 1e-12
    assert abs(got[3] - (1 / 63 + 1 / 61)) < 1e-12
    assert abs(got[4] - 1 / 63) < 1e-12


def test_with_rank_deterministic_ties(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 4.0)], "id long, s double")
    got = {r["id"]: r["rank"] for r in with_rank(df, "s", "id").collect()}
    assert got == {1: 1, 2: 2, 3: 3}


def test_with_rank_per_key_matches_per_list_rank(spark):
    """The keyed full-depth rank (one shuffle for N lists) must equal
    running with_rank on each list separately."""
    from research_engine_spark.operators.fusion import with_rank_per_key

    rng = np.random.default_rng(5)
    rows = [(f"l{k}", int(i), float(v)) for k in range(3)
            for i, v in enumerate(rng.integers(0, 40, size=200))]
    df = spark.createDataFrame(rows, "lst string, id int, s double")
    got = {(r["lst"], r["id"]): r["rank"]
           for r in with_rank_per_key(df, "lst", "s", "id").collect()}
    for k in range(3):
        solo = {r["id"]: r["rank"] for r in with_rank(
            df.filter(F.col("lst") == f"l{k}").drop("lst"),
            "s", "id").collect()}
        for i, rk in solo.items():
            assert got[(f"l{k}", i)] == rk, (k, i)
    # the small-input "window" strategy (one hash shuffle, no range
    # sampling) must assign identical ranks to the ranged scale path
    winr = {(r["lst"], r["id"]): r["rank"]
            for r in with_rank_per_key(df, "lst", "s", "id",
                                       strategy="window").collect()}
    assert winr == got


def test_multimodal_plumbing(spark):
    from research_engine_spark.operators.multimodal import (
        extract_features, frame_sample_plan, synth_media)

    media = synth_media(spark, n=12, seed=1)
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 12
    assert all(len(r["feature"]) == 8 for r in feats)
    # deterministic: same payload -> same features
    feats2 = extract_features(synth_media(spark, n=12, seed=1), dim=8).collect()
    f1 = {r["media_id"]: r["feature"] for r in feats}
    f2 = {r["media_id"]: r["feature"] for r in feats2}
    assert f1 == f2
    with pytest.raises(NotImplementedError):
        extract_features(media, fake=False)
    plan = frame_sample_plan(media, every_ms=500)
    assert plan.count() > 0


def test_textstats(spark):
    from research_engine_spark.functions.textstats import with_text_stats

    df = spark.createDataFrame(
        [(0, "The quick brown fox and the lazy dog are friends."),
         (1, "!!! ??? ###"),
         (2, ""),
         (3, "der die das und ist nicht ein mit für immer")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in with_text_stats(df).collect()}
    assert rows[0]["lang_guess"] == "en"
    assert rows[3]["lang_guess"] == "de"
    assert rows[0]["n_tokens"] == 10
    assert rows[2]["n_tokens"] == 0
    assert rows[0]["quality"] > rows[1]["quality"]
    assert rows[0]["fingerprint"] is not None


def test_jaccard_hot_shingle_cap_keeps_planted_pairs(spark):
    """Skew fixture (VERDICT r1 #5): a boilerplate sentence in ~35% of
    docs. With the df cap, planted near-dup pairs must still pair, and
    pairs related ONLY through the boilerplate must not."""
    boiler = " subscribe to our newsletter today please do it"
    rows = []
    for i in range(20):
        body = (f"unique alpha{i} beta{i} gamma{i} delta{i} epsilon{i} "
                f"zeta{i} eta{i} theta{i} iota{i} kappa{i}")
        tail = boiler if i % 3 == 0 else ""
        rows.append((i, body + tail))
        rows.append((i + 100, body.replace(f"zeta{i}", f"zz{i}") + tail))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in DD.ngram_jaccard_pairs(
                 df, threshold=0.3, max_shingle_df=10).collect()}
    for i in range(20):
        assert (i, i + 100) in pairs, i          # planted pair survives
    # boilerplate-only relations are gone: no pair between distinct bodies
    for (a, b) in pairs:
        assert b - a == 100, (a, b)


def test_lsh_band_cap_bounds_hot_buckets(spark):
    """A 30-doc identical-boilerplate cluster (every band bucket hot) is
    dropped by the bucket cap; a planted near-dup pair with cold buckets
    still pairs."""
    rows = [(i, "the same boilerplate text repeated again and again "
                "for absolutely everyone on this website") for i in range(30)]
    rows.append((100, "a very specific document about neural networks "
                      "and spark execution plans at scale"))
    rows.append((101, "a very specific document about neural networks "
                      "and spark execution plans at scale"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in
             DD.lsh_candidate_pairs(df, max_band_bucket=10).collect()}
    assert (100, 101) in pairs
    assert all(a >= 100 for a, _ in pairs), pairs  # hot cluster dropped
    # without the cap the hot cluster floods the output
    uncapped = {(r["id_a"], r["id_b"]) for r in
                DD.lsh_candidate_pairs(df, max_band_bucket=None).collect()}
    assert len(uncapped) == 30 * 29 // 2 + 1


def test_ann_index_prunes_and_recalls(spark, emb_df, tmp_path):
    """build_ann_index + ann_index_topk: the candidate scan must show
    Catalyst partition pruning (PartitionFilters on tbl/bucket), and the
    planted near-dup must be recalled."""
    from research_engine_spark.plans.inspect import assert_scan_efficient

    df, vecs = emb_df
    d = str(tmp_path / "ann")
    SIM.build_ann_index(df.filter(F.col("vec_id") != 0), d,
                        n_planes=6, n_tables=6, seed=42)
    q = vecs[0].tolist()
    cand = SIM.ann_candidates(spark, d, q)
    facts = assert_scan_efficient(cand, require_partition_pruning=True,
                                  require_pushdown=False)
    assert facts.has_partition_filters
    got = SIM.ann_index_topk(spark, d, q, k=5).collect()
    assert 7 in [r["vec_id"] for r in got]
    # candidate set is a strict subset of the table (pruning is real)
    assert cand.count() < df.count()


def test_ann_index_dim768(spark, tmp_path):
    """Realistic embedding width (r2 VERDICT #5): build + query at
    dim=768 must work with bounded planning (the old per-dimension
    literal expression trees inlined ~25k Catalyst nodes here; the
    pandas-UDF planes matmul is dimension-independent plan-wise)."""
    import time

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, 768))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs[5] = vecs[0] * 0.999 + 0.001 * vecs[1]
    pdf = pd.DataFrame({"vec_id": range(60),
                        "embedding": [v.astype(np.float32).tolist()
                                      for v in vecs]})
    df = spark.createDataFrame(pdf)
    d = str(tmp_path / "ann768")
    t0 = time.monotonic()
    SIM.build_ann_index(df.filter(F.col("vec_id") != 0), d,
                        n_planes=8, n_tables=4, seed=42)
    q = vecs[0].tolist()
    got = SIM.ann_index_topk(spark, d, q, k=5).collect()
    wall = time.monotonic() - t0
    assert 5 in [r["vec_id"] for r in got]
    # bounded end-to-end wall: planning no longer scales with dim
    assert wall < 60, f"dim-768 build+query took {wall:.1f}s"
    # the brute-force rescore agrees with numpy on the candidate set
    f32 = np.array([np.asarray(v, dtype=np.float32) for v in vecs])
    cos = (f32 @ np.asarray(q)) / (np.linalg.norm(f32, axis=1)
                                   * np.linalg.norm(q))
    assert got[0]["vec_id"] == int(np.argsort(-cos[1:])[0]) + 1


def test_probe_buckets_margin_order():
    """Multiprobe sequence (Lv et al. 2007): probe 0 is the query's own
    bucket; probe 1 flips exactly the minimum-|margin| plane; probes are
    distinct and ranked by total flipped margin; n_probes=1 reproduces
    the single-probe bucket."""
    rng = np.random.default_rng(5)
    planes = rng.standard_normal((8, 16))
    q = rng.standard_normal(16)
    proj = q @ planes.T
    base = int(((proj >= 0.0) @ (1 << np.arange(8))))
    probes = SIM._probe_buckets(planes, q, n_probes=5)
    assert probes[0] == base
    assert probes == SIM._probe_buckets(planes, q, 5)  # deterministic
    assert len(set(probes)) == 5
    assert SIM._probe_buckets(planes, q, 1) == [base]
    min_bit = int(np.argmin(np.abs(proj)))
    assert probes[1] == base ^ (1 << min_bit)
    # ranked: cumulative flipped margins are non-decreasing
    margins = np.abs(proj)
    costs = [sum(margins[i] for i in range(8) if (p ^ base) >> i & 1)
             for p in probes]
    assert costs == sorted(costs)
    # wide-hash fallback (n_planes > 16): single/double flips, same head
    planes32 = rng.standard_normal((18, 16))
    p32 = SIM._probe_buckets(planes32, q, n_probes=6)
    assert len(set(p32)) == 6 and p32[0] == int(
        ((q @ planes32.T >= 0.0) @ (np.int64(1) << np.arange(18))))


def test_ann_multiprobe_recall_superset(spark, emb_df, tmp_path):
    """n_probes > 1 must (a) read a superset of the single-probe
    candidates while still partition-pruning, and (b) recover planted
    near-dups that single-probe misses on an undersized index —
    recall(multiprobe) >= recall(single) over many queries, strictly
    more candidates."""
    df, vecs = emb_df
    d = str(tmp_path / "annmp")
    SIM.build_ann_index(df, d, n_planes=8, n_tables=2, seed=42)
    hits1 = hits4 = 0
    for qi in range(20):
        q = (vecs[qi] + 0.05 * vecs[(qi + 1) % 100]).tolist()
        c1 = {r["vec_id"] for r in SIM.ann_candidates(spark, d, q).collect()}
        c4 = {r["vec_id"] for r in
              SIM.ann_candidates(spark, d, q, n_probes=4).collect()}
        assert c1 <= c4
        hits1 += qi in c1
        hits4 += qi in c4
    assert hits4 >= hits1
    assert hits4 > hits1 or hits1 == 20  # probes buy recall when missing
    # top-k through the multiprobe path still rescored exactly
    got = SIM.ann_index_topk(spark, d, vecs[0].tolist(), k=3,
                             n_probes=4).collect()
    assert got[0]["vec_id"] == 0


def test_near_dup_clusters_transitive(spark):
    """A~B and B~C must land in ONE cluster labeled min(A,B,C); disjoint
    pairs stay separate; chain components converge within the round
    budget."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3),            # chain -> {1,2,3} labeled 1
         (10, 11),                  # pair  -> {10,11} labeled 10
         (20, 21), (21, 22), (22, 23), (23, 24)],  # longer chain
        "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in DD.near_dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20, 24: 20}


def test_near_dup_clusters_budget_raises(spark):
    """Exhausting the round budget must raise, never return a partial
    (wrong) partition."""
    import pytest

    chain = [(i, i + 1) for i in range(30)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        DD.near_dup_clusters(pairs, max_iter=2)


def test_drop_near_dups_keeps_canonical_and_unclustered(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 4)], "id_a long, id_b long")
    clusters = DD.near_dup_clusters(pairs)
    kept = sorted(r["doc_id"]
                  for r in DD.drop_near_dups(docs, clusters).collect())
    # {1,2,4} collapse to canonical 1; 0/3/5 unclustered survive
    assert kept == [0, 1, 3, 5]


def test_contamination_overlap_planted(spark):
    """contamination_overlap: exact-copy probe = 1.0, half-overlap in
    between, clean probe = 0.0, sub-n probe = (0, 0, 0.0); xxhash64 and
    raw digests agree; the broadcast path and the shuffled fallback
    (max_broadcast_shingles=0) return identical frames."""
    from research_engine_spark.operators.dedup import contamination_overlap

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa")
    corpus = spark.createDataFrame(
        [(1, base), (2, "totally different corpus content about spark "
                        "partitions shuffles and broadcast joins")],
        "doc_id bigint, text string")
    probe = spark.createDataFrame(
        [(10, base),                                  # exact copy
         (11, base.split(" juliet")[0] + " zz yy xx ww vv uu tt ss"),
         (12, "none of these probe words ever appear inside the training "
              "set rows"),
         (13, "too short")],
        "doc_id bigint, text string")

    def rows(**kw):
        out = contamination_overlap(corpus, probe, n=5, **kw)
        return [(x.doc_id, x.n_shingles, x.n_matched,
                 round(x.overlap_frac, 6))
                for x in out.orderBy("doc_id").collect()]

    got = rows()
    assert got[0] == (10, 12, 12, 1.0)
    assert got[1][1] > got[1][2] > 0          # partial overlap
    assert got[2][2] == 0 and got[2][3] == 0.0
    assert got[3] == (13, 0, 0, 0.0)
    assert rows(digest="raw") == got
    assert rows(max_broadcast_shingles=0) == got  # shuffled fallback


def test_stratified_sample_and_cap(spark):
    """sampling.py: per-stratum rates land near their fractions, the
    kept set is identical across repartitions (determinism), salts
    decorrelate draws, fraction 1.0 keeps everything, and capping keeps
    exactly the best-n per stratum with deterministic ties."""
    from pyspark.sql import functions as F
    from research_engine_spark.operators.sampling import (
        cap_per_stratum,
        stratified_sample,
    )

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("grp"),
        (F.col("id") * 37 % 1000).alias("score"))
    fr = {"0": 0.1, "1": 0.5, "2": 1.0}
    out = stratified_sample(df, "grp", fr, default=0.0)
    got = {r.grp: r.cnt for r in
           out.groupBy("grp").agg(F.count("*").alias("cnt")).collect()}
    assert got.get("2") == 1000 and "3" not in got  # 1.0 keeps all, default drops
    for g, f in (("0", 0.1), ("1", 0.5)):
        assert abs(got[g] - 1000 * f) < 4 * (1000 * f * (1 - f)) ** 0.5
    ids = sorted(r.doc_id for r in out.collect())
    again = sorted(r.doc_id for r in stratified_sample(
        df.repartition(13), "grp", fr, default=0.0).collect())
    assert ids == again  # deterministic under repartition
    salted = {r.doc_id for r in stratified_sample(
        df, "grp", fr, default=0.0, salt="v2").collect()}
    assert salted != set(ids)  # a salt is a fresh draw
    capped = cap_per_stratum(df, "grp", 7, order_col="score").collect()
    per = {}
    for r in capped:
        per.setdefault(r.grp, []).append(r.score)
    assert set(map(len, per.values())) == {7}
    pdf = df.toPandas()
    for g, scores in per.items():
        want = sorted(pdf[pdf.grp == g]["score"], reverse=True)[:7]
        assert sorted(scores, reverse=True) == want
    # hash-order capping: exactly n per stratum, stable across runs
    c1 = {r.doc_id for r in cap_per_stratum(df, "grp", 3).collect()}
    c2 = {r.doc_id for r in cap_per_stratum(
        df.repartition(7), "grp", 3).collect()}
    assert c1 == c2 and len(c1) == 12


def test_duplicate_spans_planted(spark, docs_df):
    out = {r["doc_id"]: r for r in
           DD.duplicate_spans(docs_df, k=4, min_count=2).collect()}
    assert len(out) == len(DOCS)  # every doc reported, incl. short/empty
    # docs 0/1/4 are identical after analysis: every 4-gram duplicated,
    # one island covering the whole 9-token doc
    for d in (0, 1, 4):
        r = out[d]
        assert (r.n_tokens, r.dup_grams, r.covered_tokens) == (9, 6, 9)
        assert r.dup_frac == 1.0
    # doc 2 shares the 8-token prefix: grams at starts 0..4 duplicated,
    # the final gram (...lazy cat) is unique -> covered 0..8 of 9
    r = out[2]
    assert (r.n_tokens, r.dup_grams, r.covered_tokens) == (9, 5, 8)
    assert abs(r.dup_frac - 8 / 9) < 1e-12
    # unique docs, short doc, empty doc: zero coverage
    for d in (3, 5, 6, 7):
        assert (out[d].dup_grams, out[d].covered_tokens,
                out[d].dup_frac) == (0, 0, 0.0)


def test_duplicate_spans_self_repetition(spark):
    df = spark.createDataFrame(
        [(0, "a b c d x a b c d"), (1, "e f g h i j")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           DD.duplicate_spans(df, k=4, min_count=2).collect()}
    # "a b c d" occurs twice IN THE SAME doc -> both occurrences are
    # duplicated spans, two disjoint islands [0,4) and [5,9)
    assert (out[0].dup_grams, out[0].covered_tokens) == (2, 8)
    assert (out[1].dup_grams, out[1].covered_tokens) == (0, 0)
