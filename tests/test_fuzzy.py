"""R5 fuzzy matching: Lucene AUTO edit-distance expansion must be
rank-identical (docIDs AND float64 scores) to the numpy oracle mirror,
and reduce to exact search when the query has no typos beyond vocab."""

from __future__ import annotations

import numpy as np
import pytest

from research_engine_spark.functions.editdist import damerau_levenshtein
from research_engine_spark.operators.scorer import (auto_max_edits, search)


def test_auto_edits_schedule():
    assert auto_max_edits("ab") == 0
    assert auto_max_edits("cat") == 1
    assert auto_max_edits("hello") == 1
    assert auto_max_edits("neural") == 2
    assert auto_max_edits("transformer") == 2


def test_damerau_levenshtein_basics():
    assert damerau_levenshtein("kitten", "sitting") == 3
    assert damerau_levenshtein("abc", "abc") == 0
    assert damerau_levenshtein("abc", "abd") == 1
    assert damerau_levenshtein("abc", "ab") == 1
    # length-band shortcut returns cap+1
    assert damerau_levenshtein("aaaaaa", "ab", cap=2) == 3


def test_transposition_is_one_edit():
    """Lucene FuzzyQuery transpositions=true: adjacent swap = ONE edit."""
    assert damerau_levenshtein("hte", "the") == 1
    assert damerau_levenshtein("ab", "ba") == 1
    assert damerau_levenshtein("abcd", "badc") == 2
    # unrestricted variant (matches DuckDB damerau_levenshtein; OSA says 3)
    assert damerau_levenshtein("ca", "abc") == 2


def test_damerau_matches_duckdb():
    import random
    import string

    import duckdb

    con = duckdb.connect()
    rng = random.Random(7)
    for _ in range(300):
        a = "".join(rng.choices(string.ascii_lowercase[:5],
                                k=rng.randint(0, 8)))
        b = "".join(rng.choices(string.ascii_lowercase[:5],
                                k=rng.randint(0, 8)))
        ref = con.execute("select damerau_levenshtein(?, ?)",
                          [a, b]).fetchone()[0]
        assert damerau_levenshtein(a, b) == ref, (a, b)


def test_fuzzy_transposition_typo_expands(spark, reader, oracle):
    """'hte' is 1 Damerau edit from 'the' — the expansion must reach it
    (classic Levenshtein says 2 > AUTO's 1-edit budget for length 3)."""
    assert auto_max_edits("hte") == 1
    eng = search(reader, "hte", k=10, fuzzy=True, with_text=False).toPandas()
    ora = oracle.fuzzy_search("hte", k=10)
    assert len(eng) > 0
    assert list(eng["doc_id"]) == list(ora["doc_id"])
    assert np.array_equal(eng["score"].to_numpy(), ora["score"].to_numpy())


FUZZY_QUERIES = [
    "neurel netwerks",          # 1-edit typos of neural networks
    "machin lerning",           # stemmed vocab hits within distance
    "transformr architecture",  # one typo'd, one exact
    "wat is BERT",              # short term (0/1 edits)
    "attention mechanizm",
]


@pytest.mark.parametrize("q", FUZZY_QUERIES)
def test_fuzzy_rank_identity(spark, reader, oracle, q):
    for k in (5, 10):
        eng = search(reader, q, k=k, fuzzy=True, with_text=False).toPandas()
        ora = oracle.fuzzy_search(q, k=k)
        assert list(eng["doc_id"]) == list(ora["doc_id"]), (q, k)
        assert np.array_equal(eng["score"].to_numpy(),
                              ora["score"].to_numpy()), (q, k)


def test_fuzzy_finds_typo_matches(spark, reader, oracle):
    """A typo'd query must return hits even when the exact term is absent
    from the vocabulary."""
    exact = search(reader, "neurel", k=5, with_text=False).toPandas()
    fuzz = search(reader, "neurel", k=5, fuzzy=True, with_text=False).toPandas()
    assert len(exact) == 0       # typo not in vocab
    assert len(fuzz) > 0         # expansion reaches 'neural'


def test_fuzzy_exact_term_includes_self_with_boost_one(spark, reader, oracle):
    """For a vocab term, the 0-edit self-expansion must contribute exactly
    the unweighted BM25 partial (boost == 1.0), so fuzzy >= exact scores
    per doc."""
    eng_f = search(reader, "neural", k=10, fuzzy=True,
                   with_text=False).toPandas()
    ora_f = oracle.fuzzy_search("neural", k=10)
    assert list(eng_f["doc_id"]) == list(ora_f["doc_id"])
    assert np.array_equal(eng_f["score"].to_numpy(),
                          ora_f["score"].to_numpy())


def test_batch_fuzzy_matches_single_query(reader):
    """search_many(fuzzy=True) must return, per query, bit-identical
    (doc_id, score) to search(fuzzy=True) — one shared vocabulary-
    expansion job for the whole batch, same clauses, same fold order."""
    import numpy as np

    from research_engine_spark.operators.scorer import search, search_many

    batch = {"f1": "neurel netwerk traning", "f2": "transformr atention",
             "f3": "machne learing", "plain": "neural networks"}
    got = search_many(reader, batch, k=10, fuzzy=True).toPandas()
    for qid, q in batch.items():
        single = search(reader, q, k=10, with_text=False,
                        fuzzy=True).toPandas()
        part = got[got["qid"] == qid]
        assert list(part["doc_id"]) == list(single["doc_id"]), qid
        assert np.allclose(part["score"], single["score"],
                           rtol=0, atol=0), qid


def test_batch_fuzzy_shared_typo_across_queries(reader):
    """Two batch queries sharing a typo term must each get the full
    expansion (the distinct-pair DP dedup must not drop clauses)."""
    import numpy as np

    from research_engine_spark.operators.scorer import search, search_many

    batch = {"a": "neurel netwerk", "b": "neurel traning"}
    got = search_many(reader, batch, k=8, fuzzy=True).toPandas()
    for qid, q in batch.items():
        single = search(reader, q, k=8, with_text=False,
                        fuzzy=True).toPandas()
        part = got[got["qid"] == qid]
        assert list(part["doc_id"]) == list(single["doc_id"]), qid
        assert np.allclose(part["score"], single["score"],
                           rtol=0, atol=0), qid
