"""Varbyte/delta codec property tests (SURVEY.md §5 item 4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from research_engine_spark.operators.codec import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    vb_decode,
    vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**56), max_size=300))
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(arr)), arr)


@given(st.sets(st.integers(min_value=0, max_value=10**12), max_size=300))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip_monotone(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    gaps = delta_encode(arr)
    assert np.array_equal(delta_decode(gaps), arr)
    if arr.size > 1:
        assert (gaps[1:] >= 1).all()  # strictly increasing input -> gaps >= 1


def test_empty():
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


def test_postings_roundtrip():
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(10**9, size=1000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 100, 1000)
    dls = rng.integers(1, 400, 1000)
    g, t, d = encode_postings(ids, tfs, dls)
    i2, t2, d2 = decode_postings(g, t, d)
    assert np.array_equal(i2, ids)
    assert np.array_equal(t2, tfs)
    assert np.array_equal(d2, dls)


def test_compression_is_compact():
    # dense gaps of ~small magnitude should take ~1-2 bytes per id
    ids = np.arange(0, 100000, 7, dtype=np.int64)
    enc = vb_encode(delta_encode(ids))
    assert len(enc) < ids.size * 2 + 8


def test_block_skyline_pareto():
    import numpy as np

    from research_engine_spark.operators.indexer import block_skyline

    tfs = np.array([1, 3, 2, 3, 1], dtype=np.int64)
    dls = np.array([10, 50, 5, 40, 2], dtype=np.int64)
    sky_t, sky_d = block_skyline(tfs, dls)
    # Pareto front tf-desc: (3, 40), (2, 5), (1, 2)
    assert sky_t == [3, 2, 1]
    assert sky_d == [40, 5, 2]


def test_block_skyline_bound_is_exact_block_max():
    """max over skyline points of the BM25 tf-part must equal the max
    over the block's actual postings, for arbitrary (k1, b, avgdl) —
    the property that makes the recomputed block bound EXACT."""
    import numpy as np

    from research_engine_spark.operators.indexer import (block_skyline,
                                                         bm25_tf_part)

    rng = np.random.default_rng(3)
    for _ in range(50):
        n = int(rng.integers(1, 129))
        tfs = rng.integers(1, 40, size=n)
        dls = rng.integers(1, 300, size=n)
        sky_t, sky_d = block_skyline(tfs, dls)
        assert len(sky_t) <= len(set(tfs.tolist()))
        for k1, b, avgdl in [(1.2, 0.75, 25.0), (0.9, 0.4, 100.0),
                             (2.0, 0.0, 7.0), (0.1, 1.0, 55.5)]:
            exact = bm25_tf_part(tfs, dls, avgdl, k1, b).max()
            sky = bm25_tf_part(np.array(sky_t), np.array(sky_d),
                               avgdl, k1, b).max()
            assert sky == exact, (k1, b, avgdl)


def test_range_max_sparse_table():
    import numpy as np

    from research_engine_spark.operators.scorer import (_range_max,
                                                        _sparse_max_table)

    rng = np.random.default_rng(0)
    for _ in range(100):
        n = int(rng.integers(1, 200))
        vals = rng.random(n)
        lv = _sparse_max_table(vals)
        i0 = rng.integers(0, n, size=30)
        i1 = np.minimum(i0 + rng.integers(0, n, size=30), n - 1)
        m = i0 <= i1
        got = _range_max(lv, i0[m], i1[m])
        want = np.array([vals[a:b + 1].max()
                         for a, b in zip(i0[m], i1[m])])
        assert np.array_equal(got, want)


def test_aligned_skip_bounds_match_bruteforce():
    """Doc-range-aligned phase-A bounds (block-level BMW alignment) must
    equal the O(n·m) brute-force overlap max."""
    import numpy as np
    import pandas as pd

    from research_engine_spark.operators.scorer import _aligned_skip_bounds

    rng = np.random.default_rng(1)
    for trial in range(30):
        rows = []
        terms = ["a", "b", "c"][: int(rng.integers(2, 4))]
        for t in terms:
            for s in range(int(rng.integers(1, 3))):
                start = int(rng.integers(0, 50))
                for bid in range(int(rng.integers(1, 12))):
                    f = start + int(rng.integers(5, 30))
                    l = f + int(rng.integers(0, 8))
                    start = l
                    rows.append((t, s, bid, f, l))
        bm = pd.DataFrame(rows, columns=["term", "salt", "block_id",
                                         "first_doc_id", "last_doc_id"])
        ub = rng.random(len(bm))
        got = _aligned_skip_bounds(bm, ub, terms)
        want = ub.copy()
        for i in range(len(bm)):
            t, f, l = (bm["term"][i], bm["first_doc_id"][i],
                       bm["last_doc_id"][i])
            for t2 in terms:
                if t2 == t:
                    continue
                mx = 0.0
                for j in range(len(bm)):
                    if (bm["term"][j] == t2
                            and bm["first_doc_id"][j] <= l
                            and bm["last_doc_id"][j] >= f):
                        mx = max(mx, ub[j])
                want[i] += mx
        assert np.allclose(got, want), trial
