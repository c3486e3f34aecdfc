"""Damerau-Levenshtein edit distance (fuzzy AUTO, R5).

The reference's default search path sends ``fuzziness: AUTO`` to
Elasticsearch (retrieval/es_search_final.py:21); Lucene's FuzzyQuery
defaults to ``transpositions=true``, counting an adjacent-character swap
as ONE edit — classic Levenshtein calls "hte" -> "the" two edits and
misses the most common typo class. This module implements the
unrestricted Damerau-Levenshtein distance (Lowrance-Wagner DP), chosen
to be bit-identical to DuckDB's ``damerau_levenshtein`` so the oracle
twin can verify the expansion in SQL (probe: DL('ca','abc') == 2, which
restricted/OSA scores 3 — DuckDB agrees with 2).

One implementation, three consumers: the engine's fuzzy expansion
(operators/scorer.py), the numpy oracle (oracle.py), and the
driver-checked query twin (queries.py). Inputs are query/vocabulary
tokens (short strings), already length-banded by the caller, so the
O(|a|·|b|) DP is driver/metadata-scale work — never per-posting.
"""

from __future__ import annotations


def damerau_levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Unrestricted Damerau-Levenshtein distance (insert, delete,
    substitute, transpose-adjacent; a transposed pair may be edited
    again, unlike OSA). ``cap``: with the length-band shortcut only —
    returns cap+1 when |len(a)-len(b)| alone exceeds cap; the full DP
    still runs otherwise (tokens are short, the DP is trivial)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if cap is not None and abs(la - lb) > cap:
        return cap + 1
    if la == 0:
        return lb
    if lb == 0:
        return la
    inf = la + lb
    # d is (la+2) x (lb+2); row/col 0 hold the INF sentinel the
    # transposition lookback needs (Lowrance-Wagner).
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    d[1][1] = 0
    for i in range(1, la + 1):
        d[i + 1][1] = i
    for j in range(1, lb + 1):
        d[1][j + 1] = j
    last_row: dict[str, int] = {}
    for i in range(1, la + 1):
        last_col = 0
        for j in range(1, lb + 1):
            i_ = last_row.get(b[j - 1], 0)
            j_ = last_col
            if a[i - 1] == b[j - 1]:
                cost = 0
                last_col = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,        # substitute / match
                d[i + 1][j] + 1,       # insert
                d[i][j + 1] + 1,       # delete
                # transpose a[i_-1]a[i-1] across the gap: pay for the
                # skipped middle chars as indels
                d[i_][j_] + (i - i_ - 1) + 1 + (j - j_ - 1),
            )
        last_row[a[i - 1]] = i
    return d[la + 1][lb + 1]


def levenshtein_many(terms: list[str], b: str):
    """Classic Levenshtein distance of MANY candidate strings vs one
    query token, vectorized over the candidate axis — the driver-local
    numpy twin of the JVM ``F.levenshtein`` prefilter in the distributed
    fuzzy path (operators/scorer.py). Same role, same semantics: callers
    threshold at ``2 * max_edits`` (DL <= e implies Levenshtein <= 2e)
    and run the exact scalar :func:`damerau_levenshtein` over survivors,
    so the two paths expand bit-identically by construction.

    Returns an int64 array aligned with ``terms``. The DP iterates over
    character positions (both tokens are short — callers length-band
    first), with every step an O(n_candidates) numpy op.
    """
    import numpy as np

    n = len(terms)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=n)
    L = max(1, int(lens.max()))
    # fixed-width UTF-32 view: rows are codepoints, zero-padded. The pad
    # never matches a real query char, and a row's distance is captured
    # at column j == len(row) before padding can contribute.
    M = np.asarray(terms, dtype=f"U{L}").view(np.uint32).reshape(n, L)
    bcode = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    lb = bcode.size
    out = np.empty(n, dtype=np.int64)
    out[lens == 0] = lb
    dp = np.broadcast_to(np.arange(lb + 1, dtype=np.int64),
                         (n, lb + 1)).copy()
    for j in range(1, L + 1):
        new = np.empty_like(dp)
        new[:, 0] = j
        cj = M[:, j - 1]
        for k in range(1, lb + 1):
            sub = dp[:, k - 1] + (cj != bcode[k - 1])
            np.minimum(sub, dp[:, k] + 1, out=sub)
            np.minimum(sub, new[:, k - 1] + 1, out=sub)
            new[:, k] = sub
        dp = new
        done = lens == j
        if done.any():
            out[done] = dp[done, lb]
    return out
