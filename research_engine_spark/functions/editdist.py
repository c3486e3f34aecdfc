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
