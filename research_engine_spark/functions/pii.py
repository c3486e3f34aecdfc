"""PII scrubbing for training-data pipelines: mask emails, phone
numbers, IP addresses, SSNs, and card numbers in a text column.

The reference ships raw transcript text to its index with no
redaction pass (database/scripts/chunk_pdfs_final.py cleans layout,
not identifiers); a pretraining pipeline over web-scale text needs
one. Spark-first: every pattern is a Catalyst ``regexp_replace`` /
``regexp_count`` — JVM-side, whole-stage-codegen, zero UDFs — so the
scrub rides the same scan as any other projection at 100 TB.

Pattern discipline: RE2-compatible (no lookarounds, no
backreferences) so the DuckDB oracle (`pii_scrub_documents` in
queries.py) can run the IDENTICAL regex strings — the driver
hash-check then covers the patterns themselves, not just the
plumbing. Masking order is fixed (email, card, ssn, phone, ipv4):
longer/more-specific patterns first so a card number is never
half-eaten by the phone rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# the pattern table — ORDER MATTERS (applied top to bottom)
# ---------------------------------------------------------------------------

PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    # 16-digit card, optional 4-4-4-4 grouping — before phone so the
    # phone rule can't consume a card fragment
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b|\b\d{16}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    # NANP-ish: optional (area), separator -. or space, 3-4 split
    ("phone", r"\(\d{3}\)[-. ]?\d{3}[-. ]\d{4}\b"
              r"|\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]

_KINDS = tuple(k for k, _ in PII_PATTERNS)


def _selected(kinds) -> list[tuple[str, str]]:
    if kinds is None:
        return list(PII_PATTERNS)
    bad = sorted(set(kinds) - set(_KINDS))
    if bad:
        raise ValueError(f"unknown PII kinds {bad}, have {list(_KINDS)}")
    # preserve the canonical order regardless of caller order
    return [(k, p) for k, p in PII_PATTERNS if k in set(kinds)]


def mask_pii(text_col: Column, kinds=None,
             token: str = "[PII-{kind}]") -> Column:
    """Replace every match of the selected PII kinds with
    ``token.format(kind=...)``. Pure column expression — one chained
    regexp_replace per kind, applied in the canonical order."""
    out = text_col
    for kind, pat in _selected(kinds):
        out = F.regexp_replace(out, pat, token.format(kind=kind))
    return out


def pii_counts(text_col: Column, kinds=None) -> list[Column]:
    """Per-kind match-count columns (``<kind>_n``). Counts are taken
    against the PROGRESSIVELY masked text, mirroring mask_pii's
    precedence — a card number counts once as card, never again as
    phone."""
    cols = []
    cur = text_col
    for kind, pat in _selected(kinds):
        cols.append(F.regexp_count(cur, F.lit(pat)).alias(f"{kind}_n"))
        cur = F.regexp_replace(cur, pat, f"[PII-{kind}]")
    return cols


def scrub_pii(df: DataFrame, text_col: str = "text", kinds=None,
              token: str = "[PII-{kind}]",
              with_counts: bool = False) -> DataFrame:
    """Return ``df`` with ``text_col`` masked in place (plus per-kind
    count columns when ``with_counts``). Map-side only: no shuffle, no
    UDF — safe to fuse with any downstream filter or the index build's
    tokenize pass."""
    cols = [c for c in df.columns if c != text_col]
    extra = pii_counts(F.col(text_col), kinds) if with_counts else []
    return df.select(
        *cols, mask_pii(F.col(text_col), kinds, token).alias(text_col),
        *extra)
