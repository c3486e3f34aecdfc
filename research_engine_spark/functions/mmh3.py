"""Murmur3 x86_32 (public domain algorithm, Austin Appleby) — the same hash
Spark's ``F.hash`` uses for strings (seed 42), reimplemented driver-side so
query-time term->bucket routing needs NO Spark job. Verified bit-identical
against ``F.hash`` in tests/test_analyzer.py.
"""

from __future__ import annotations

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_MASK = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK
    h ^= h >> 16
    return h


def murmur3_x86_32(data: bytes, seed: int = 42) -> int:
    """Spark-compatible Murmur3: processes trailing 1-3 bytes as a SIGNED
    int tail the way Spark/Guava does (bytes are sign-extended)."""
    h = seed & _MASK
    n = len(data)
    n_blocks = n // 4
    for i in range(n_blocks):
        k = int.from_bytes(data[i * 4:(i + 1) * 4], "little")
        k = (k * _C1) & _MASK
        k = _rotl(k, 15)
        k = (k * _C2) & _MASK
        h ^= k
        h = _rotl(h, 13)
        h = (h * 5 + 0xE6546B64) & _MASK
    # Spark (Guava-style) tail: each remaining byte mixed as a full round,
    # sign-extended (see org.apache.spark.unsafe.hash.Murmur3_x86_32
    # hashUnsafeBytes: it processes the tail byte-by-byte as signed ints).
    for i in range(n_blocks * 4, n):
        b = data[i]
        if b >= 128:
            b -= 256  # sign extension
        k = b & _MASK
        k = (k * _C1) & _MASK
        k = _rotl(k, 15)
        k = (k * _C2) & _MASK
        h ^= k
        h = _rotl(h, 13)
        h = (h * 5 + 0xE6546B64) & _MASK
    h ^= n
    h = _fmix(h)
    # Spark's hash() returns a signed 32-bit int
    return h - (1 << 32) if h >= (1 << 31) else h


def spark_hash_string(s: str, seed: int = 42) -> int:
    return murmur3_x86_32(s.encode("utf-8"), seed)


def bucket_of_term(term: str, n_buckets: int) -> int:
    """pmod(hash(term), n_buckets) — mirrors the build-time expression."""
    return spark_hash_string(term) % n_buckets
