"""Delta + variable-byte posting-list codec (numpy-vectorized).

The reference delegates posting compression to Lucene (FOR/varint inside
ES; configured via retrieval/es_create_index_final.py:17-44). Here it is a
first-class operator: docID gaps are delta-encoded then varbyte-packed
(classic VB: 7 data bits per byte, high bit set on the final byte of each
value — Manning/Raghavan/Schütze IIR §5.3), entirely in numpy so the
encode/decode path inside pandas UDFs is vectorized, never per-row Python.
"""

from __future__ import annotations

import numpy as np

_MASKS = np.array([0x7F], dtype=np.uint64)


def vb_encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a uint64 array -> bytes.

    Layout per value: big-endian groups of 7 bits; every byte except the
    last has its high bit clear; the last byte has the high bit set.
    """
    vals = np.asarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b""
    # number of 7-bit groups per value (at least 1)
    nbits = np.zeros(vals.shape, dtype=np.int64)
    nz = vals > 0
    # bit_length via log2 on floats is unsafe for >2^53; use frexp-free loop
    # over the 10 possible byte-lengths (uint64 -> max 10 groups).
    tmp = vals.copy()
    lengths = np.ones(vals.shape, dtype=np.int64)
    tmp >>= np.uint64(7)
    while np.any(tmp > 0):
        more = tmp > 0
        lengths[more] += 1
        tmp >>= np.uint64(7)
    del nbits, nz

    total = int(lengths.sum())
    out = np.empty(total, dtype=np.uint8)
    # ends[i] = index of the last byte of value i
    ends = np.cumsum(lengths) - 1
    # Fill bytes from least-significant group backwards.
    max_len = int(lengths.max())
    shifted = vals.copy()
    for k in range(max_len):
        sel = lengths > k  # values that have a k-th group (from the end)
        pos = ends[sel] - k
        byte = (shifted[sel] & np.uint64(0x7F)).astype(np.uint8)
        if k == 0:
            byte |= np.uint8(0x80)  # terminator bit on final byte
        out[pos] = byte
        shifted[sel] >>= np.uint64(7)
    return out.tobytes()


def vb_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte length (7-bit groups), vectorized."""
    vals = np.asarray(values, dtype=np.uint64)
    lengths = np.ones(vals.shape, dtype=np.int64)
    tmp = vals >> np.uint64(7)
    while np.any(tmp > 0):
        lengths[tmp > 0] += 1
        tmp >>= np.uint64(7)
    return lengths


def vb_decode(buf: bytes) -> np.ndarray:
    """Decode varbyte bytes -> uint64 array (vectorized)."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_end = (b & 0x80) != 0
    n_vals = int(is_end.sum())
    # group id for every byte: index of the value it belongs to
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(is_end[:-1])
    payload = (b & 0x7F).astype(np.uint64)
    # position of each byte within its group, from the END (last byte -> 0)
    ends = np.nonzero(is_end)[0]
    idx = np.arange(b.size, dtype=np.int64)
    pos_from_end = ends[group] - idx
    out = np.zeros(n_vals, dtype=np.uint64)
    np.add.at(out, group, payload << (np.uint64(7) * pos_from_end.astype(np.uint64)))
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int array -> gaps (first value kept verbatim)."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return a.astype(np.uint64)
    gaps = np.empty(a.size, dtype=np.uint64)
    gaps[0] = np.uint64(a[0])
    gaps[1:] = np.diff(a).astype(np.uint64)
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    """Gaps -> original increasing int64 array."""
    if gaps.size == 0:
        return gaps.astype(np.int64)
    return np.cumsum(gaps.astype(np.int64))


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray):
    """Encode one block: sorted doc_ids -> (gaps_vb, tfs_vb, dls_vb)."""
    return (
        vb_encode(delta_encode(doc_ids)),
        vb_encode(np.asarray(tfs, dtype=np.uint64)),
        vb_encode(np.asarray(dls, dtype=np.uint64)),
    )


def decode_postings(gaps_vb: bytes, tfs_vb: bytes, dls_vb: bytes):
    """Decode one block -> (doc_ids int64, tfs int64, dls int64)."""
    return (
        delta_decode(vb_decode(gaps_vb)),
        vb_decode(tfs_vb).astype(np.int64),
        vb_decode(dls_vb).astype(np.int64),
    )


def vb_counts(bufs) -> np.ndarray:
    """Per-buffer value count for a sequence of varbyte buffers, in one
    numpy pass (a value ends at each terminator byte — high bit set)."""
    n = len(bufs)
    lens = np.fromiter((len(x) for x in bufs), dtype=np.int64, count=n)
    joined = b"".join(bytes(x) for x in bufs)
    if not joined:
        return np.zeros(n, dtype=np.int64)
    arr = np.frombuffer(joined, dtype=np.uint8)
    cum0 = np.concatenate(
        ([0], np.cumsum((arr & 0x80) != 0, dtype=np.int64)))
    return np.diff(np.concatenate(([0], cum0[np.cumsum(lens)])))


def decode_blocks_flat(gaps_bufs, tfs_bufs, dls_bufs):
    """Batch-decode MANY posting blocks in a handful of numpy passes
    (guide §4.2: vectorize per-batch, never per-row): varbyte values are
    self-delimiting, so decoding the concatenation equals concatenating
    the per-block decodes; absolute docIDs come from a segmented cumsum
    (each block's first gap is absolute). Bit-identical to the per-block
    ``delta_decode(vb_decode(...))`` loop it replaces — same values, same
    dtypes — at ~10x less per-block Python overhead.

    Returns (doc_ids int64, tfs int64, dls int64, counts int64) where
    counts[i] is block i's posting count.
    """
    counts = vb_counts(gaps_bufs)
    flat = vb_decode(b"".join(bytes(x) for x in gaps_bufs)).astype(np.int64)
    if flat.size == 0:
        doc_ids = flat
    else:
        cs = np.cumsum(flat)
        starts = np.concatenate(
            ([0], np.cumsum(counts)[:-1])).astype(np.int64)
        # guard empty blocks (counts == 0): starts may index past a
        # previous segment; base subtraction only applies where count > 0
        nz = counts > 0
        base = np.zeros(counts.shape, dtype=np.int64)
        base[nz] = cs[starts[nz]] - flat[starts[nz]]
        doc_ids = cs - np.repeat(base, counts)
    tfs = vb_decode(b"".join(bytes(x) for x in tfs_bufs)).astype(np.int64)
    dls = vb_decode(b"".join(bytes(x) for x in dls_bufs)).astype(np.int64)
    return doc_ids, tfs, dls, counts
