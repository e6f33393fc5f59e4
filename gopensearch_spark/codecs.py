"""Posting-list codecs: delta + varint, fully numpy-vectorized.

The reference delegates posting storage to SQLite FTS5, whose doclists
are delta-encoded rowids with varint byte encoding (public SQLite FTS5
format docs). We implement the same family from scratch: strictly
increasing doc_ids are delta-encoded then LEB128-varint packed; term
frequencies are varint packed directly. Everything runs as numpy array
ops inside Arrow-batched pandas UDFs — no per-value Python loops over
data (the only loops below are over *byte positions*, <= 10 iterations).
"""

from __future__ import annotations

import numpy as np

_U7 = np.uint64(7)
_MASK = np.uint64(0x7F)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value = ceil(bitlen/7), min 1
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nbytes += tmp > 0
        tmp >>= _U7
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    remaining = v.copy()
    for i in range(int(nbytes.max())):
        active = nbytes > i
        idx = starts[active] + i
        byte = (remaining[active] & _MASK).astype(np.uint8)
        cont = (nbytes[active] - 1 > i).astype(np.uint8) << 7
        out[idx] = byte | cont
        remaining >>= _U7
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array (vectorized)."""
    a = np.frombuffer(buf, dtype=np.uint8)
    if a.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (a & 0x80) == 0
    n = int(is_last.sum())
    # which value each byte belongs to, and its offset within that value
    vidx = np.concatenate(([0], np.cumsum(is_last)[:-1]))
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    offsets = (np.arange(a.size) - starts[vidx]).astype(np.uint64)
    contrib = (a & 0x7F).astype(np.uint64) << (offsets * _U7)
    values = np.zeros(n, dtype=np.uint64)
    np.bitwise_or.at(values, vidx, contrib)
    return values


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """Delta+varint encode a strictly-increasing int64/uint64 id array."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return b""
    deltas = np.empty(ids.size, dtype=np.uint64)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    return varint_encode(deltas)


def delta_decode(buf: bytes) -> np.ndarray:
    """Inverse of delta_encode; returns uint64 doc ids."""
    deltas = varint_decode(buf)
    return np.cumsum(deltas, dtype=np.uint64)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """Encode one posting block: (delta+varint doc_ids, varint tfs)."""
    return delta_encode(doc_ids), varint_encode(tfs)


def decode_postings(doc_ids_buf: bytes, tfs_buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    return delta_decode(doc_ids_buf), varint_decode(tfs_buf)
