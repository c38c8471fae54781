"""Posting-list codec: delta-gap + LEB128 varint, vectorized with NumPy.

This is the Spark-native analog of the reference's Roaring container
serialization (miru-bitmaps-roaring6/.../MiruBitmapsRoaring.java:600-640,
LabInvertedIndex.java:230-292 "atomized" containers): postings are stored as
delta-gap varint byte blobs per block instead of Roaring containers, which
compresses dense time-ordered docIDs well and decodes to NumPy arrays with
zero per-element Python.

All functions operate on non-negative int64 values.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_SEVEN = _U64(7)
_MASK7 = _U64(0x7F)
_CONT = np.uint8(0x80)


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints, vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    # bytes needed per value: 1 + number of 7-bit groups above the first
    nb = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        nb += (v >= (_U64(1) << _U64(7 * k))).astype(np.int64)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(nb[:-1], out=starts[1:])
    total = int(starts[-1] + nb[-1])
    out = np.zeros(total, dtype=np.uint8)
    maxb = int(nb.max())
    for b in range(maxb):
        mask = nb > b
        idx = starts[mask] + b
        chunk = ((v[mask] >> _U64(7 * b)) & _MASK7).astype(np.uint8)
        cont = (nb[mask] - 1 > b)
        out[idx] = chunk | np.where(cont, _CONT, np.uint8(0))
    return out.tobytes()


def decode_varint(buf: bytes | memoryview) -> np.ndarray:
    """Decode LEB128 bytes to an int64 array, vectorized."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.int64)
    is_end = (raw & _CONT) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # group id for every byte
    gid = np.zeros(raw.size, dtype=np.int64)
    gid[starts[1:]] = 1
    np.cumsum(gid, out=gid)
    shift = (np.arange(raw.size, dtype=np.int64) - starts[gid]).astype(np.uint64)
    contrib = (raw.astype(np.uint64) & _MASK7) << (shift * _SEVEN)
    vals = np.add.reduceat(contrib, starts)
    return vals.astype(np.int64)


def encode_varint_grouped(
    values: np.ndarray, group_starts: np.ndarray, group_ends: np.ndarray
) -> list[bytes]:
    """LEB128-encode `values` once, sliced into one bytes blob per
    [start, end) group. Equivalent to `[encode_varint(values[s:e]) ...]`
    but with a single vectorized pass -- the per-group-call overhead
    dominates when a partition holds tens of thousands of small posting
    blocks."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return [b"" for _ in range(len(group_starts))]
    nb = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        nb += (v >= (_U64(1) << _U64(7 * k))).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nb, out=offsets[1:])
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    starts = offsets[:-1]
    maxb = int(nb.max())
    for b in range(maxb):
        mask = nb > b
        idx = starts[mask] + b
        chunk = ((v[mask] >> _U64(7 * b)) & _MASK7).astype(np.uint8)
        cont = (nb[mask] - 1 > b)
        out[idx] = chunk | np.where(cont, _CONT, np.uint8(0))
    buf = out.tobytes()
    bs = offsets[group_starts]
    be = offsets[group_ends]
    return [buf[s:e] for s, e in zip(bs.tolist(), be.tolist())]


def encode_postings_grouped(
    doc_ids: np.ndarray, group_starts: np.ndarray, group_ends: np.ndarray
) -> list[bytes]:
    """Delta-gap + varint encode per [start, end) group in one pass; each
    group's docIDs must be strictly increasing."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if ids.size == 0:
        return [b"" for _ in range(len(group_starts))]
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    gaps[group_starts] = ids[group_starts]
    interior = np.ones(ids.size, dtype=bool)
    interior[group_starts] = False
    if interior.any() and gaps[interior].min() <= 0:
        raise ValueError("doc_ids must be strictly increasing within groups")
    return encode_varint_grouped(gaps, group_starts, group_ends)


def encode_postings(doc_ids: np.ndarray) -> bytes:
    """Delta-gap + varint encode a strictly-increasing docID array."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if ids.size == 0:
        return b""
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    if ids.size > 1 and gaps[1:].min() <= 0:
        raise ValueError("doc_ids must be strictly increasing")
    return encode_varint(gaps)


def decode_postings(buf: bytes | memoryview) -> np.ndarray:
    """Inverse of encode_postings: bytes -> absolute docID int64 array."""
    gaps = decode_varint(buf)
    if gaps.size == 0:
        return gaps
    return np.cumsum(gaps)
