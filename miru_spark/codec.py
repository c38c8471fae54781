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


def _byte_widths(v: np.ndarray) -> np.ndarray:
    """Bytes needed per value: 1 + number of 7-bit groups above the first.
    Stops scanning at the first width no value needs (posting gaps and tfs
    are overwhelmingly 1-2 bytes, so this is ~2 passes, not 9)."""
    nb = np.ones(v.size, dtype=np.int64)
    for k in range(1, 10):
        above = v >= (_U64(1) << _U64(7 * k))
        if not above.any():
            break
        nb += above.astype(np.int64)
    return nb


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints, vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    if int(v.max()) < 0x80:
        # every value fits one byte: the encoding IS the byte array
        return v.astype(np.uint8).tobytes()
    nb = _byte_widths(v)
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
    """Decode LEB128 bytes to an int64 array, vectorized.

    Work is proportional to the VALUE count (one masked gather per extra
    byte of width), not the byte count -- the all-single-byte case (most
    posting-gap and tf blobs) is a single astype."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.int64)
    is_cont = (raw & _CONT) != 0
    if not is_cont.any():
        return raw.astype(np.int64)
    ends = np.flatnonzero(~is_cont)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    nb = ends - starts + 1
    maxb = int(nb.max())
    # values of width <=4 fit 28 bits: accumulate in uint32 (half the
    # memory traffic of uint64; posting gaps/tfs/dls are all <=4 bytes)
    dt = np.uint32 if maxb <= 4 else np.uint64
    mask7 = dt(0x7F)
    if raw.size == ends.size * maxb:
        # uniform width (e.g. doc-length blobs are all 2-byte): strided
        # column views of a reshape, zero index gathers
        r = raw.reshape(-1, maxb)
        vals = (r[:, 0].astype(dt)) & mask7
        for b in range(1, maxb):
            vals |= (r[:, b].astype(dt) & mask7) << dt(7 * b)
        return vals.astype(np.int64)
    vals = (raw[starts].astype(dt)) & mask7
    for b in range(1, maxb):
        m = nb > b
        vals[m] |= (raw[starts[m] + b].astype(dt) & mask7) << dt(7 * b)
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
    if int(v.max()) < 0x80:
        # all single-byte: byte offsets == value offsets
        buf = v.astype(np.uint8).tobytes()
        return [
            buf[s:e]
            for s, e in zip(
                np.asarray(group_starts).tolist(),
                np.asarray(group_ends).tolist(),
            )
        ]
    nb = _byte_widths(v)
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


def decode_grouped_deltas(
    buf: bytes | memoryview, counts: np.ndarray
) -> np.ndarray:
    """Decode a varint blob of per-group delta-gapped values where the
    FIRST value of every group is absolute (the position-blob layout:
    one group per (doc, term) posting, `counts` = that posting's tf).
    Vectorized: one cumsum + a per-group-base rebase, no group loop."""
    gaps = decode_varint(buf)
    if gaps.size == 0:
        return gaps
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    starts = np.zeros(counts.size, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    acc = np.cumsum(gaps)
    base = acc[starts] - gaps[starts]
    return acc - np.repeat(base, counts)
