"""Vectorized LEB128 (unsigned varint) encode/decode over uint64 arrays.

This is the integer backbone of the engine — the same wire format as the
reference's "chained" codec (continuation-bit varint, 7 payload bits per
byte; format documented at reference src/varintChained.c:38-54 and
src/varintChainedSimple.c:5-37).  Unlike the reference (per-value C loops)
the kernels here are fully vectorized numpy: encode builds at most 10 byte
planes with fancy indexing; decode segments the byte stream on terminal
bytes and reduces per-value with ``np.bitwise_or.reduceat``.

Values >= 2**63 use a 10th byte (only low bit meaningful), matching the
canonical unsigned-LEB128 encoding of 64-bit integers.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK7 = _U64(0x7F)
_CONT = np.uint8(0x80)

# Byte-count thresholds: a value needs k+1 bytes iff v >= 2**(7k).
_THRESHOLDS = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def encoded_sizes(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte counts (1..10) — also the reference-faithful
    'varint stream size' cost model used by the selector's cost gate."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    # one binary search against the 9 width thresholds beats 9 full
    # comparison passes: nbytes = #{k : v >= 2^(7k)} + 1
    return np.searchsorted(_THRESHOLDS, v, side="right") + 1


_SHIFTS = np.arange(10, dtype=np.uint64) * _U64(7)


def _width_matrix(vv: np.ndarray, w: int) -> np.ndarray:
    """(k, w) LEB128 byte matrix for values that all need exactly w bytes."""
    mat = (vv[:, None] >> _SHIFTS[None, :w]).astype(np.uint8)
    mat &= np.uint8(0x7F)
    if w > 1:
        mat[:, : w - 1] |= _CONT
    return mat


def encode(values: np.ndarray) -> bytes:
    """uint64 array -> LEB128 byte stream.

    Width-bucketed: values are grouped by encoded byte count (<= 10
    classes), each class emitted as a dense (k, w) matrix — no per-row
    boolean masking, and the common single-width case (e.g. small deltas)
    is a pure reshape with zero scatter."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    nbytes = encoded_sizes(v)
    lo, hi = int(nbytes.min()), int(nbytes.max())
    if lo == hi:  # single width: the stream IS the row-major matrix
        return _width_matrix(v, lo).tobytes()
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    offs = np.empty(n, dtype=np.int64)
    offs[0] = 0
    np.cumsum(nbytes[:-1], out=offs[1:])
    for w in range(lo, hi + 1):
        idx = np.flatnonzero(nbytes == w)
        if len(idx) == 0:
            continue
        vv = v[idx]
        base = offs[idx]
        for j in range(w):  # per byte position: no dest matrix, no u64 temp
            byte = ((vv >> _U64(7 * j)) & _MASK7).astype(np.uint8)
            if j < w - 1:
                byte |= _CONT
            out[base + j] = byte
    return out.tobytes()


def decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """LEB128 byte stream -> uint64 array.

    ``count`` (if given) is validated against the number of terminal bytes.
    """
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        if count:
            raise ValueError(f"expected {count} values, got empty buffer")
        return np.empty(0, dtype=np.uint64)
    is_term = (b & _CONT) == 0
    ends = np.flatnonzero(is_term)
    n_vals = len(ends)
    if count is not None and n_vals != count:
        raise ValueError(f"expected {count} values, found {n_vals} terminal bytes")
    if not is_term[-1]:
        raise ValueError("truncated LEB128 stream (no terminal byte at end)")
    # Width-bucketed decode: per byte-length class, gather the class's
    # bytes densely and fold with shifts — total gathered bytes equal the
    # stream length, vs maxb*n for the clipped gather-matrix approach.
    starts = np.empty(n_vals, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    lo, hi = int(lens.min()), int(lens.max())
    if hi > 10:
        raise ValueError("LEB128 value longer than 10 bytes")
    payload = b & np.uint8(0x7F)
    if lo == hi:  # single width: one reshape, no index gather
        mat = payload.reshape(n_vals, lo).astype(np.uint64)
        mat <<= _SHIFTS[None, :lo]
        return np.bitwise_or.reduce(mat, axis=1)
    out = np.empty(n_vals, dtype=np.uint64)
    for w in range(lo, hi + 1):
        idx = np.flatnonzero(lens == w)
        if len(idx) == 0:
            continue
        pos = starts[idx]
        acc = payload[pos].astype(np.uint64)
        for k in range(1, w):
            acc |= payload[pos + k].astype(np.uint64) << _U64(7 * k)
        out[idx] = acc
    return out
