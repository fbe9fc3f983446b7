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
    # nbytes = 1 + sum_k [v >= 2^(7k)]   (k = 1..9)
    nbytes = np.ones(len(v), dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (v >= t).astype(np.int64)
    return nbytes


_TILE = 1 << 20  # values per tile: bounds the (tile, 10) scratch to ~10-80 MB
_SHIFTS = np.arange(10, dtype=np.uint64) * _U64(7)
_PLANE_IDX = np.arange(10, dtype=np.int64)


def _encode_tile(v: np.ndarray, nbytes: np.ndarray, out: np.ndarray, pos: int) -> int:
    """Emit one tile: build the (n, maxb) byte matrix, mark continuation
    bits, then extract the per-row valid prefixes in one boolean-mask pass
    (C-order extraction concatenates rows — exactly the LEB128 stream)."""
    maxb = int(nbytes.max())
    planes = (v[:, None] >> _SHIFTS[None, :maxb]).astype(np.uint8)
    planes &= np.uint8(0x7F)
    cont = _PLANE_IDX[None, :maxb] < (nbytes[:, None] - 1)
    planes[cont] |= _CONT
    valid = _PLANE_IDX[None, :maxb] < nbytes[:, None]
    chunk = planes[valid]
    out[pos : pos + len(chunk)] = chunk
    return pos + len(chunk)


def encode(values: np.ndarray) -> bytes:
    """uint64 array -> LEB128 byte stream."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    nbytes = encoded_sizes(v)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    pos = 0
    for start in range(0, n, _TILE):
        end = min(start + _TILE, n)
        pos = _encode_tile(v[start:end], nbytes[start:end], out, pos)
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
    # Gather-matrix decode: (n, maxb) byte matrix per value, mask the tail,
    # fold with shifts — fewer passes than per-byte segment arithmetic.
    starts = np.empty(n_vals, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    maxb = int(lens.max())
    if maxb > 10:
        raise ValueError("LEB128 value longer than 10 bytes")
    idx = starts[:, None] + np.arange(maxb, dtype=np.int64)[None, :]
    np.clip(idx, 0, len(b) - 1, out=idx)
    mat = (b[idx] & np.uint8(0x7F)).astype(np.uint64)
    mat *= np.arange(maxb, dtype=np.int64)[None, :] < lens[:, None]
    mat <<= (np.arange(maxb, dtype=np.uint64) * _U64(7))[None, :]
    return np.bitwise_or.reduce(mat, axis=1)
