"""Delta + zig-zag + LEB128 codec for int64 arrays.

The ``ts`` / sorted-column codec: per-chunk ``np.diff`` then zig-zag (so
non-monotonic wobble stays cheap) then vectorized LEB128. Same scheme as
the reference's delta codec (reference src/varintDelta.c:41-104:
``[base][zigzag-varint deltas...]``), with LEB128 in place of the
reference's chained varint (identical format family,
src/varintChained.c:38-54).

Payload: ``[first: zigzag-leb128][deltas: zigzag-leb128 stream]`` — the
first value rides in the same stream (delta from 0), keeping the kernel a
single encode call.
"""

from __future__ import annotations

import numpy as np

from . import leb128, zigzag


def encode(values: np.ndarray, deltas: np.ndarray | None = None) -> bytes:
    """``deltas``: optional precomputed ``np.diff(v, prepend=0)`` (the
    selector shares one diff pass across sizers and the winner encode)."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return b""
    if deltas is None:
        deltas = np.diff(v, prepend=np.int64(0))  # first value = delta from 0
    return leb128.encode(zigzag.encode(deltas))


def decode(buf: memoryview | bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int64)
    deltas = zigzag.decode(leb128.decode(buf, count))
    return np.cumsum(deltas, dtype=np.int64)


def encoded_size(values: np.ndarray, deltas: np.ndarray | None = None) -> int:
    """Analytic size (no allocation of the output) for the selector."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return 0
    if deltas is None:
        deltas = np.diff(v, prepend=np.int64(0))
    return int(leb128.encoded_sizes(zigzag.encode(deltas)).sum())
