"""RLE (run-length encoding) codec for int64 arrays.

The run-heavy-column codec (``role`` after dict-coding, sparse ``tool``
columns). Mirrors the reference's RLE ``(run_length, value)`` pairs
(reference src/varintRLE.c:71-116) but stores the two streams planar
(all lengths, then all values) so both encode and decode stay fully
vectorized; the benefit predicate lives in the selector
(ref ``varintRLEIsBeneficial`` src/varintRLE.c:62-65).

Payload: ``[n_runs: leb128][run lengths: leb128 stream][run values: zigzag-leb128 stream]``
"""

from __future__ import annotations

import numpy as np

from . import blocks, leb128, zigzag


def run_bounds(v: np.ndarray) -> np.ndarray:
    """Start index of each run (vectorized run detection,
    ``np.flatnonzero(a[1:] != a[:-1])`` per SURVEY §2.A)."""
    if len(v) == 0:
        return np.empty(0, dtype=np.int64)
    return np.concatenate([[0], np.flatnonzero(v[1:] != v[:-1]) + 1]).astype(np.int64)


def encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return b""
    starts = run_bounds(v)
    lengths = np.diff(np.append(starts, len(v))).astype(np.uint64)
    run_vals = v[starts]
    return (
        blocks.put_uvarint(len(starts))
        + leb128.encode(lengths)
        + leb128.encode(zigzag.encode(run_vals))
    )


def decode(buf: memoryview | bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int64)
    mv = memoryview(buf)
    n_runs, pos = blocks.take_uvarint(mv, 0)
    rest = np.frombuffer(mv[pos:], dtype=np.uint8)
    term = (rest & 0x80) == 0
    ends = np.flatnonzero(term)
    len_stream_end = int(ends[n_runs - 1]) + 1
    lengths = leb128.decode(rest[:len_stream_end], n_runs).astype(np.int64)
    run_vals = zigzag.decode(leb128.decode(rest[len_stream_end:], n_runs))
    return np.repeat(run_vals, lengths)


def encoded_size(values: np.ndarray, starts: np.ndarray | None = None) -> int:
    """``starts``: optional precomputed :func:`run_bounds` output (the
    selector derives it from its shared diff pass)."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return 0
    if starts is None:
        starts = run_bounds(v)
    lengths = np.diff(np.append(starts, len(v))).astype(np.uint64)
    sz = int(leb128.encoded_sizes(lengths).sum())
    sz += int(leb128.encoded_sizes(zigzag.encode(v[starts])).sum())
    return sz + len(blocks.put_uvarint(len(starts)))
