"""PFOR (patched frame-of-reference) codec for int64 arrays.

FOR with an exception list for outliers, so a few huge values don't blow up
the bit width for the whole chunk. Mirrors the reference's PFOR
(reference src/varintPFOR.c:128-188: percentile threshold via
``varintPFORComputeThreshold`` src/varintPFOR.c:47-101, then
``[min][width][count][values][exc_count][(idx,val)...]``).

Payload::

    [min: zigzag-leb128][bit_width: 1]
    [packed offsets, exceptions stored as 0]
    [n_exceptions: leb128]
    [exception positions: delta-leb128 stream]
    [exception offsets: leb128 stream]
"""

from __future__ import annotations

import numpy as np

from . import bitpack, blocks, leb128, zigzag
from .foref import _offsets

def _best_width(offs: np.ndarray) -> int:
    """Cost-optimal body bit width: sweep all widths vectorized, charging
    each exception its actual LEB128 value size plus ~2 bytes of position.

    Strictly dominates the reference's fixed 90/95/99-percentile threshold
    (src/varintPFOR.c:47-101) — same idea (cut the tail), exact cost model.
    """
    n = len(offs)
    so = np.sort(offs)
    val_sizes = leb128.encoded_sizes(so).astype(np.int64)
    suffix = np.concatenate([np.cumsum(val_sizes[::-1])[::-1], [0]])  # bytes for tail >= idx
    widths = np.arange(1, 65, dtype=np.int64)
    bounds = np.zeros(64, dtype=np.uint64)
    bounds[:63] = np.uint64(1) << widths[:63].astype(np.uint64)
    bounds[63] = np.uint64(0xFFFFFFFFFFFFFFFF)
    first_exc = np.searchsorted(so, bounds, side="left")
    first_exc[63] = n  # width 64 packs everything
    n_exc = n - first_exc
    cost = (n * widths + 7) // 8 + suffix[first_exc] + 2 * n_exc
    return int(widths[np.argmin(cost)])


def encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return b""
    mn, offs = _offsets(v)
    width = _best_width(offs)
    limit = np.uint64((1 << width) - 1) if width < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    exc_mask = offs > limit
    exc_pos = np.flatnonzero(exc_mask).astype(np.int64)
    exc_vals = offs[exc_mask]
    body = offs.copy()
    body[exc_mask] = 0
    out = [
        leb128.encode(zigzag.encode(np.array([mn], dtype=np.int64))),
        bytes([width]),
        bitpack.pack(body, width),
        blocks.put_uvarint(len(exc_pos)),
        leb128.encode(np.diff(exc_pos, prepend=np.int64(0)).astype(np.uint64)),
        leb128.encode(exc_vals),
    ]
    return b"".join(out)


def decode(buf: memoryview | bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int64)
    mv = memoryview(buf)
    mn_zz, pos = blocks.take_uvarint(mv, 0)
    mn = int(zigzag.decode(np.array([mn_zz], dtype=np.uint64))[0])
    width = mv[pos]
    pos += 1
    body_len = bitpack.packed_size(count, width)
    offs = bitpack.unpack(np.frombuffer(mv[pos : pos + body_len], dtype=np.uint8), width, count)
    pos += body_len
    n_exc, pos = blocks.take_uvarint(mv, pos)
    if n_exc:
        rest = np.frombuffer(mv[pos:], dtype=np.uint8)
        # positions stream then values stream: split on value count
        term = (rest & 0x80) == 0
        ends = np.flatnonzero(term)
        pos_stream_end = int(ends[n_exc - 1]) + 1
        exc_pos = np.cumsum(leb128.decode(rest[:pos_stream_end], n_exc).view(np.int64))
        exc_vals = leb128.decode(rest[pos_stream_end:], n_exc)
        offs[exc_pos] = exc_vals
    return (offs + np.int64(mn).astype(np.uint64)).view(np.int64)


def encoded_size(values: np.ndarray, mn_offs=None) -> int:
    """Analytic size via the same cost sweep encode uses (exact).
    ``mn_offs``: optional precomputed ``(min, offsets)``."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return 0
    mn, offs = mn_offs if mn_offs is not None else _offsets(v)
    width = _best_width(offs)
    limit = np.uint64((1 << width) - 1) if width < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    exc_mask = offs > limit
    exc_pos = np.flatnonzero(exc_mask).astype(np.int64)
    exc_vals = offs[exc_mask]
    zz = zigzag.encode(np.array([mn], dtype=np.int64))
    sz = int(leb128.encoded_sizes(zz)[0]) + 1
    sz += bitpack.packed_size(len(v), width)
    sz += len(blocks.put_uvarint(len(exc_pos)))
    if len(exc_pos):
        sz += int(leb128.encoded_sizes(np.diff(exc_pos, prepend=np.int64(0)).astype(np.uint64)).sum())
        sz += int(leb128.encoded_sizes(exc_vals).sum())
    return sz
