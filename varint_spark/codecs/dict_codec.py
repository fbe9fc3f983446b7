"""Dictionary codec for int64 arrays.

Sorted unique values + bit-packed indices, mirroring the reference's dict
layout ``[dict_size][entries][count][indices]`` (reference
src/varintDict.c:95-224, build = qsort + unique) — here ``np.unique`` gives
both the sorted dictionary and the inverse indices in one vectorized call.
Dictionary entries are stored delta+LEB128 (they are sorted, so deltas are
small); indices are bit-packed at minimal width.

Payload::

    [n_unique: leb128][dict: zigzag-leb128 delta stream]
    [index_bit_width: 1][packed indices]
"""

from __future__ import annotations

import numpy as np

from . import bitpack, blocks, delta, leb128


def encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return b""
    uniq, inv = np.unique(v, return_inverse=True)
    width = bitpack.bits_needed(len(uniq) - 1)
    return (
        blocks.put_uvarint(len(uniq))
        + delta.encode(uniq)
        + bytes([width])
        + bitpack.pack(inv.astype(np.uint64), width)
    )


def decode(buf: memoryview | bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int64)
    mv = memoryview(buf)
    n_uniq, pos = blocks.take_uvarint(mv, 0)
    rest = np.frombuffer(mv[pos:], dtype=np.uint8)
    term = (rest & 0x80) == 0
    ends = np.flatnonzero(term)
    dict_end = int(ends[n_uniq - 1]) + 1
    uniq = delta.decode(rest[:dict_end], n_uniq)
    width = int(rest[dict_end])
    inv = bitpack.unpack(rest[dict_end + 1 :], width, count).astype(np.int64)
    return uniq[inv]


def encoded_size(values: np.ndarray) -> int:
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return 0
    uniq = np.unique(v)
    width = bitpack.bits_needed(len(uniq) - 1)
    return (
        len(blocks.put_uvarint(len(uniq)))
        + delta.encoded_size(uniq)
        + 1
        + bitpack.packed_size(len(v), width)
    )
