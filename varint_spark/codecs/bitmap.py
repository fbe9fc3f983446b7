"""Roaring-style compressed integer-set codec.

Parity with the reference's ``varintBitmap`` (reference
src/varintBitmap.h:29-66, src/varintBitmap.c): the id space is split into
64Ki-value blocks keyed by the high bits; each block stores its low-16-bit
members in whichever container is smallest:

* ARRAY  — sorted uint16 list (cardinality ≤ 4096, 2 B/value;
  reference threshold src/varintBitmap.h:36-40)
* BITMAP — 8 KiB bitset (dense blocks)
* RUNS   — (start, length) uint16 pairs (clustered blocks)

All construction is vectorized numpy over a sorted uint64 id array.
Set algebra (AND/OR/XOR/ANDNOT — reference src/varintBitmap.c:442-528)
operates on the sorted-array form via numpy set ops; ``contains`` is a
binary search (``varintBitmapContains``).

Layout::

    [n_blocks: leb128]
    per block: [key_delta: leb128][container: 1][n: leb128][payload]
"""

from __future__ import annotations

import numpy as np

from . import blocks, leb128

ARRAY, BITMAP, RUNS = 0, 1, 2
ARRAY_MAX = 4096  # reference threshold (src/varintBitmap.h:36-40)


def _container_for(lows: np.ndarray) -> tuple[int, bytes]:
    """Choose the smallest container for one block's sorted low-16 members."""
    n = len(lows)
    run_starts = np.concatenate([[0], np.flatnonzero(np.diff(lows) != 1) + 1])
    n_runs = len(run_starts)
    sizes = {ARRAY: 2 * n, BITMAP: 8192, RUNS: 4 * n_runs}
    best = min(sizes, key=sizes.get)
    if best == ARRAY:
        return ARRAY, lows.astype("<u2").tobytes()
    if best == BITMAP:
        bits = np.zeros(65536, dtype=np.uint8)
        bits[lows] = 1
        return BITMAP, np.packbits(bits, bitorder="little").tobytes()
    lengths = np.diff(np.append(run_starts, n))
    runs = np.empty((n_runs, 2), dtype="<u2")
    runs[:, 0] = lows[run_starts]
    runs[:, 1] = (lengths - 1).astype(np.uint16)  # length-1: a full 64Ki run fits
    return RUNS, blocks.put_uvarint(n_runs) + runs.tobytes()


def encode(ids: np.ndarray) -> bytes:
    """Sorted-or-not uint64 id array (duplicates ok) -> bitmap bytes."""
    v = np.unique(np.ascontiguousarray(ids, dtype=np.uint64))
    highs = (v >> np.uint64(16)).astype(np.uint64)
    lows = (v & np.uint64(0xFFFF)).astype(np.uint16)
    keys, first = np.unique(highs, return_index=True)
    bounds = np.append(first, len(v))
    out = [blocks.put_uvarint(len(keys)),
           leb128.encode(np.diff(keys, prepend=np.uint64(0)))]
    for i, k in enumerate(keys):
        blk_lows = lows[bounds[i] : bounds[i + 1]]
        ctype, payload = _container_for(blk_lows)
        out.append(bytes([ctype]) + blocks.put_uvarint(len(blk_lows)) + payload)
    return b"".join(out)


def decode(buf: memoryview | bytes) -> np.ndarray:
    """bitmap bytes -> sorted uint64 id array."""
    mv = memoryview(buf)
    n_blocks, pos = blocks.take_uvarint(mv, 0)
    if n_blocks == 0:
        return np.empty(0, dtype=np.uint64)
    key_bytes = np.frombuffer(mv[pos:], dtype=np.uint8)
    term = (key_bytes & 0x80) == 0
    key_end = int(np.flatnonzero(term)[n_blocks - 1]) + 1
    keys = np.cumsum(leb128.decode(key_bytes[:key_end], n_blocks))
    pos += key_end
    parts = []
    for i in range(n_blocks):
        ctype = mv[pos]
        pos += 1
        n, pos = blocks.take_uvarint(mv, pos)
        if ctype == ARRAY:
            lows = np.frombuffer(mv[pos : pos + 2 * n], dtype="<u2").astype(np.uint64)
            pos += 2 * n
        elif ctype == BITMAP:
            bits = np.unpackbits(np.frombuffer(mv[pos : pos + 8192], dtype=np.uint8),
                                 bitorder="little")
            lows = np.flatnonzero(bits).astype(np.uint64)
            pos += 8192
        else:
            n_runs, pos = blocks.take_uvarint(mv, pos)
            runs = np.frombuffer(mv[pos : pos + 4 * n_runs], dtype="<u2").reshape(-1, 2)
            pos += 4 * n_runs
            starts = runs[:, 0].astype(np.uint64)
            lengths = runs[:, 1].astype(np.int64) + 1
            offs = np.arange(int(lengths.sum()), dtype=np.uint64)
            seg0 = np.zeros(n_runs, dtype=np.int64)
            np.cumsum(lengths[:-1], out=seg0[1:])
            lows = np.repeat(starts, lengths) + (offs - np.repeat(seg0.astype(np.uint64), lengths))
        parts.append((keys[i] << np.uint64(16)) | lows)
    return np.concatenate(parts)


def contains(buf: memoryview | bytes, value: int) -> bool:
    """Membership test (decodes only for simplicity; the per-block binary
    search optimization is noted as future work — SURVEY §2.A.5)."""
    ids = decode(buf)
    i = np.searchsorted(ids, np.uint64(value))
    return bool(i < len(ids) and ids[i] == np.uint64(value))


# ---- set algebra (reference src/varintBitmap.c:442-528) ----------------------

def bitmap_and(a: bytes, b: bytes) -> bytes:
    return encode(np.intersect1d(decode(a), decode(b), assume_unique=True))


def bitmap_or(a: bytes, b: bytes) -> bytes:
    return encode(np.union1d(decode(a), decode(b)))


def bitmap_xor(a: bytes, b: bytes) -> bytes:
    return encode(np.setxor1d(decode(a), decode(b), assume_unique=True))


def bitmap_andnot(a: bytes, b: bytes) -> bytes:
    return encode(np.setdiff1d(decode(a), decode(b), assume_unique=True))
