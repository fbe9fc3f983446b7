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
is CONTAINER-LEVEL on the serialized form: only blocks whose 64Ki keys
collide are decoded; one-sided blocks are verbatim-copied (OR/XOR) or
skipped (AND/ANDNOT) without touching their payload bytes. ``contains``
binary-searches the block keys then tests inside one container
(``varintBitmapContains``) — the rest of the bitmap's bytes are never
read.

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


def _block_index(buf: memoryview | bytes):
    """Walk the serialized form WITHOUT decoding payloads: returns
    (keys uint64[], list of (ctype, n, payload memoryview)). Payload
    lengths come from the per-block headers alone (ARRAY 2n, BITMAP 8 KiB,
    RUNS n_runs uvarint + 4*n_runs), so indexing touches only headers —
    the container-level-algebra backbone (reference operates per container
    without materializing, src/varintBitmap.c:442-528)."""
    mv = memoryview(buf)
    n_blocks, pos = blocks.take_uvarint(mv, 0)
    if n_blocks == 0:
        return np.empty(0, dtype=np.uint64), []
    key_bytes = np.frombuffer(mv[pos:], dtype=np.uint8)
    term = (key_bytes & 0x80) == 0
    key_end = int(np.flatnonzero(term)[n_blocks - 1]) + 1
    keys = np.cumsum(leb128.decode(key_bytes[:key_end], n_blocks))
    pos += key_end
    entries = []
    for _ in range(n_blocks):
        ctype = mv[pos]
        pos += 1
        n, pos = blocks.take_uvarint(mv, pos)
        if ctype == ARRAY:
            plen = 2 * n
        elif ctype == BITMAP:
            plen = 8192
        else:
            n_runs, runs_pos = blocks.take_uvarint(mv, pos)
            plen = (runs_pos - pos) + 4 * n_runs
        entries.append((ctype, n, mv[pos : pos + plen]))
        pos += plen
    return keys, entries


def _container_lows(ctype: int, n: int, payload: memoryview) -> np.ndarray:
    """One container's sorted low-16 members (decodes only this block)."""
    if ctype == ARRAY:
        return np.frombuffer(payload, dtype="<u2").astype(np.uint16)
    if ctype == BITMAP:
        bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8), bitorder="little")
        return np.flatnonzero(bits).astype(np.uint16)
    n_runs, pos = blocks.take_uvarint(payload, 0)
    runs = np.frombuffer(payload[pos : pos + 4 * n_runs], dtype="<u2").reshape(-1, 2)
    starts = runs[:, 0].astype(np.int64)
    lengths = runs[:, 1].astype(np.int64) + 1
    seg0 = np.zeros(n_runs, dtype=np.int64)
    np.cumsum(lengths[:-1], out=seg0[1:])
    offs = np.arange(int(lengths.sum()), dtype=np.int64)
    return (np.repeat(starts, lengths) + (offs - np.repeat(seg0, lengths))).astype(np.uint16)


def contains(buf: memoryview | bytes, value: int) -> bool:
    """Membership test touching ONE block: binary-search the block keys,
    then ARRAY -> searchsorted on the raw u2 view, BITMAP -> one bit test,
    RUNS -> binary search of run starts (``varintBitmapContains``)."""
    keys, entries = _block_index(buf)
    high, low = value >> 16, value & 0xFFFF
    i = int(np.searchsorted(keys, np.uint64(high)))
    if i >= len(keys) or int(keys[i]) != high:
        return False
    ctype, n, payload = entries[i]
    if ctype == ARRAY:
        arr = np.frombuffer(payload, dtype="<u2")
        j = int(np.searchsorted(arr, np.uint16(low)))
        return j < len(arr) and int(arr[j]) == low
    if ctype == BITMAP:
        byte = payload[low >> 3]
        return bool((byte >> (low & 7)) & 1)
    n_runs, pos = blocks.take_uvarint(payload, 0)
    runs = np.frombuffer(payload[pos : pos + 4 * n_runs], dtype="<u2").reshape(-1, 2)
    j = int(np.searchsorted(runs[:, 0], np.uint16(low), side="right")) - 1
    return j >= 0 and int(runs[j, 0]) + int(runs[j, 1]) >= low


def _serialize_block(key_lows: list[tuple[int, np.ndarray | None, tuple | None]]) -> bytes:
    """Assemble bitmap bytes from (key, lows | None, verbatim | None)
    entries: ``verbatim`` = (ctype, n, payload) copied without re-encoding."""
    keys = np.array([k for k, _, _ in key_lows], dtype=np.uint64)
    out = [blocks.put_uvarint(len(keys)),
           leb128.encode(np.diff(keys, prepend=np.uint64(0)))]
    for _, lows, verb in key_lows:
        if verb is not None:
            ctype, n, payload = verb
            out.append(bytes([ctype]) + blocks.put_uvarint(n) + bytes(payload))
        else:
            ctype, payload = _container_for(lows)
            out.append(bytes([ctype]) + blocks.put_uvarint(len(lows)) + payload)
    return b"".join(out)


def _blockwise(a: bytes, b: bytes, op: str) -> bytes:
    """Container-level set algebra: blocks present on one side only are
    verbatim-copied (OR/XOR) or skipped (AND/ANDNOT) without decoding;
    only blocks whose keys collide decode their two containers."""
    ka, ea = _block_index(a)
    kb, eb = _block_index(b)
    ia = {int(k): e for k, e in zip(ka, ea)}
    ib = {int(k): e for k, e in zip(kb, eb)}
    out = []
    for k in sorted(set(ia) | set(ib)):
        in_a, in_b = k in ia, k in ib
        if in_a and in_b:
            la = _container_lows(*ia[k])
            lb = _container_lows(*ib[k])
            if op == "and":
                lows = np.intersect1d(la, lb, assume_unique=True)
            elif op == "or":
                lows = np.union1d(la, lb)
            elif op == "xor":
                lows = np.setxor1d(la, lb, assume_unique=True)
            else:
                lows = np.setdiff1d(la, lb, assume_unique=True)
            if len(lows):
                out.append((k, lows.astype(np.uint16), None))
        elif in_a and op in ("or", "xor", "andnot"):
            out.append((k, None, ia[k]))       # verbatim copy, no decode
        elif in_b and op in ("or", "xor"):
            out.append((k, None, ib[k]))       # verbatim copy, no decode
    return _serialize_block(out)


# ---- set algebra (reference src/varintBitmap.c:442-528) ----------------------

def bitmap_and(a: bytes, b: bytes) -> bytes:
    return _blockwise(a, b, "and")


def bitmap_or(a: bytes, b: bytes) -> bytes:
    return _blockwise(a, b, "or")


def bitmap_xor(a: bytes, b: bytes) -> bytes:
    return _blockwise(a, b, "xor")


def bitmap_andnot(a: bytes, b: bytes) -> bytes:
    return _blockwise(a, b, "andnot")
