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


# ---- range operations (reference varintBitmapAddRange/RemoveRange,
# ---- src/varintBitmap.c:767-807) ---------------------------------------------
#
# The reference's range ops work inside one 16-bit container (large adds
# convert it to a single run). Here the same idea runs CONTAINER-LEVEL over
# the full id space: every 64Ki block strictly inside the range becomes one
# verbatim single-run container (add) or is dropped (remove) WITHOUT
# decoding its payload; only the ≤ 2 edge blocks decode, merge, and rechoose
# their container. Output is canonical: byte-equal to re-encoding the
# equivalent id set (single contiguous runs are exactly what _container_for
# emits), which the tests use as the oracle.

_LOW_MASK = 0xFFFF


def _single_run_verbatim(lo_low: int, hi_low: int):
    """(ctype, n, payload) for the contiguous low range [lo_low, hi_low] —
    byte-identical to what _container_for picks for one run (RUNS always
    wins the cost compare at 4 B + header vs 2n / 8192)."""
    n = hi_low - lo_low + 1
    runs = np.array([[lo_low, n - 1]], dtype="<u2")
    return (RUNS, n, memoryview(blocks.put_uvarint(1) + runs.tobytes()))


def _range_op(buf: bytes | memoryview, lo: int, hi: int, add: bool) -> bytes:
    if lo >= hi:  # the reference's early return (min >= max)
        return bytes(buf)
    hi_inc = hi - 1
    k_lo, k_hi = lo >> 16, hi_inc >> 16
    keys, entries = _block_index(buf)
    existing = {int(k): e for k, e in zip(keys, entries)}
    all_keys = sorted(set(existing) | set(range(k_lo, k_hi + 1))) if add \
        else sorted(existing)
    out = []
    for k in all_keys:
        in_range = k_lo <= k <= k_hi
        if not in_range:
            out.append((k, None, existing[k]))   # verbatim, no decode
            continue
        b_lo = (lo & _LOW_MASK) if k == k_lo else 0
        b_hi = (hi_inc & _LOW_MASK) if k == k_hi else _LOW_MASK
        full = b_lo == 0 and b_hi == _LOW_MASK
        if add:
            if full or k not in existing:
                # covered block: the union IS the range — emit one run,
                # never decoding whatever container was there. Spans of
                # ≤ 2 values go through _container_for (ARRAY wins its
                # cost tie there) to keep the output canonical.
                if b_hi - b_lo + 1 <= 2:
                    out.append((k, np.arange(b_lo, b_hi + 1,
                                             dtype=np.uint16), None))
                else:
                    out.append((k, None, _single_run_verbatim(b_lo, b_hi)))
            else:
                lows = _container_lows(*existing[k])
                merged = np.union1d(
                    lows, np.arange(b_lo, b_hi + 1, dtype=np.uint16))
                out.append((k, merged.astype(np.uint16), None))
        else:
            if full:
                continue                          # dropped, no decode
            lows = _container_lows(*existing[k])
            kept = lows[(lows < b_lo) | (lows > b_hi)]
            if len(kept):
                out.append((k, kept.astype(np.uint16), None))
    return _serialize_block(out)


def add_range(buf: bytes | memoryview, lo: int, hi: int) -> bytes:
    """Add the half-open id range [lo, hi) — varintBitmapAddRange
    (src/varintBitmap.c:767) lifted to the serialized multi-block form.
    Interior blocks are emitted as single-run containers without decoding;
    this is the natural builder for posting-list bitmaps from sorted runs."""
    return _range_op(buf, lo, hi, add=True)


def remove_range(buf: bytes | memoryview, lo: int, hi: int) -> bytes:
    """Remove the half-open id range [lo, hi) — varintBitmapRemoveRange
    (src/varintBitmap.c:807); fully-covered blocks are dropped from the
    block directory without their payloads ever being read."""
    return _range_op(buf, lo, hi, add=False)


# ---- iterator (reference varintBitmapCreateIterator/IteratorNext,
# ---- src/varintBitmap.c:644-705) ---------------------------------------------

def iter_blocks(buf: bytes | memoryview):
    """Lazily yield (block_key, sorted low-16 uint16 members) straight off
    the serialized form — one container parsed per step, later blocks'
    bytes untouched until requested (the streaming analog of the
    reference's cursor; vectorized at container granularity because a
    per-value Python cursor would be the slow path)."""
    mv = memoryview(buf)
    n_blocks, pos = blocks.take_uvarint(mv, 0)
    if n_blocks == 0:
        return
    key_bytes = np.frombuffer(mv[pos:], dtype=np.uint8)
    key_end = int(np.flatnonzero((key_bytes & 0x80) == 0)[n_blocks - 1]) + 1
    keys = np.cumsum(leb128.decode(key_bytes[:key_end], n_blocks))
    pos += key_end
    for i in range(n_blocks):
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
        yield int(keys[i]), _container_lows(ctype, n, mv[pos : pos + plen])
        pos += plen


def shard_serialized(buf: bytes | memoryview):
    """Split the serialized form at container boundaries WITHOUT decoding
    any payload: yields (block_key, standalone container bytes) where the
    container bytes are ``[ctype:1][n: leb128][payload]`` verbatim. This
    is how a bounded serialized bitmap is handed to executors — each shard
    covers one 64Ki id block and decodes independently (decode_shard), so
    the ids are born distributed instead of materializing on the driver."""
    keys, entries = _block_index(buf)
    for k, (ctype, n, payload) in zip(keys, entries):
        yield int(k), bytes([ctype]) + blocks.put_uvarint(n) + bytes(payload)


def decode_shard(container: bytes | memoryview) -> np.ndarray:
    """One shard_serialized container -> sorted low-16 uint16 members."""
    mv = memoryview(container)
    ctype = mv[0]
    n, pos = blocks.take_uvarint(mv, 1)
    return _container_lows(ctype, n, mv[pos:])


def iterator(buf: bytes | memoryview):
    """Yield ids ascending, one at a time — API parity with
    varintBitmapIteratorNext (src/varintBitmap.c:657). Bulk consumers
    should use iter_blocks (vectorized) instead."""
    for key, lows in iter_blocks(buf):
        base = key << 16
        for v in lows:
            yield base | int(v)


# ---- set algebra (reference src/varintBitmap.c:442-528) ----------------------

def bitmap_and(a: bytes, b: bytes) -> bytes:
    return _blockwise(a, b, "and")


def bitmap_or(a: bytes, b: bytes) -> bytes:
    return _blockwise(a, b, "or")


def bitmap_xor(a: bytes, b: bytes) -> bytes:
    return _blockwise(a, b, "xor")


def bitmap_andnot(a: bytes, b: bytes) -> bytes:
    return _blockwise(a, b, "andnot")
