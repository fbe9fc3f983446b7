"""BP128-style block-granular delta codec: 128-value blocks, per-block
min bit-width, absolute first value per block.

Mirrors the reference's flagship codec layout (reference
src/varintBP128.c:167-214 delta blocks ``[bitWidth][first:varint]
[127 packed deltas]``; block granularity rationale src/varintBP128.h:24-35;
prevValue threading :347-427) with one deliberate change: block firsts are
hoisted into ONE frame-of-reference sub-block and the per-block bit widths
into one byte array, so random access needs only the tiny header arrays —
a point lookup unpacks exactly one 128-value block (O(1) per block,
the property the 64Ki-chunk codecs lack for delta streams).

Payload::

    [firsts: sub-block = FOR(min zz-leb128, width, packed offsets)]
    [widths: 1 byte per block]
    [per block: ceil(c_i * w_i / 8) bytes of bit-packed zigzag deltas]
      (c_i = 127, except the tail block)

Block byte offsets are a running sum of the widths array — derivable from
the header alone, never from the data bytes.
"""

from __future__ import annotations

import numpy as np

from . import blocks, foref, zigzag

BLOCK = 128

_POW2 = np.concatenate([[0], np.uint64(1) << np.arange(64, dtype=np.uint64)]).astype(np.uint64)


def _bits_needed(mx: np.ndarray) -> np.ndarray:
    """Exact per-element bit length via searchsorted (no float log)."""
    return np.searchsorted(_POW2, mx.astype(np.uint64), side="right").astype(np.int64) - 1


def _layout(n: int) -> tuple[int, np.ndarray]:
    n_blocks = (n + BLOCK - 1) // BLOCK
    counts = np.full(n_blocks, BLOCK - 1, dtype=np.int64)
    counts[-1] = n - BLOCK * (n_blocks - 1) - 1
    return n_blocks, counts  # stored deltas per block


def _stored_mask(n: int) -> np.ndarray:
    """Mask over the n-1 deltas: delta j (v[j] -> v[j+1]) is stored iff
    v[j+1] is not a block first."""
    keep = np.ones(n - 1, dtype=bool)
    keep[BLOCK - 1 :: BLOCK] = False
    return keep


def _pack_rows(rows: np.ndarray, width: int) -> np.ndarray:
    """(k, c) uint64 -> (k, ceil(c*width/8)) bit-packed rows (LSB-first)."""
    k, c = rows.shape
    if width == 0 or c == 0:
        return np.zeros((k, (c * width + 7) // 8), dtype=np.uint8)
    bits = (rows[:, :, None] >> np.arange(width, dtype=np.uint64)) & np.uint64(1)
    return np.packbits(bits.reshape(k, c * width).astype(np.uint8),
                       axis=1, bitorder="little")


def _unpack_rows(data: np.ndarray, width: int, c: int) -> np.ndarray:
    """(k, bpb) packed bytes -> (k, c) uint64 values."""
    k = data.shape[0]
    if width == 0 or c == 0:
        return np.zeros((k, c), dtype=np.uint64)
    bits = np.unpackbits(data, axis=1, bitorder="little")[:, : c * width]
    bits = bits.reshape(k, c, width).astype(np.uint64)
    return (bits << np.arange(width, dtype=np.uint64)[None, None, :]).sum(
        axis=2, dtype=np.uint64)


def _header(v: np.ndarray):
    n = len(v)
    n_blocks, counts = _layout(n)
    firsts = v[::BLOCK]
    zz = zigzag.encode(np.diff(v)) if n > 1 else np.empty(0, dtype=np.uint64)
    stored = zz[_stored_mask(n)] if n > 1 else zz
    bounds = np.zeros(n_blocks + 1, dtype=np.int64)
    np.cumsum(counts, out=bounds[1:])
    if len(stored):
        mx = np.zeros(n_blocks, dtype=np.uint64)
        nonempty = counts > 0
        mx[nonempty] = np.maximum.reduceat(stored, bounds[:-1][nonempty])
        widths = _bits_needed(mx)
        widths[~nonempty] = 0
    else:
        widths = np.zeros(n_blocks, dtype=np.int64)
    sizes = (counts * widths + 7) // 8
    return n_blocks, counts, firsts, stored, bounds, widths, sizes


def encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return b""
    n_blocks, counts, firsts, stored, bounds, widths, sizes = _header(v)
    offs = np.zeros(n_blocks, dtype=np.int64)
    np.cumsum(sizes[:-1], out=offs[1:])
    data = np.zeros(int(sizes.sum()), dtype=np.uint8)
    full = counts == BLOCK - 1
    for w in np.unique(widths):
        w = int(w)
        if w == 0:
            continue
        sel = np.flatnonzero((widths == w) & full)
        if len(sel):
            rows = stored[bounds[sel][:, None] + np.arange(BLOCK - 1)]
            packed = _pack_rows(rows, w)
            dest = offs[sel][:, None] + np.arange(packed.shape[1])
            data[dest.ravel()] = packed.ravel()
    last = n_blocks - 1
    if not full[last] and widths[last] > 0 and counts[last] > 0:
        rows = stored[bounds[last] : bounds[last + 1]][None, :]
        packed = _pack_rows(rows, int(widths[last]))
        data[offs[last] : offs[last] + packed.shape[1]] = packed[0]
    return b"".join([
        blocks.put_sub(foref.encode(np.asarray(firsts, dtype=np.int64))),
        widths.astype(np.uint8).tobytes(),
        data.tobytes(),
    ])


def decode(buf: memoryview | bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int64)
    mv = memoryview(buf)
    firsts_sub, pos = blocks.take_sub(mv, 0)
    n_blocks, counts = _layout(count)
    firsts = foref.decode(firsts_sub, n_blocks)
    widths = np.frombuffer(mv[pos : pos + n_blocks], dtype=np.uint8).astype(np.int64)
    pos += n_blocks
    sizes = (counts * widths + 7) // 8
    offs = np.zeros(n_blocks, dtype=np.int64)
    np.cumsum(sizes[:-1], out=offs[1:])
    data = np.frombuffer(mv[pos:], dtype=np.uint8)
    bounds = np.zeros(n_blocks + 1, dtype=np.int64)
    np.cumsum(counts, out=bounds[1:])
    stored = np.zeros(int(counts.sum()), dtype=np.uint64)
    full = counts == BLOCK - 1
    for w in np.unique(widths):
        w = int(w)
        if w == 0:
            continue
        sel = np.flatnonzero((widths == w) & full)
        if len(sel):
            bpb = ((BLOCK - 1) * w + 7) // 8
            rows = data[offs[sel][:, None] + np.arange(bpb)]
            vals = _unpack_rows(rows, w, BLOCK - 1)
            stored[bounds[sel][:, None] + np.arange(BLOCK - 1)] = vals
    last = n_blocks - 1
    if not full[last] and widths[last] > 0 and counts[last] > 0:
        bpb = int(sizes[last])
        rows = data[offs[last] : offs[last] + bpb][None, :]
        stored[bounds[last] : bounds[last + 1]] = _unpack_rows(
            rows, int(widths[last]), int(counts[last]))[0]
    # rebuild the value stream: absolute firsts at block starts, deltas
    # elsewhere; segdelta-style double-cumsum reconstruction
    x = np.empty(count, dtype=np.int64)
    x[::BLOCK] = firsts
    if count > 1:
        dmask = np.ones(count, dtype=bool)
        dmask[::BLOCK] = False
        x[dmask] = zigzag.decode(stored)
    cs = np.cumsum(x, dtype=np.int64)
    starts = np.arange(0, count, BLOCK, dtype=np.int64)
    seg_lens = np.minimum(BLOCK, count - starts)
    base = np.where(starts > 0, cs[starts - 1], np.int64(0))
    return cs - np.repeat(base, seg_lens)


def encoded_size(values: np.ndarray) -> int:
    """Exact analytic size (the cost-gate contract)."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return 0
    n_blocks, counts, firsts, stored, bounds, widths, sizes = _header(v)
    fsz = foref.encoded_size(np.asarray(firsts, dtype=np.int64))
    return len(blocks.put_uvarint(fsz)) + fsz + n_blocks + int(sizes.sum())


def get_range(payload: memoryview | bytes, count: int, start: int, n: int) -> np.ndarray:
    """values[start:start+n] unpacking ONLY the covering 128-value blocks
    (+ the tiny header arrays) — the BP128 random-access property."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    mv = memoryview(payload)
    firsts_sub, pos = blocks.take_sub(mv, 0)
    n_blocks, counts = _layout(count)
    widths = np.frombuffer(mv[pos : pos + n_blocks], dtype=np.uint8).astype(np.int64)
    data_start = pos + n_blocks
    sizes = (counts * widths + 7) // 8
    offs = np.zeros(n_blocks, dtype=np.int64)
    np.cumsum(sizes[:-1], out=offs[1:])
    b0, b1 = start // BLOCK, (start + n - 1) // BLOCK
    from .random_access import for_get_range  # header-only firsts slice

    firsts = for_get_range(firsts_sub, n_blocks, b0, b1 - b0 + 1)
    out = np.empty((b1 - b0 + 1) * BLOCK, dtype=np.int64)
    filled = 0
    data = np.frombuffer(mv[data_start:], dtype=np.uint8)
    for bi in range(b0, b1 + 1):
        c = int(counts[bi])
        w = int(widths[bi])
        rows = data[offs[bi] : offs[bi] + sizes[bi]][None, :]
        zz = _unpack_rows(rows, w, c)[0] if w else np.zeros(c, dtype=np.uint64)
        vals = np.empty(c + 1, dtype=np.int64)
        vals[0] = firsts[bi - b0]
        if c:
            np.cumsum(zigzag.decode(zz), out=vals[1:])
            vals[1:] += vals[0]
        out[filled : filled + c + 1] = vals
        filled += c + 1
    lo = start - b0 * BLOCK
    return out[lo : lo + n]


def filter_ge(payload: memoryview | bytes, count: int, c: int) -> np.ndarray:
    """``v >= c`` per value, decoding ONLY the 128-value blocks whose
    conservative value bounds straddle ``c`` — the encoded-form predicate
    path (reference partial-decode surface, src/varintFOR.c:597 decode-
    only-needed-blocks applied to the predicate itself).

    A width-w zigzag delta is bounded by 2^(w-1), so block i's values lie
    within ``first_i ± stored_i * 2^(w_i - 1)`` — resolvable from the tiny
    header arrays alone. Blocks entirely >= c (or entirely < c) never
    touch their data bytes; only straddling blocks unpack."""
    if count == 0:
        return np.zeros(0, dtype=bool)
    mv = memoryview(payload)
    firsts_sub, pos = blocks.take_sub(mv, 0)
    n_blocks, counts = _layout(count)
    firsts = foref.decode(firsts_sub, n_blocks)
    widths = np.frombuffer(mv[pos: pos + n_blocks], dtype=np.uint8).astype(np.int64)
    sizes = (counts * widths + 7) // 8
    offs = np.zeros(n_blocks, dtype=np.int64)
    np.cumsum(sizes[:-1], out=offs[1:])
    data = np.frombuffer(mv[pos + n_blocks:], dtype=np.uint8)
    out = np.empty(count, dtype=bool)
    c = int(c)
    for bi in range(n_blocks):  # loop over 128-value blocks, not values
        first, w, nd = int(firsts[bi]), int(widths[bi]), int(counts[bi])
        spread = (nd << (w - 1)) if w else 0  # python ints: no overflow
        s = bi * BLOCK
        e = min(s + BLOCK, count)
        if first - spread >= c:
            out[s:e] = True
        elif first + spread < c:
            out[s:e] = False
        else:
            rows = data[offs[bi]: offs[bi] + sizes[bi]][None, :]
            zz = (_unpack_rows(rows, w, nd)[0] if w
                  else np.zeros(nd, dtype=np.uint64))
            vals = np.empty(nd + 1, dtype=np.int64)
            vals[0] = first
            if nd:
                np.cumsum(zigzag.decode(zz), out=vals[1:])
                vals[1:] += vals[0]
            out[s:e] = vals >= c
    return out
