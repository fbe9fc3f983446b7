"""Segmented delta codec — delta+zigzag+LEB128 *within* segments
(conversations), absolute value at each segment start.

The transcript ``ts`` column is monotonic within a conversation but jumps
wildly between conversations inside a chunk (chunks are sorted by
(conv_id, turn_idx)). Plain delta pays ~7-byte zigzag varints at every
boundary and loses to FOR; segment-aware delta restarts at each
conversation, mirroring how the reference threads ``prevValue`` across
BP128 blocks (reference src/varintBP128.c:347-427) and how its delta
codec stores an absolute base (src/varintDelta.c:41-74).

Payload::

    [n_segs: leb128][segment lengths: leb128 stream][scale: leb128]
    [stream/scale: NESTED self-describing int block — absolute value at
     seg starts, deltas inside]

``scale`` is the GCD of the whole stream — the integer analog of the
reference float codec's precision modes (src/varintFloat.h:27-114):
second- or ms-precision timestamps stored as µs are exact multiples of
10^6/10^3, so dividing by the GCD shrinks every varint by ~2-3 bytes.

The delta stream is re-encoded by the adaptive int selector, so constant
deltas collapse to RLE (turn_idx: ~0 bytes/value), bounded deltas get
FOR+bitpack (ts: ~3 bytes vs 4 for zigzag-leb128) — the BP128
delta-then-bitpack composition (reference src/varintBP128.c:347-427).
Decode is two cumsums: global cumsum of the stream, minus the cumsum at
each segment's predecessor (wrap-around int64 arithmetic keeps the round
trip bit-exact even on overflow).
"""

from __future__ import annotations

import numpy as np

from . import blocks, leb128, zigzag


def _stream(v: np.ndarray, seg_lengths: np.ndarray) -> np.ndarray:
    starts = np.zeros(len(seg_lengths), dtype=np.int64)
    np.cumsum(seg_lengths[:-1], out=starts[1:])
    x = np.diff(v, prepend=np.int64(0))
    # at segment starts the stream carries v[start] - (previous element or 0);
    # replace with the absolute value so segments are self-contained
    x[starts] = v[starts]
    return x


def encode(values: np.ndarray, seg_lengths: np.ndarray, encode_int_block=None) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return b""
    segs = np.ascontiguousarray(seg_lengths, dtype=np.int64)
    assert int(segs.sum()) == len(v)
    if encode_int_block is None:
        from ..selector import encode_int_block  # noqa: PLC0415
    x = _stream(v, segs)
    # |INT64_MIN| overflows np.abs -> gcd can come back negative/huge; any
    # scale outside (1, 2**63) is unusable as a LEB128-serialized divisor,
    # so clamp to 1 (plain stream). 0 ⇒ all-zero stream.
    with np.errstate(over="ignore"):
        g = int(np.gcd.reduce(np.abs(x))) if len(x) else 1
    scale = g if 1 < g < 2**63 else 1
    if scale > 1:
        x = x // scale
    return (
        blocks.put_uvarint(len(segs))
        + leb128.encode(segs.astype(np.uint64))
        + blocks.put_uvarint(scale)
        + encode_int_block(x)
    )


def decode(buf: memoryview | bytes, count: int) -> np.ndarray:
    from ..selector import decode_int_block  # noqa: PLC0415

    if count == 0:
        return np.empty(0, dtype=np.int64)
    mv = memoryview(buf)
    n_segs, pos = blocks.take_uvarint(mv, 0)
    rest = np.frombuffer(mv[pos:], dtype=np.uint8)
    term = (rest & 0x80) == 0
    seg_end = int(np.flatnonzero(term)[n_segs - 1]) + 1
    segs = leb128.decode(rest[:seg_end], n_segs).astype(np.int64)
    scale, pos2 = blocks.take_uvarint(rest, seg_end)
    x = decode_int_block(rest[pos2:])
    if scale > 1:
        x = x * np.int64(scale)
    cs = np.cumsum(x, dtype=np.int64)
    starts = np.zeros(n_segs, dtype=np.int64)
    np.cumsum(segs[:-1], out=starts[1:])
    base = np.where(starts > 0, cs[starts - 1], np.int64(0))
    return cs - np.repeat(base, segs)


def encoded_size(values: np.ndarray, seg_lengths: np.ndarray) -> int:
    """Analytic lower-bound-ish size using the zigzag-leb128 stream (the
    nested block can only be smaller or equal up to its header); the
    selector compares the *actual* built block, so this is only used as a
    quick pre-filter."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return 0
    segs = np.ascontiguousarray(seg_lengths, dtype=np.int64)
    return (
        len(blocks.put_uvarint(len(segs)))
        + int(leb128.encoded_sizes(segs.astype(np.uint64)).sum())
        + int(leb128.encoded_sizes(zigzag.encode(_stream(v, segs))).sum())
    )
