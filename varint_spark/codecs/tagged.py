"""Tagged (sqlite4-style) varint — big-endian, memcmp()-sortable while
encoded. Vectorized numpy port of the reference's wire format (reference
src/varintTagged.h:12-26 byte-width maxima; put/get
src/varintTagged.c:223-289,410):

    value <= 240           : 1 byte  [v]
    value <= 2287          : 2 bytes [241 + (v-240)//256][(v-240)%256]
    value <= 67823         : 3 bytes [249][(v-2288)//256][(v-2288)%256]
    value <  2^24          : 4 bytes [250][3-byte BE]
    value <  2^32          : 5 bytes [251][4-byte BE]
    ... one tag per extra byte ...
    value <= 2^64-1        : 9 bytes [255][8-byte BE]

The defining property — encoded byte strings sort exactly like their
values under plain lexicographic (memcmp) comparison — is what the
LEB128 family can't offer; the engine keeps LEB128 as the default stream
(denser headers, one varint family) and exposes tagged for sortable-key
encodings (e.g. composite range keys in an external index).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64

MAXES = np.array([240, 2287, 67823, (1 << 24) - 1, (1 << 32) - 1,
                  (1 << 40) - 1, (1 << 48) - 1, (1 << 56) - 1,
                  (1 << 64) - 1], dtype=np.uint64)


def encoded_sizes(values: np.ndarray) -> np.ndarray:
    """Per-value tagged byte counts (1..9)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    return np.searchsorted(MAXES, v, side="left") + 1


def _be_bytes(vv: np.ndarray, nbytes: int) -> np.ndarray:
    """(k, nbytes) big-endian byte matrix of the low nbytes of each value."""
    shifts = (np.arange(nbytes - 1, -1, -1, dtype=np.uint64) * _U64(8))
    return ((vv[:, None] >> shifts[None, :]) & _U64(0xFF)).astype(np.uint8)


def encode(values: np.ndarray) -> bytes:
    """uint64 array -> concatenated tagged varints (each memcmp-sortable)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    sizes = encoded_sizes(v)
    offs = np.empty(n, dtype=np.int64)
    offs[0] = 0
    np.cumsum(sizes[:-1], out=offs[1:])
    out = np.empty(int(sizes.sum()), dtype=np.uint8)
    for w in range(int(sizes.min()), int(sizes.max()) + 1):
        idx = np.flatnonzero(sizes == w)
        if not len(idx):
            continue
        vv = v[idx]
        base = offs[idx]
        if w == 1:
            out[base] = vv.astype(np.uint8)
        elif w == 2:
            r = vv - _U64(240)
            out[base] = (241 + r // _U64(256)).astype(np.uint8)
            out[base + 1] = (r % _U64(256)).astype(np.uint8)
        elif w == 3:
            r = vv - _U64(2288)
            out[base] = 249
            out[base + 1] = (r // _U64(256)).astype(np.uint8)
            out[base + 2] = (r % _U64(256)).astype(np.uint8)
        else:  # w in 4..9: [246+w][(w-1)-byte BE]
            out[base] = 246 + w
            mat = _be_bytes(vv, w - 1)
            for j in range(w - 1):
                out[base + 1 + j] = mat[:, j]
    return out.tobytes()


def lengths_from_first_bytes(first: np.ndarray) -> np.ndarray:
    """First byte -> total length (reference varintTaggedGetLenQuick_)."""
    f = first.astype(np.int64)
    return np.where(f <= 240, 1, np.where(f <= 248, 2, f - 246))


def decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Concatenated tagged varints -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        if count:
            raise ValueError(f"expected {count} values, got empty buffer")
        return np.empty(0, dtype=np.uint64)
    # The stream is self-delimiting (starts are data-dependent), which a
    # naive scan walks per value in Python. Instead: classify EVERY byte
    # position's would-be length once (garbage at non-starts is harmless),
    # then pointer-double — each round applies the squared jump table to
    # all known starts, doubling the known prefix of the chain. O(log n)
    # vectorized rounds, no per-value Python.
    n = len(b)
    all_len = lengths_from_first_bytes(b)
    jump = np.full(n + 1, n, dtype=np.int64)
    jump[:n] = np.minimum(np.arange(n, dtype=np.int64) + all_len, n)
    starts = np.array([0], dtype=np.int64)
    while True:
        nxt = jump[starts]
        new = nxt[nxt < n]
        merged = np.unique(np.concatenate([starts, new]))
        if len(merged) == len(starts):
            break
        starts = merged
        jump = jump[jump]  # squared: now advances 2x as many values
    end = int(starts[-1] + all_len[starts[-1]])  # last start + its length
    if end != n:
        raise ValueError("corrupt tagged stream (overran buffer)")
    if count is not None and len(starts) != count:
        raise ValueError(f"expected {count} values, found {len(starts)}")
    sizes = all_len[starts]
    out = np.zeros(len(starts), dtype=np.uint64)
    for w in range(int(sizes.min()), int(sizes.max()) + 1):
        idx = np.flatnonzero(sizes == w)
        if not len(idx):
            continue
        pos_w = starts[idx]
        if w == 1:
            out[idx] = b[pos_w].astype(np.uint64)
        elif w == 2:
            out[idx] = (_U64(240) + (b[pos_w].astype(np.uint64) - _U64(241)) * _U64(256)
                        + b[pos_w + 1].astype(np.uint64))
        elif w == 3:
            out[idx] = (_U64(2288) + b[pos_w + 1].astype(np.uint64) * _U64(256)
                        + b[pos_w + 2].astype(np.uint64))
        else:
            acc = np.zeros(len(idx), dtype=np.uint64)
            for j in range(w - 1):
                acc = (acc << _U64(8)) | b[pos_w + 1 + j].astype(np.uint64)
            out[idx] = acc
    return out


def _stream_starts(b: np.ndarray) -> np.ndarray:
    """Start offsets of every value in a concatenated tagged stream —
    the pointer-doubling scan decode() uses, shared."""
    n = len(b)
    all_len = lengths_from_first_bytes(b)
    jump = np.full(n + 1, n, dtype=np.int64)
    jump[:n] = np.minimum(np.arange(n, dtype=np.int64) + all_len, n)
    starts = np.array([0], dtype=np.int64)
    while True:
        nxt = jump[starts]
        new = nxt[nxt < n]
        merged = np.unique(np.concatenate([starts, new]))
        if len(merged) == len(starts):
            break
        starts = merged
        jump = jump[jump]
    if int(starts[-1] + all_len[starts[-1]]) != n:
        raise ValueError("corrupt tagged stream (overran buffer)")
    return starts


def add_in_place(buf: bytes | np.ndarray, delta: int) -> tuple[bytes, int]:
    """Add ``delta`` to EVERY value of a concatenated tagged stream — the
    reference's encoded-form arithmetic (varintTaggedAddNoGrow /
    varintTaggedAddGrow, src/varintTagged.h:47-48, src/varintTagged.c:453,
    457), vectorized over the whole stream.

    Values whose sum still encodes in their current byte length are
    patched by byte surgery on the BE tail — no re-layout (the NoGrow
    path; it also preserves canonical form, since same length ⇒ same
    width class ⇒ memcmp order still equals value order). Only when some
    value changes width class does the stream re-encode (the Grow path —
    the reference likewise rewrites then). Returns
    ``(new stream bytes, number of width-changed values)``. Raises on
    uint64 overflow/underflow — an encoded key must stay a key."""
    b = np.frombuffer(buf, dtype=np.uint8).copy() \
        if not isinstance(buf, np.ndarray) else buf.copy()
    if len(b) == 0:
        return b.tobytes(), 0
    starts = _stream_starts(b)
    v = decode(b)
    if delta >= 0:
        nv = v + _U64(delta)
        if (nv < v).any():
            raise OverflowError("tagged add: uint64 overflow")
    else:
        d = _U64(-delta)
        if (v < d).any():
            raise OverflowError("tagged add: underflow below 0")
        nv = v - d
    sizes_old = lengths_from_first_bytes(b[starts])
    sizes_new = encoded_sizes(nv)
    if not np.array_equal(sizes_new, sizes_old):
        return encode(nv), int((sizes_new != sizes_old).sum())
    for w in range(int(sizes_old.min()), int(sizes_old.max()) + 1):
        idx = np.flatnonzero(sizes_old == w)
        if not len(idx):
            continue
        vv = nv[idx]
        base = starts[idx]
        if w == 1:
            b[base] = vv.astype(np.uint8)
        elif w == 2:
            r = vv - _U64(240)
            b[base] = (241 + r // _U64(256)).astype(np.uint8)
            b[base + 1] = (r % _U64(256)).astype(np.uint8)
        elif w == 3:
            r = vv - _U64(2288)
            b[base + 1] = (r // _U64(256)).astype(np.uint8)
            b[base + 2] = (r % _U64(256)).astype(np.uint8)
        else:  # tag byte unchanged; rewrite the (w-1)-byte BE tail
            mat = _be_bytes(vv, w - 1)
            for j in range(w - 1):
                b[base + 1 + j] = mat[:, j]
    return b.tobytes(), 0


def put64(x: int) -> bytes:
    """Single-value encode (reference varintTaggedPut64)."""
    return encode(np.array([x], dtype=np.uint64))


def get64(buf: bytes) -> tuple[int, int]:
    """Single-value decode -> (value, bytes consumed)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    ln = int(lengths_from_first_bytes(b[:1])[0])
    return int(decode(b[:ln], 1)[0]), ln
