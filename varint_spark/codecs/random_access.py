"""Random access into encoded blocks without full decode.

Parity with the reference's partial-decode surface (SURVEY §2.A.5):

* FOR — O(1) per value, fixed bit stride (``varintFORGetAt``,
  reference src/varintFOR.c:182-201)
* PFOR — O(1) body + O(log n_exc) exception lookup (``varintPFORGetAt``,
  src/varintPFOR.c:261)
* RLE — O(runs) cumulative-length search (``varintRLEGetAt``,
  src/varintRLE.c:226)
* DICT — O(1) index + dictionary entry
* PLAIN — O(1)

plus range (slice) decode for FOR — the building block for decoding only
the blocks/rows a predicate selects ("decode only needed blocks",
``varintFORDecodeBlock`` src/varintFOR.c:597).
"""

from __future__ import annotations

import numpy as np

from . import bitpack, blocks, delta, leb128, zigzag
from .blocks import (BP128_DELTA, DELTA, DICT_INT, FOR, LEB128_ZZ, PFOR,
                     PLAIN_INT, RLE_INT, SEG_DELTA)


def _unpack_range(buf: np.ndarray, width: int, start: int, n: int) -> np.ndarray:
    """Bit-exact slice of a packed array: unpack only the covering bytes."""
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint64)
    bit0 = start * width
    byte0 = bit0 // 8
    byte1 = (bit0 + n * width + 7) // 8
    bits = np.unpackbits(buf[byte0:byte1], bitorder="little")
    lead = bit0 - byte0 * 8
    bits = bits[lead : lead + n * width].reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)


def for_get_range(payload: memoryview | bytes, count: int, start: int, n: int) -> np.ndarray:
    """FOR payload -> values[start:start+n] (O(n), touches only n*width bits)."""
    mv = memoryview(payload)
    mn_zz, pos = blocks.take_uvarint(mv, 0)
    mn = int(zigzag.decode(np.array([mn_zz], dtype=np.uint64))[0])
    width = mv[pos]
    body = np.frombuffer(mv[pos + 1 :], dtype=np.uint8)
    offs = _unpack_range(body, width, start, n)
    return (offs + np.int64(mn).astype(np.uint64)).view(np.int64)


def _pfor_parts(payload: memoryview | bytes):
    """Parse a PFOR payload header WITHOUT unpacking the body: returns
    (min, width, payload view, body_start). The body stays packed; the
    exception streams are parsed separately by _pfor_exceptions."""
    mv = memoryview(payload)
    mn_zz, pos = blocks.take_uvarint(mv, 0)
    mn = int(zigzag.decode(np.array([mn_zz], dtype=np.uint64))[0])
    width = mv[pos]
    pos += 1
    return mn, width, mv, pos  # body starts at pos; caller slices lazily


def _pfor_exceptions(mv: memoryview, body_start: int, count: int, width: int):
    body_len = bitpack.packed_size(count, width)
    pos = body_start + body_len
    n_exc, pos = blocks.take_uvarint(mv, pos)
    if not n_exc:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    rest = np.frombuffer(mv[pos:], dtype=np.uint8)
    term = (rest & 0x80) == 0
    ends = np.flatnonzero(term)
    pos_stream_end = int(ends[n_exc - 1]) + 1
    exc_pos = np.cumsum(leb128.decode(rest[:pos_stream_end], n_exc).view(np.int64))
    exc_vals = leb128.decode(rest[pos_stream_end:], n_exc)
    return exc_pos, exc_vals


def pfor_get_range(payload: memoryview | bytes, count: int, start: int, n: int) -> np.ndarray:
    """PFOR values[start:start+n]: fixed-stride body slice (only n*width
    bits touched) + searchsorted patch of in-range exceptions — the
    ``varintPFORGetAt`` shape (reference src/varintPFOR.c:261), never a
    full-body decode."""
    mn, width, mv, body_start = _pfor_parts(payload)
    body = np.frombuffer(mv[body_start: body_start + bitpack.packed_size(count, width)],
                         dtype=np.uint8)
    offs = _unpack_range(body, width, start, n)
    exc_pos, exc_vals = _pfor_exceptions(mv, body_start, count, width)
    if len(exc_pos):
        a = int(np.searchsorted(exc_pos, start, side="left"))
        b = int(np.searchsorted(exc_pos, start + n, side="left"))
        if b > a:
            offs[exc_pos[a:b] - start] = exc_vals[a:b]
    return (offs + np.int64(mn).astype(np.uint64)).view(np.int64)


def rle_get_range(payload: memoryview | bytes, count: int, start: int, n: int) -> np.ndarray:
    """RLE values[start:start+n] via cumulative run lengths (O(runs) header
    scan, O(n) output — no full expansion)."""
    mv = memoryview(payload)
    n_runs, pos = blocks.take_uvarint(mv, 0)
    rest = np.frombuffer(mv[pos:], dtype=np.uint8)
    term = (rest & 0x80) == 0
    ends = np.flatnonzero(term)
    len_end = int(ends[n_runs - 1]) + 1
    lengths = leb128.decode(rest[:len_end], n_runs).astype(np.int64)
    cum = np.cumsum(lengths)
    first = int(np.searchsorted(cum, start, side="right"))
    last = int(np.searchsorted(cum, start + n - 1, side="right")) if n else first
    vals = zigzag.decode(leb128.decode(rest[len_end:], n_runs))
    span = np.repeat(vals[first: last + 1], lengths[first: last + 1])
    span_start = int(cum[first - 1]) if first else 0
    return span[start - span_start: start - span_start + n].astype(np.int64)


def dict_get_range(payload: memoryview | bytes, count: int, start: int, n: int) -> np.ndarray:
    """DICT values[start:start+n]: slice the packed code stream, gather
    from the (decoded) dictionary — touches n*width bits of codes."""
    mv = memoryview(payload)
    n_uniq, pos = blocks.take_uvarint(mv, 0)
    rest = np.frombuffer(mv[pos:], dtype=np.uint8)
    term = (rest & 0x80) == 0
    ends = np.flatnonzero(term)
    dict_end = int(ends[n_uniq - 1]) + 1
    uniq = delta.decode(rest[:dict_end], n_uniq)
    width = int(rest[dict_end])
    if width == 0:
        return np.full(n, uniq[0], dtype=np.int64)
    codes = _unpack_range(rest[dict_end + 1:], width, start, n).astype(np.int64)
    return uniq[codes].astype(np.int64)


def rle_get_at(payload: memoryview | bytes, count: int, idx: int) -> int:
    """RLE payload -> value at idx via cumulative run lengths (O(runs))."""
    mv = memoryview(payload)
    n_runs, pos = blocks.take_uvarint(mv, 0)
    rest = np.frombuffer(mv[pos:], dtype=np.uint8)
    term = (rest & 0x80) == 0
    ends = np.flatnonzero(term)
    len_end = int(ends[n_runs - 1]) + 1
    lengths = leb128.decode(rest[:len_end], n_runs).astype(np.int64)
    cum = np.cumsum(lengths)
    run = int(np.searchsorted(cum, idx, side="right"))
    vals = zigzag.decode(leb128.decode(rest[len_end:], n_runs))
    return int(vals[run])


def get_at(block: bytes | memoryview, idx: int) -> int:
    """Self-describing int block -> value at position ``idx`` without full
    decode (falls back to full decode for stream codecs where random
    access is inherently sequential: DELTA / LEB128_ZZ)."""
    cid, count, payload = blocks.unpack_block(block)
    if not 0 <= idx < count:
        raise IndexError(idx)
    if cid == PLAIN_INT:
        return int(np.frombuffer(payload, dtype="<i8", count=1, offset=8 * idx)[0])
    if cid == FOR:
        return int(for_get_range(payload, count, idx, 1)[0])
    if cid == PFOR:
        # O(1) body stride + binary search of the delta-decoded exception
        # positions (varintPFORGetAt, src/varintPFOR.c:261) — never decodes
        # the packed body
        return int(pfor_get_range(payload, count, idx, 1)[0])
    if cid == RLE_INT:
        return rle_get_at(payload, count, idx)
    if cid == DICT_INT:
        mv = memoryview(payload)
        n_uniq, pos = blocks.take_uvarint(mv, 0)
        rest = np.frombuffer(mv[pos:], dtype=np.uint8)
        term = (rest & 0x80) == 0
        ends = np.flatnonzero(term)
        dict_end = int(ends[n_uniq - 1]) + 1
        uniq = delta.decode(rest[:dict_end], n_uniq)
        width = int(rest[dict_end])
        code = int(_unpack_range(rest[dict_end + 1 :], width, idx, 1)[0]) if width else 0
        return int(uniq[code])
    if cid == BP128_DELTA:
        # O(1) per 128-value block (ref src/varintBP128.h:24)
        from . import bp128
        return int(bp128.get_range(payload, count, idx, 1)[0])
    if cid in (DELTA, SEG_DELTA, LEB128_ZZ):
        # whole-chunk prefix-sum codecs are inherently sequential: full decode
        from ..selector import decode_int_block
        return int(decode_int_block(block)[idx])
    raise ValueError(f"get_at: unsupported codec {cid}")


def get_range(block: bytes | memoryview, start: int, n: int) -> np.ndarray:
    """Slice decode: O(n) for FOR/PLAIN/PFOR/DICT, O(runs + n) for RLE;
    full decode only for the inherently-sequential stream codecs
    (DELTA / SEG_DELTA / LEB128_ZZ)."""
    cid, count, payload = blocks.unpack_block(block)
    if not (0 <= start and start + n <= count):
        raise IndexError((start, n, count))
    if cid == PLAIN_INT:
        return np.frombuffer(payload, dtype="<i8", count=n, offset=8 * start).astype(np.int64)
    if cid == FOR:
        return for_get_range(payload, count, start, n)
    if cid == PFOR:
        return pfor_get_range(payload, count, start, n)
    if cid == RLE_INT:
        return rle_get_range(payload, count, start, n)
    if cid == DICT_INT:
        return dict_get_range(payload, count, start, n)
    if cid == BP128_DELTA:
        from . import bp128
        return bp128.get_range(payload, count, start, n)
    from ..selector import decode_int_block
    return decode_int_block(block)[start : start + n]
