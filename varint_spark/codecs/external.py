"""External fixed-width integers — width stored OUTSIDE the bytes
(reference src/varintExternal.h:72-93 / src/varintExternalBigEndian.h:
12-15): zero per-value metadata, the caller carries the width.

Two byte orders, same information:

* little-endian — castable to native ints (`np.ndarray.view`), the
  layout the reference recommends for compute;
* big-endian — byte-wise comparable: for a FIXED width, memcmp order of
  the encoded bytes equals numeric order (the property the tagged codec
  provides per-value; here it costs zero tags when all values share one
  width — e.g. the sort keys of one chunk).

Both are pure reshapes/byteswaps of the (n, width) byte matrix — numpy
does the SIMD. The engine's FOR/bitpack path subsumes this for storage
(bit-granular widths beat byte-granular); this module exists for the
API-parity surface: encode at a caller-chosen byte width, decode with
the width supplied externally.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def minimal_width(values: np.ndarray) -> int:
    """Smallest byte width (1..8) holding every value
    (reference varintExternalUnsignedEncoding)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if len(v) == 0:
        return 1
    bits = int(v.max()).bit_length() or 1
    return (bits + 7) // 8


def encode(values: np.ndarray, width: int, big_endian: bool = False) -> bytes:
    """uint64 array -> n*width bytes (low ``width`` bytes of each value;
    values must fit — raises otherwise, truncation would corrupt)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if not 1 <= width <= 8:
        raise ValueError(f"width must be 1..8, got {width}")
    if width < 8 and len(v) and int(v.max()) >= 1 << (8 * width):
        raise ValueError(f"value does not fit in {width} bytes")
    shifts = np.arange(width, dtype=np.uint64) * _U64(8)
    if big_endian:
        shifts = shifts[::-1]
    mat = ((v[:, None] >> shifts[None, :]) & _U64(0xFF)).astype(np.uint8)
    return mat.tobytes()


def decode(buf: bytes | np.ndarray, width: int,
           big_endian: bool = False) -> np.ndarray:
    """n*width bytes (+ externally-known width) -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) \
        else buf
    if not 1 <= width <= 8:
        raise ValueError(f"width must be 1..8, got {width}")
    if len(b) % width:
        raise ValueError("buffer length is not a multiple of the width")
    mat = b.reshape(-1, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64) * _U64(8)
    if big_endian:
        shifts = shifts[::-1]
    return (mat << shifts[None, :]).sum(axis=1, dtype=np.uint64)
