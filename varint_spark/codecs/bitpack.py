"""Fixed-bit-width packing of uint64 arrays (any width 0..64).

The numpy analog of the reference's bit-packing template
(reference src/varintPacked.h:12-99) and the BP128 block packer
(src/varintBP128.c:102-132): ``np.packbits``/``np.unpackbits`` in
little-endian bit order play the role of the SIMD kernels.

Width 0 is valid and encodes an all-zeros array with an empty payload
(used by FOR when every value equals the frame minimum).
"""

from __future__ import annotations

import numpy as np


def bits_needed(max_value: int) -> int:
    """Minimal bit width for values in [0, max_value] — the numpy analog of
    varintBP128BitsNeeded (reference src/varintBP128.h:132-154)."""
    return int(max_value).bit_length()


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack each value into ``width`` bits, little-endian bit order.

    Pure byte-plane kernel: view the uint64s as (n, 8) little-endian bytes,
    ``unpackbits`` to a (n, 64) bit matrix (C speed), slice the low
    ``width`` bit columns, ``packbits`` flat — no Python-level bit math."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0 or width == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    # only the ceil(width/8) low-order bytes can carry set bits — expanding
    # just those keeps the unpackbits work proportional to width instead of
    # a flat 64 bits/value (same output bytes)
    nb = (width + 7) // 8
    byte_view = np.ascontiguousarray(v.view(np.uint8).reshape(n, 8)[:, :nb])
    bits = np.unpackbits(byte_view, axis=1, bitorder="little")[:, :width]
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack(buf: bytes | np.ndarray, width: int, count: int) -> np.ndarray:
    """Inverse of :func:`pack`; returns uint64 array of length ``count``."""
    if count == 0 or width == 0:
        return np.zeros(count, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    need = (count * width + 7) // 8
    if len(b) < need:
        raise ValueError(f"bitpack buffer too short: {len(b)} < {need}")
    bits = np.unpackbits(b[:need], count=count * width, bitorder="little").reshape(count, width)
    packed = np.packbits(bits, axis=1, bitorder="little")  # (count, ceil(width/8))
    full = np.zeros((count, 8), dtype=np.uint8)
    full[:, : packed.shape[1]] = packed
    return full.reshape(-1).view(np.uint64)


def packed_size(count: int, width: int) -> int:
    return (count * width + 7) // 8
