"""XOR-previous float codec (Gorilla-style) over float64 bit patterns.

Parity with the reference's float codec (``varintFloat``, reference
src/varintFloat.c:29-568 — sign/exponent/mantissa decomposition, FULL mode
lossless) via the public Gorilla scheme (Pelkonen et al., VLDB 2015):
consecutive similar doubles XOR to words whose **high** bits are zero
(sign/exponent/high-mantissa match). We byte-swap the XOR so those zero
bytes become trailing, which LEB128 then elides — a byte-granular,
fully-vectorizable stand-in for Gorilla's bit-granular leading/trailing
windows. Lossless for every bit pattern including NaN payloads.

Payload: ``[leb128 stream of byteswap64(bits[i] ^ bits[i-1])]``
(first value XORs against 0).
"""

from __future__ import annotations

import numpy as np

from . import leb128


def _xor_stream(bits: np.ndarray) -> np.ndarray:
    u = np.ascontiguousarray(bits, dtype=np.int64).view(np.uint64)
    x = np.empty_like(u)
    x[0] = u[0]
    np.bitwise_xor(u[1:], u[:-1], out=x[1:])
    return x


def _pick_mode(x: np.ndarray) -> tuple[int, np.ndarray]:
    """mode 0: raw XOR (similar values → zero HIGH bytes, which LEB128
    elides). mode 1: byteswapped (low-precision values → zero LOW mantissa
    bytes become elidable). Exact analytic sizes decide."""
    sz0 = int(leb128.encoded_sizes(x).sum())
    xs = x.byteswap()
    sz1 = int(leb128.encoded_sizes(xs).sum())
    return (0, x) if sz0 <= sz1 else (1, xs)


def encode(bits: np.ndarray) -> bytes:
    """int64 array of float64 bit patterns -> ``[mode:1][leb128 stream]``."""
    if len(bits) == 0:
        return b""
    mode, stream = _pick_mode(_xor_stream(bits))
    return bytes([mode]) + leb128.encode(stream)


def decode(buf: memoryview | bytes, count: int) -> np.ndarray:
    """payload -> int64 array of float64 bit patterns."""
    if count == 0:
        return np.empty(0, dtype=np.int64)
    mv = memoryview(buf)
    x = leb128.decode(np.frombuffer(mv[1:], dtype=np.uint8), count)
    if mv[0] == 1:
        x = x.byteswap()
    out = np.bitwise_xor.accumulate(x)
    return out.view(np.int64)


def encoded_size(bits: np.ndarray) -> int:
    if len(bits) == 0:
        return 0
    x = _xor_stream(bits)
    return 1 + min(int(leb128.encoded_sizes(x).sum()),
                   int(leb128.encoded_sizes(x.byteswap()).sum()))
