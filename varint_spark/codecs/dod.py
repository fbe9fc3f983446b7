"""Delta-of-delta (second-derivative) codec for timestamp-like streams.

The reference's example layer gets 7.6-7.9x on regular-cadence timestamps
from Gorilla-style delta-of-delta (reference
examples/integration/delta_compression.c and
examples/reference/timeseries_db.c:240-320; claim README.md:188): on a
fixed-cadence stream the FIRST derivative is a constant and the SECOND is
all zeros, which any run-aware inner coding collapses to almost nothing.
Plain delta still pays the full varint of the (constant) cadence per
value there — the ~2x the reference leaves on the table without DoD.

Payload::

    [scale: leb128]
    [stream/scale: NESTED self-describing int block]

where ``stream = [v0, d1, dod_2, dod_3, ...]`` — the absolute first
value, the first delta, then second differences (``dod_i = d_i -
d_{i-1}``). ``scale`` is the GCD of the stream, same trick as
``segdelta``: second-precision timestamps stored as microseconds are
exact multiples of 10^6, so dividing up front shrinks every residual.

The nested block goes through the adaptive selector, so a perfectly
regular cadence (stream = v0, d, 0, 0, ...) lands on RLE (~0 bytes per
value) and a cadence with bounded jitter lands on FOR/BP128 over the
small residuals. Decode is two cumsums; all arithmetic is wrap-around
int64, keeping the round trip bit-exact even on overflow (same contract
as ``delta``/``segdelta``).
"""

from __future__ import annotations

import numpy as np

from . import blocks, leb128, zigzag


def _stream(v: np.ndarray, deltas: np.ndarray | None = None) -> np.ndarray:
    with np.errstate(over="ignore"):
        d = deltas if deltas is not None else np.diff(v, prepend=np.int64(0))
        x = np.diff(d, prepend=np.int64(0))   # x[0] = v0
    x[1:2] = d[1:2]                           # x[1] = first delta (if n > 1)
    return x


def prepare(values: np.ndarray, deltas: np.ndarray | None = None):
    """-> (varint floor, GCD-scaled stream, scale) — one shared pass for
    the selector's pre-filter AND the eventual encode (previously the
    stream + GCD were computed twice when the filter passed).
    ``deltas``: optional precomputed ``np.diff(v, prepend=0)``."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    x = _stream(v, deltas)
    # |INT64_MIN| overflows np.abs -> clamp unusable scales to 1, exactly
    # as segdelta does (segdelta.py:58-63)
    with np.errstate(over="ignore"):
        g = int(np.gcd.reduce(np.abs(x))) if len(x) else 1
    scale = g if 1 < g < 2**63 else 1
    if scale > 1:
        x = x // scale
    floor = int(leb128.encoded_sizes(zigzag.encode(x)).sum())
    return floor, x, scale


def encode(values: np.ndarray, encode_int_block=None, prepared=None) -> bytes:
    """``prepared``: optional :func:`prepare` output to skip the stream
    recomputation."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return b""
    if encode_int_block is None:
        from ..selector import _encode_int_block_nested as encode_int_block  # noqa: PLC0415
    _, x, scale = prepared if prepared is not None else prepare(v)
    return blocks.put_uvarint(scale) + encode_int_block(x)


def decode(buf: memoryview | bytes, count: int) -> np.ndarray:
    from ..selector import decode_int_block  # noqa: PLC0415

    if count == 0:
        return np.empty(0, dtype=np.int64)
    mv = memoryview(buf)
    scale, pos = blocks.take_uvarint(mv, 0)
    x = decode_int_block(mv[pos:])
    if scale > 1:
        x = x * np.int64(scale)
    # invert: stream is x[0]=v0, x[1]=d1, x[i>=2]=dod_i. First cumsum over
    # x[1:] rebuilds the deltas d_i; second cumsum rebuilds v (wrap-around
    # int64 keeps both exact under overflow).
    with np.errstate(over="ignore"):
        d = np.cumsum(x[1:], dtype=np.int64)
        v = np.empty(count, dtype=np.int64)
        v[0] = x[0]
        if count > 1:
            np.cumsum(d, dtype=np.int64, out=v[1:])
            v[1:] += x[0]
    return v


def varint_floor(values: np.ndarray) -> int:
    """Analytic zigzag-LEB128 size of the GCD-scaled DoD stream — an
    upper-bound pre-filter for the selector: the nested adaptive block is
    itself cost-gated to <= min(plain, varint floor) plus a ~3-byte block
    header, so when this floor already loses to the incumbent by more
    than the header slack there is no need to build the nested block."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return 0
    return prepare(v)[0]


def encoded_size(values: np.ndarray) -> int:
    """Exact size — the nested selection is not analytically sizable
    without building, so this builds (the selector compares actual bytes
    and encodes once; this exists for the size-exactness test contract)."""
    return len(encode(values))
