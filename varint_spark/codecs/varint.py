"""Per-value zigzag+LEB128 varint stream — the reference-faithful codec.

This is exactly what the reference's chained/chained-simple codecs produce
per value (reference src/varintChained.c:95-126, src/varintChainedSimple.c:40-65),
generalized to signed int64 via zig-zag. Its encoded size is the comparison
floor for the "compressed size <= reference output" criterion: the selector's
cost gate never emits a block larger than this stream (plus it falls back to
this codec when no structure helps).
"""

from __future__ import annotations

import numpy as np

from . import leb128, zigzag


def encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return b""
    return leb128.encode(zigzag.encode(v))


def decode(buf: memoryview | bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int64)
    return zigzag.decode(leb128.decode(buf, count))


def encoded_size(values: np.ndarray, zz_sizes: np.ndarray | None = None) -> int:
    """Analytic stream size — the reference-suite cost model.
    ``zz_sizes``: optional precomputed ``leb128.encoded_sizes(zigzag(v))``
    (the engine computes it once for the varint_bytes bookkeeping and the
    selector's floor)."""
    if zz_sizes is not None:
        return int(zz_sizes.sum())
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return 0
    return int(leb128.encoded_sizes(zigzag.encode(v)).sum())
