"""PLAIN fallback codecs — uncompressed but schema-faithful.

The cost-gate fallback (reference pattern: dict encode returns 0 when not
beneficial, src/varintDict.h:95-97): when no codec beats raw bytes, emit
PLAIN so compressed size never exceeds raw size by more than the block
header.
"""

from __future__ import annotations

import numpy as np


def encode_int(values: np.ndarray) -> bytes:
    """int64 array -> fixed 8-byte little-endian payload."""
    return np.ascontiguousarray(values, dtype="<i8").tobytes()


def decode_int(buf: memoryview | bytes, count: int) -> np.ndarray:
    out = np.frombuffer(buf, dtype="<i8", count=count)
    return out.astype(np.int64, copy=False)
