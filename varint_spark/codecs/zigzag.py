"""Zig-zag mapping between signed and unsigned 64-bit integers.

Same transform as the reference's delta codec (reference
src/varintDelta.h:25-39): small-magnitude signed values (either sign) map to
small unsigned values, so LEB128 stays short on negative deltas.
"""

from __future__ import annotations

import numpy as np


def encode(values: np.ndarray) -> np.ndarray:
    """int64 -> uint64 via (v << 1) ^ (v >> 63) (arithmetic shift)."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def decode(values: np.ndarray) -> np.ndarray:
    """uint64 -> int64 via (u >> 1) ^ -(u & 1)."""
    u = np.ascontiguousarray(values, dtype=np.uint64)
    return ((u >> np.uint64(1)).view(np.int64)) ^ -((u & np.uint64(1)).view(np.int64))
