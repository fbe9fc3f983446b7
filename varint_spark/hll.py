"""Per-chunk HyperLogLog sidecars — approximate COUNT(DISTINCT) from
lineage metadata.

The third member of the chunk-statistics family (zone maps → range
pruning, Bloom sidecars → equality pruning, HLL → cardinality): an
opt-in 2^p-register sketch per (chunk, column) whose merge is an
elementwise register max — associative, commutative, idempotent — so
the estimate for ANY chunk subset (the whole table, or whatever
survives zone/Bloom/top-k pruning) comes from the metadata rows alone,
never a payload decode. Standard HLL (Flajolet et al. 2007) with the
64-bit-hash variant's corrections: alpha_m bias constant, linear
counting below 2.5·m, no 32-bit large-range correction needed.

Register layout is raw ``2^p`` bytes (p in the first byte)::

    [p: 1][registers: 2^p bytes]

Determinism: registers are a max over per-value hashes — order- and
duplicate-independent — so the sidecar obeys the engine's
blocks-deterministic-at-any-parallelism invariant like the block bytes
themselves. Hashing reuses the Bloom sidecar's splitmix64 (ints) /
corpus-plane xxHash64 (strings) so one hash pass can feed both.

Accuracy: relative error ≈ 1.04/sqrt(2^p) — 1.6% at the default p=12
(4 KiB/chunk/column), 3.2% at p=10 (1 KiB).
"""

from __future__ import annotations

import numpy as np


def _rho(w: np.ndarray, width: int) -> np.ndarray:
    """Position of the first 1-bit (1-based) in the top ``width`` bits of
    each uint64 in ``w``; width+1 when all zero. Vectorized clz via the
    bit-length identity: clz = 64 - bit_length, and bit_length of the
    top-justified word is exact through float64 for the high bits that
    matter (values with ≥11 significant low bits differ from their
    float64 rounding only below bit 53, which cannot move the HIGHEST
    set bit)."""
    out = np.full(len(w), width + 1, dtype=np.uint8)
    nz = w != 0
    if nz.any():
        v = w[nz]
        # highest set bit index via successive comparisons — exact for
        # uint64, no float rounding anywhere
        bl = np.zeros(len(v), dtype=np.int64)
        cur = v.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = cur >= (np.uint64(1) << np.uint64(shift))
            bl[big] += shift
            cur[big] >>= np.uint64(shift)
        clz = 63 - bl
        out[nz] = (clz + 1).astype(np.uint8)
    return out


def build(hashes: np.ndarray, p: int = 12) -> bytes:
    """uint64 base hashes of a chunk's values -> serialized sketch."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    h = np.asarray(hashes, dtype=np.uint64)
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(h):
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h << np.uint64(p)  # remaining 64-p bits, top-justified
        np.maximum.at(regs, idx, _rho(w, 64 - p))
    return bytes([p]) + regs.tobytes()


def merge(a: bytes, b: bytes) -> bytes:
    """Elementwise register max — the union sketch."""
    if a[0] != b[0]:
        raise ValueError(f"precision mismatch: p={a[0]} vs p={b[0]}")
    ra = np.frombuffer(a, dtype=np.uint8, offset=1)
    rb = np.frombuffer(b, dtype=np.uint8, offset=1)
    return a[:1] + np.maximum(ra, rb).tobytes()


def merge_many(sketches) -> bytes | None:
    """Fold an iterable of serialized sketches (None entries skipped)."""
    regs, p = None, None
    for s in sketches:
        if s is None:
            continue
        if regs is None:
            p = s[0]
            regs = np.frombuffer(s, dtype=np.uint8, offset=1).copy()
        else:
            if s[0] != p:
                raise ValueError(f"precision mismatch: p={p} vs p={s[0]}")
            np.maximum(regs, np.frombuffer(s, dtype=np.uint8, offset=1),
                       out=regs)
    return None if regs is None else bytes([p]) + regs.tobytes()


def estimate(sketch: bytes) -> int:
    """Cardinality estimate from a serialized sketch."""
    p = sketch[0]
    m = 1 << p
    regs = np.frombuffer(sketch, dtype=np.uint8, offset=1).astype(np.float64)
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    e = alpha * m * m / np.sum(np.exp2(-regs))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros:  # linear-counting regime
        e = m * np.log(m / zeros)
    return int(round(e))
