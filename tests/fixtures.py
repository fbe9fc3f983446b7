"""Deterministic integer/string fixtures per FIXTURES.md F2/F3.

Mirrors the value patterns the reference's own suites exercise
(reference src/varintDeltaTest.c, src/varintFORTest.c, src/varintPFORTest.c,
src/varintDictTest.c, src/varintCompare.c:19-39).
"""

from __future__ import annotations

import hashlib

import numpy as np

SEED = 42


def boundaries_leb128() -> np.ndarray:
    """{2^(7k)-1, 2^(7k), 2^(7k)+1} for k=1..9, plus 0, 1, 2^63-1 and
    negative mirrors (signed domain)."""
    vals = [0, 1, -1]
    for k in range(1, 10):
        b = 1 << (7 * k)
        for x in (b - 1, b, b + 1):
            if x < 2**63:
                vals.extend([x, -x])
    vals.extend([2**63 - 1, -(2**63)])
    return np.array(vals, dtype=np.int64)


def sorted_timestamps(n: int = 1000) -> np.ndarray:
    """base 1.7e9s (in microseconds) + sequential 1-60s deltas
    (ref src/varintAdaptiveTest.c:276-287)."""
    rng = np.random.default_rng(SEED)
    deltas = rng.integers(1_000_000, 60_000_000, size=n, dtype=np.int64)
    return np.int64(1_700_000_000_000_000) + np.cumsum(deltas)


def mixed_sign_deltas(n: int = 1000) -> np.ndarray:
    """non-monotonic around a level (ref src/varintDeltaTest.c:114-130)."""
    rng = np.random.default_rng(SEED)
    return np.int64(1_000_000) + rng.integers(-500, 500, size=n, dtype=np.int64)


def tight_cluster(n: int = 10_000) -> np.ndarray:
    """uniform in [10_000_000, 10_000_255] (ref src/varintFORTest.c:81)."""
    rng = np.random.default_rng(SEED)
    return rng.integers(10_000_000, 10_000_256, size=n, dtype=np.int64)


def cluster_with_outliers(n: int = 10_000) -> np.ndarray:
    """95% in [1000, 2000], 5% in [1e9, 1e12] (ref src/varintPFORTest.c:13-127)."""
    rng = np.random.default_rng(SEED)
    v = rng.integers(1000, 2001, size=n, dtype=np.int64)
    idx = rng.choice(n, size=n // 20, replace=False)
    v[idx] = rng.integers(10**9, 10**12, size=len(idx), dtype=np.int64)
    return v


def high_repetition(n: int = 100_000) -> np.ndarray:
    """10 unique values (ref src/varintDictTest.c:75)."""
    rng = np.random.default_rng(SEED)
    pool = rng.integers(0, 2**40, size=10, dtype=np.int64)
    return pool[rng.integers(0, 10, size=n)]


def all_unique(n: int = 10_000) -> np.ndarray:
    rng = np.random.default_rng(SEED)
    return rng.permutation(np.arange(n, dtype=np.int64))


def long_runs(n: int = 50_000) -> np.ndarray:
    """runs of Geometric(mean 50) over 5 values (RLE fixture)."""
    rng = np.random.default_rng(SEED)
    vals = []
    pool = np.array([0, 7, 128, 99999, -3], dtype=np.int64)
    while sum(len(x) for x in vals) < n:
        vals.append(np.full(rng.geometric(1 / 50), pool[rng.integers(0, 5)], dtype=np.int64))
    return np.concatenate(vals)[:n]


def random_bitweighted(n: int = 100_000) -> np.ndarray:
    """x = rand64 & ((1 << (rand % 64)) - 1), mirroring the reference's
    mass harness (ref src/varintCompare.c:28-35); signed via random sign."""
    rng = np.random.default_rng(SEED)
    raw = rng.integers(0, 2**63, size=n, dtype=np.int64).view(np.uint64)
    nbits = rng.integers(0, 64, size=n)
    mask = np.where(nbits >= 64, np.uint64(2**64 - 1), (np.uint64(1) << nbits.astype(np.uint64)) - np.uint64(1))
    v = (raw & mask).view(np.int64)
    sign = rng.integers(0, 2, size=n) * 2 - 1
    return v * sign  # wraps for 2^63 edge, still a valid int64 fixture


def empty_and_single() -> list[np.ndarray]:
    return [np.empty(0, dtype=np.int64), np.array([42], dtype=np.int64)]


INT_FIXTURES = {
    "boundaries_leb128": boundaries_leb128,
    "sorted_timestamps": sorted_timestamps,
    "mixed_sign_deltas": mixed_sign_deltas,
    "tight_cluster": tight_cluster,
    "cluster_with_outliers": cluster_with_outliers,
    "high_repetition": high_repetition,
    "all_unique": all_unique,
    "long_runs": long_runs,
    "random_bitweighted": random_bitweighted,
}


# ---- string fixtures (F3) ---------------------------------------------------

_WORDS = None


def _vocab(k: int = 5000) -> list[str]:
    global _WORDS
    if _WORDS is None:
        _WORDS = [
            hashlib.sha1(f"w{i}".encode()).hexdigest()[: 3 + (i % 8)] for i in range(k)
        ]
    return _WORDS


def roles(n: int = 100_000) -> np.ndarray:
    rng = np.random.default_rng(SEED)
    pool = np.array(["user", "assistant", "system", "tool"], dtype=object)
    idx = np.zeros(n, dtype=np.int64)
    stay = rng.random(n) < 0.55
    draws = rng.integers(0, 4, size=n)
    for i in range(1, n):  # test-only generator; engine path stays vectorized
        idx[i] = idx[i - 1] if stay[i] else draws[i]
    return pool[idx]


def tools_sparse(n: int = 100_000) -> np.ndarray:
    rng = np.random.default_rng(SEED)
    pool = np.array([""] + [f"tool_{i}" for i in range(12)], dtype=object)
    idx = np.where(rng.random(n) < 0.8, 0, rng.integers(1, 13, size=n))
    return pool[idx]


def nl_text(n: int = 5000) -> np.ndarray:
    rng = np.random.default_rng(SEED)
    vocab = np.array(_vocab(), dtype=object)
    out = []
    lens = np.clip(rng.geometric(1 / 40, size=n), 1, 400)
    for ln in lens:
        out.append(" ".join(vocab[rng.integers(0, len(vocab), size=ln)]))
    out[0] = ""
    if n > 1:
        out[1] = "héllo wörld — ünïcode ✓ 例文 🙂"
    return np.array(out, dtype=object)


def high_cardinality_ids(n: int = 20_000) -> np.ndarray:
    return np.array([f"uuid-{hashlib.sha1(str(i).encode()).hexdigest()}" for i in range(n)], dtype=object)


STR_FIXTURES = {
    "roles": roles,
    "tools_sparse": tools_sparse,
    "nl_text": nl_text,
    "high_cardinality_ids": high_cardinality_ids,
}
