"""Roaring-style bitmap codec: container choice, round-trips, set algebra
(parity with reference src/varintBitmapTest.c cases)."""

from __future__ import annotations

import numpy as np
import pytest

from varint_spark.codecs import bitmap


def _roundtrip(ids):
    v = np.unique(np.asarray(ids, dtype=np.uint64))
    buf = bitmap.encode(np.asarray(ids, dtype=np.uint64))
    np.testing.assert_array_equal(bitmap.decode(buf), v)
    return buf


def test_array_container_sparse():
    rng = np.random.default_rng(1)
    ids = rng.choice(1_000_000, size=3000, replace=False).astype(np.uint64)
    buf = _roundtrip(ids)
    assert len(buf) < 3000 * 2.5 + 64  # ~2 B/value + headers


def test_bitmap_container_dense():
    rng = np.random.default_rng(2)
    ids = rng.choice(65536, size=30_000, replace=False).astype(np.uint64)
    buf = _roundtrip(ids)
    assert len(buf) < 8192 + 64  # one 8 KiB bitset


def test_runs_container_clustered():
    ids = np.concatenate([np.arange(k, k + 500) for k in range(0, 60_000, 2000)]).astype(np.uint64)
    buf = _roundtrip(ids)
    assert len(buf) < 0.02 * len(ids) * 8  # runs ≈ 4 B per run


def test_posting_list_ratio():
    # reference claim: 95-99% for sparse posting lists (docs/ENCODING_ANALYSIS.md:583)
    rng = np.random.default_rng(3)
    ids = np.unique(rng.integers(0, 10_000_000, size=100_000, dtype=np.int64)).astype(np.uint64)
    buf = bitmap.encode(ids)
    assert len(buf) < 0.3 * ids.nbytes  # ≥70% smaller than raw uint64

def test_mixed_blocks_and_bounds():
    ids = np.array([0, 1, 65535, 65536, 65537, 2**32, 2**48 + 5], dtype=np.uint64)
    _roundtrip(ids)
    buf = bitmap.encode(ids)
    assert bitmap.contains(buf, 65536)
    assert not bitmap.contains(buf, 2)
    _roundtrip(np.array([], dtype=np.uint64))


def test_set_algebra():
    rng = np.random.default_rng(4)
    a = rng.choice(200_000, size=20_000, replace=False).astype(np.uint64)
    b = rng.choice(200_000, size=20_000, replace=False).astype(np.uint64)
    ea, eb = bitmap.encode(a), bitmap.encode(b)
    np.testing.assert_array_equal(bitmap.decode(bitmap.bitmap_and(ea, eb)),
                                  np.intersect1d(a, b))
    np.testing.assert_array_equal(bitmap.decode(bitmap.bitmap_or(ea, eb)),
                                  np.union1d(a, b))
    np.testing.assert_array_equal(bitmap.decode(bitmap.bitmap_xor(ea, eb)),
                                  np.setxor1d(a, b))
    np.testing.assert_array_equal(bitmap.decode(bitmap.bitmap_andnot(ea, eb)),
                                  np.setdiff1d(a, b))


def test_full_block_run():
    ids = np.arange(65536, dtype=np.uint64) + np.uint64(131072)  # one full block
    buf = _roundtrip(ids)
    assert len(buf) < 32  # a single (start, length) run + headers
