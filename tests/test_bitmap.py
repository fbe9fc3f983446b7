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


def test_contains_touches_only_one_block():
    """Corrupting every OTHER block's payload must not affect membership
    answers for the intact block — proof the lookup is container-local."""
    import numpy as _np
    from varint_spark.codecs.bitmap import _block_index, contains, encode

    ids = np.concatenate([
        np.arange(100, dtype=np.uint64),                    # block 0
        np.uint64(5 << 16) + np.arange(0, 60000, 7, dtype=np.uint64),  # block 5 dense
        np.uint64(9 << 16) + np.array([1, 2, 3], dtype=np.uint64),     # block 9 tiny
    ])
    data = encode(ids)
    keys, entries = _block_index(data)
    base_ptr = _np.frombuffer(data, dtype=_np.uint8).__array_interface__["data"][0]
    buf = bytearray(data)
    for k, (ctype, n, payload) in zip(keys, entries):
        if int(k) == 5:
            continue
        start = (_np.frombuffer(payload, dtype=_np.uint8)
                 .__array_interface__["data"][0] - base_ptr)
        skip = 0
        if ctype == 2:  # RUNS: keep the n_runs uvarint header intact
            from varint_spark.codecs import blocks as blk
            _, skip = blk.take_uvarint(payload, 0)
        for i in range(start + skip, start + len(payload)):
            buf[i] ^= 0xA5
    corrupted = bytes(buf)
    probe = 5 << 16
    assert contains(corrupted, probe + 7)
    assert not contains(corrupted, probe + 8)
    assert not contains(corrupted, 12345 << 16)  # absent block key


def test_blockwise_ops_match_setwise_and_copy_verbatim():
    from varint_spark.codecs.bitmap import (
        bitmap_and, bitmap_andnot, bitmap_or, bitmap_xor, decode, encode)

    rng = np.random.default_rng(21)
    a_ids = np.unique(rng.integers(0, 1 << 22, 40_000).astype(np.uint64))
    b_ids = np.unique(rng.integers(1 << 21, 3 << 21, 30_000).astype(np.uint64))
    a, b = encode(a_ids), encode(b_ids)
    np.testing.assert_array_equal(decode(bitmap_and(a, b)),
                                  np.intersect1d(a_ids, b_ids))
    np.testing.assert_array_equal(decode(bitmap_or(a, b)), np.union1d(a_ids, b_ids))
    np.testing.assert_array_equal(decode(bitmap_xor(a, b)), np.setxor1d(a_ids, b_ids))
    np.testing.assert_array_equal(decode(bitmap_andnot(a, b)),
                                  np.setdiff1d(a_ids, b_ids))
    # disjoint key spaces: OR must reproduce both inputs' blocks verbatim
    hi = encode(np.uint64(1 << 40) + np.arange(1000, dtype=np.uint64))
    both = bitmap_or(a, hi)
    np.testing.assert_array_equal(
        decode(both), np.union1d(a_ids, (1 << 40) + np.arange(1000)))


def test_distributed_build_matches_local_encode(spark):
    """build_bitmaps: per-partition partial encode + bitmap_or merge must
    produce byte-identical bitmaps to a single local encode, at any
    parallelism (the determinism invariant extends to the index build)."""
    import pyspark.sql.functions as F

    from varint_spark.bitmap_index import build_bitmaps
    from varint_spark.codecs.bitmap import decode, encode

    rng = np.random.default_rng(7)
    keys = np.array(["click", "purchase", "view"])[rng.integers(0, 3, 5000)]
    ids = rng.integers(0, 1 << 20, 5000)
    df = spark.createDataFrame(
        [(str(k), int(i)) for k, i in zip(keys, ids)], "k string, user_id long")

    expected = {
        k: encode(np.unique(ids[keys == k]).astype(np.uint64))
        for k in ("click", "purchase", "view")
    }
    for parts in (2, 7):
        built = {r.k: bytes(r.bitmap)
                 for r in build_bitmaps(df.repartition(parts), "k", "user_id",
                                        num_partitions=parts).collect()}
        assert set(built) == set(expected)
        for k in expected:
            assert built[k] == expected[k], (parts, k)
            np.testing.assert_array_equal(
                decode(built[k]), np.unique(ids[keys == k]).astype(np.uint64))


def test_build_bitmaps_null_key_raises(spark):
    import pytest

    from varint_spark.bitmap_index import build_bitmaps

    df = spark.createDataFrame([("a", 1), (None, 2)], "k string, id long")
    with pytest.raises(Exception, match="null"):
        build_bitmaps(df, "k", "id").collect()


def test_build_bitmaps_int_keys(spark):
    from varint_spark.bitmap_index import build_bitmaps
    from varint_spark.codecs import bitmap

    df = spark.createDataFrame([(k, k * 10 + i) for k in (1, 2) for i in range(5)],
                               "k long, id long")
    out = {r.k: r.bitmap for r in build_bitmaps(df, "k", "id").collect()}
    assert set(out) == {1, 2}
    assert bitmap.decode(out[2]).tolist() == [20, 21, 22, 23, 24]
