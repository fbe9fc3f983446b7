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


def _canon(ids):
    """Oracle: canonical encode of an explicit id set."""
    return bitmap.encode(np.array(sorted(ids), dtype=np.uint64))


def test_add_range_matches_setwise_oracle():
    """add_range output must be byte-equal to re-encoding the union —
    canonical-form property across container types and block boundaries."""
    rng = np.random.default_rng(5)
    base_ids = np.unique(rng.integers(0, 1 << 20, 3000, dtype=np.uint64))
    buf = bitmap.encode(base_ids)
    cases = [
        (100, 200),                      # inside one ARRAY block
        (65_530, 65_540),                # crosses a 64Ki block boundary
        (0, 1 << 18),                    # swallows 4 full blocks
        (3 << 16, (3 << 16) + 4096),     # exactly the ARRAY_MAX threshold
        (3 << 16, (3 << 16) + 4097),     # one past it
        ((1 << 20) + 5, (1 << 20) + 6),  # single value in an absent block
        ((1 << 20) + 8, (1 << 20) + 10), # two values (ARRAY tie-break)
        (500, 500),                      # empty range: no-op (min >= max)
        (700, 600),                      # inverted: no-op
    ]
    for lo, hi in cases:
        got = bitmap.add_range(buf, lo, hi)
        want = _canon(set(base_ids.tolist()) | set(range(lo, hi)))
        assert got == want, (lo, hi)
        assert np.array_equal(
            bitmap.decode(got),
            np.unique(np.concatenate([base_ids,
                                      np.arange(lo, hi, dtype=np.uint64)]))
            if hi > lo else base_ids), (lo, hi)


def test_remove_range_matches_setwise_oracle():
    rng = np.random.default_rng(6)
    base_ids = np.unique(rng.integers(0, 1 << 20, 5000, dtype=np.uint64))
    buf = bitmap.encode(base_ids)
    cases = [
        (0, 1 << 20),        # remove everything present
        (65_000, 66_000),    # straddle a block boundary
        (1 << 18, 3 << 18),  # drop full interior blocks
        (42, 43),            # single id
        (10, 10),            # empty range: no-op
    ]
    for lo, hi in cases:
        got = bitmap.remove_range(buf, lo, hi)
        keep = base_ids[(base_ids < lo) | (base_ids >= hi)]
        assert got == bitmap.encode(keep), (lo, hi)


def test_range_ops_never_decode_covered_blocks(monkeypatch):
    """Interior (fully covered) blocks must be emitted as single-run
    containers (add) or dropped (remove) without their payloads being
    decoded — _container_lows is patched to count edge decodes only."""
    calls = []
    orig = bitmap._container_lows

    def counting(ctype, n, payload):
        calls.append(n)
        return orig(ctype, n, payload)

    monkeypatch.setattr(bitmap, "_container_lows", counting)
    # 8 dense blocks; range covers blocks 2..5 fully, edges in 1 and 6
    ids = np.arange(0, 8 << 16, 3, dtype=np.uint64)
    buf = bitmap.encode(ids)
    lo, hi = (1 << 16) + 7, (6 << 16) + 9
    bitmap.add_range(buf, lo, hi)
    assert len(calls) == 2          # only the two edge blocks
    calls.clear()
    bitmap.remove_range(buf, lo, hi)
    assert len(calls) == 2


def test_add_range_boundary_container_transitions():
    """Growing one block across the ARRAY->RUNS/BITMAP thresholds stays
    canonical (the container is re-chosen by the same cost compare the
    encoder uses)."""
    start = 5 << 16
    buf = bitmap.encode(np.array([start + 10], dtype=np.uint64))
    for span in [1, 2, 3, 4095, 4096, 4097, 8191, 8192, 65536]:
        got = bitmap.add_range(buf, start, start + span)
        want = _canon({start + 10} | set(range(start, start + span)))
        assert got == want, span
        # removing the added range must round back to the original
        back = bitmap.remove_range(got, start, start + span)
        assert back == _canon({start + 10} - set(range(start, start + span))), span


def test_iterator_and_iter_blocks():
    rng = np.random.default_rng(9)
    ids = np.unique(rng.integers(0, 1 << 22, 2000, dtype=np.uint64))
    buf = bitmap.encode(ids)
    # block-granular iteration reassembles the full sorted set
    got = np.concatenate([
        (np.uint64(key) << np.uint64(16)) | lows.astype(np.uint64)
        for key, lows in bitmap.iter_blocks(buf)])
    assert np.array_equal(got, ids)
    # the per-value cursor agrees and is lazy (first 100 without exhausting)
    import itertools
    first = list(itertools.islice(bitmap.iterator(buf), 100))
    assert first == ids[:100].tolist()
    assert list(bitmap.iterator(bitmap.encode(np.array([], dtype=np.uint64)))) == []


def test_iter_blocks_is_streaming(monkeypatch):
    """Taking the first block must not parse later containers."""
    calls = []
    orig = bitmap._container_lows

    def counting(ctype, n, payload):
        calls.append(n)
        return orig(ctype, n, payload)

    monkeypatch.setattr(bitmap, "_container_lows", counting)
    ids = np.concatenate([np.arange(100, dtype=np.uint64),
                          np.arange(1 << 16, (1 << 16) + 50, dtype=np.uint64),
                          np.arange(2 << 16, (2 << 16) + 50, dtype=np.uint64)])
    buf = bitmap.encode(ids)
    gen = bitmap.iter_blocks(buf)
    next(gen)
    assert len(calls) == 1
