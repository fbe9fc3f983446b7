"""Tagged (sqlite4) varint — byte-width maxima, memcmp sortability, mass
roundtrips (mirrors reference src/varintTaggedTest.c and the tagged byte
maxima 240/2287/67823 from examples/standalone/example_tagged.c:48-52)."""

from __future__ import annotations

import numpy as np
import pytest

from varint_spark.codecs import tagged

BOUNDS = [0, 1, 239, 240, 241, 2286, 2287, 2288, 67822, 67823, 67824,
          (1 << 24) - 1, 1 << 24, (1 << 32) - 1, 1 << 32, (1 << 40) - 1,
          1 << 40, (1 << 48) - 1, 1 << 48, (1 << 56) - 1, 1 << 56,
          (1 << 64) - 1]


def test_width_maxima_and_layout():
    # widths at the documented maxima (src/varintTagged.h:18-26)
    v = np.array(BOUNDS, dtype=np.uint64)
    sizes = tagged.encoded_sizes(v)
    expect = [1, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9]
    assert sizes.tolist() == expect
    # spot byte layouts
    assert tagged.put64(240) == b"\xf0"
    assert tagged.put64(241) == bytes([241, 1])
    assert tagged.put64(2287) == bytes([248, 255])
    assert tagged.put64(2288) == bytes([249, 0, 0])
    assert tagged.put64((1 << 64) - 1) == bytes([255] + [0xFF] * 8)


def test_roundtrip_boundaries_and_random():
    v = np.array(BOUNDS, dtype=np.uint64)
    np.testing.assert_array_equal(tagged.decode(tagged.encode(v), len(v)), v)
    rng = np.random.default_rng(42)
    raw = rng.integers(0, 2**63, 200_000, dtype=np.int64).view(np.uint64)
    nbits = rng.integers(0, 65, 200_000)
    mask = np.where(nbits >= 64, np.uint64(0xFFFFFFFFFFFFFFFF),
                    (np.uint64(1) << nbits.astype(np.uint64)) - np.uint64(1))
    v = raw & mask  # bit-width-weighted, ref varintCompare.c:28-35
    buf = tagged.encode(v)
    assert len(buf) == int(tagged.encoded_sizes(v).sum())
    np.testing.assert_array_equal(tagged.decode(buf, len(v)), v)


def test_memcmp_sortable():
    """THE tagged property (src/varintTagged.h:12): encoded byte strings
    sort exactly like their values under plain lexicographic comparison."""
    rng = np.random.default_rng(7)
    nbits = rng.integers(0, 65, 5000)
    raw = rng.integers(0, 2**63, 5000, dtype=np.int64).view(np.uint64)
    mask = np.where(nbits >= 64, np.uint64(0xFFFFFFFFFFFFFFFF),
                    (np.uint64(1) << nbits.astype(np.uint64)) - np.uint64(1))
    vals = np.unique(np.concatenate([raw & mask, np.array(BOUNDS, dtype=np.uint64)]))
    encs = [tagged.put64(int(x)) for x in vals]
    assert encs == sorted(encs)  # vals already sorted by np.unique


def test_scalar_get64_and_errors():
    for x in BOUNDS:
        enc = tagged.put64(x)
        got, used = tagged.get64(enc + b"trailing")
        assert (got, used) == (x, len(enc))
    with pytest.raises(ValueError):
        tagged.decode(tagged.put64(1 << 40)[:-1], 1)  # truncated stream
    with pytest.raises(ValueError):
        tagged.decode(tagged.encode(np.arange(10, dtype=np.uint64)), 9)  # bad count
    assert len(tagged.decode(b"", None)) == 0


# ---- encoded-form arithmetic (varintTaggedAddNoGrow / AddGrow) --------------


def test_add_in_place_no_grow_patches_bytes():
    v = np.array([0, 5, 100, 241, 300, 2288, 70000, 1 << 30, 1 << 50],
                 dtype=np.uint64)
    buf = tagged.encode(v)
    out, regrown = tagged.add_in_place(buf, 7)
    assert regrown == 0 and len(out) == len(buf)  # pure byte surgery
    np.testing.assert_array_equal(tagged.decode(out), v + np.uint64(7))
    # negative delta, still within every width class
    out2, r2 = tagged.add_in_place(out, -7)
    assert r2 == 0 and out2 == buf  # exact byte restoration


def test_add_in_place_grow_across_width_boundaries():
    v = np.array([239, 240, 2287, 67823, (1 << 24) - 1, (1 << 32) - 1],
                 dtype=np.uint64)
    buf = tagged.encode(v)
    out, regrown = tagged.add_in_place(buf, 1)
    assert regrown == 5  # every value except 239 crosses a width boundary
    np.testing.assert_array_equal(tagged.decode(out), v + np.uint64(1))
    # canonical: identical to a fresh encode of the new values
    assert out == tagged.encode(v + np.uint64(1))


def test_add_in_place_preserves_memcmp_order():
    rng = np.random.default_rng(17)
    v = np.unique(rng.integers(0, 1 << 48, 500, dtype=np.int64).view(np.uint64))
    out, _ = tagged.add_in_place(tagged.encode(v), 1234)
    b = np.frombuffer(out, dtype=np.uint8)
    starts = tagged._stream_starts(b)
    lens = tagged.lengths_from_first_bytes(b[starts])
    keys = [bytes(b[s:s + l]) for s, l in zip(starts, lens)]
    assert keys == sorted(keys)  # encoded order == value order, still


def test_add_in_place_overflow_and_underflow_raise():
    import pytest

    buf = tagged.encode(np.array([5, (1 << 64) - 1], dtype=np.uint64))
    with pytest.raises(OverflowError):
        tagged.add_in_place(buf, 1)
    with pytest.raises(OverflowError):
        tagged.add_in_place(tagged.encode(np.array([3], dtype=np.uint64)), -4)
