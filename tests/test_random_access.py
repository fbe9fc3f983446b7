"""Random access / partial decode parity (ref varintFORGetAt,
varintPFORGetAt, varintRLEGetAt, varintDictFind — SURVEY §2.A.5)."""

from __future__ import annotations

import numpy as np
import pytest

from varint_spark.codecs import blocks, random_access
from varint_spark.selector import codec_name_of, decode_int_block, encode_int_block

from fixtures import INT_FIXTURES


@pytest.mark.parametrize("fixture", list(INT_FIXTURES))
def test_get_at_matches_full_decode(fixture):
    v = INT_FIXTURES[fixture]()
    blk = encode_int_block(v)
    full = decode_int_block(blk)
    rng = np.random.default_rng(1)
    for idx in rng.integers(0, len(v), size=25):
        assert random_access.get_at(blk, int(idx)) == int(full[idx]), (fixture, idx)
    # boundaries
    assert random_access.get_at(blk, 0) == int(full[0])
    assert random_access.get_at(blk, len(v) - 1) == int(full[-1])


def test_get_range_for_codec():
    from varint_spark.codecs import foref
    v = INT_FIXTURES["tight_cluster"]()
    blk = blocks.pack_block(blocks.FOR, len(v), foref.encode(v))
    assert codec_name_of(blk) == "for"
    for start, n in [(0, 10), (777, 100), (len(v) - 5, 5), (123, 0)]:
        np.testing.assert_array_equal(random_access.get_range(blk, start, n), v[start : start + n])


def test_get_at_bounds():
    v = INT_FIXTURES["tight_cluster"]()
    blk = encode_int_block(v)
    with pytest.raises(IndexError):
        random_access.get_at(blk, len(v))
    with pytest.raises(IndexError):
        random_access.get_at(blk, -1)


def _pfor_block():
    from varint_spark.codecs import pfor
    rng = np.random.default_rng(7)
    v = rng.integers(1000, 2000, 20_000).astype(np.int64)
    v[rng.integers(0, len(v), 150)] = rng.integers(2**40, 2**50, 150)  # outliers
    blk = blocks.pack_block(blocks.PFOR, len(v), pfor.encode(v))
    assert codec_name_of(blk) == "pfor"
    return v, blk


def test_pfor_get_range_matches_full_decode():
    v, blk = _pfor_block()
    full = decode_int_block(blk)
    np.testing.assert_array_equal(full, v)
    rng = np.random.default_rng(3)
    spans = [(0, 64), (len(v) - 64, 64), (0, len(v)), (5000, 0)]
    spans += [(int(s), int(n)) for s, n in
              zip(rng.integers(0, len(v) - 512, 20), rng.integers(1, 512, 20))]
    for start, n in spans:
        np.testing.assert_array_equal(
            random_access.get_range(blk, start, n), v[start:start + n], (start, n))


def test_pfor_get_at_never_full_decodes(monkeypatch):
    """The O(1) path must not touch pfor.decode or the full body unpack
    (ref varintPFORGetAt src/varintPFOR.c:261)."""
    from varint_spark.codecs import bitpack as bp, pfor
    v, blk = _pfor_block()
    monkeypatch.setattr(pfor, "decode",
                        lambda *a, **k: (_ for _ in ()).throw(AssertionError("full decode")))
    n_total = len(v)
    real_unpack = bp.unpack
    def guarded(buf, width, count):
        assert count < n_total, "full-body unpack in get_at"
        return real_unpack(buf, width, count)
    monkeypatch.setattr(bp, "unpack", guarded)
    rng = np.random.default_rng(5)
    full = np.array(v)
    for idx in rng.integers(0, len(v), 50):
        assert random_access.get_at(blk, int(idx)) == int(full[idx])


def test_rle_and_dict_get_range():
    from varint_spark.codecs import dict_codec, rle
    rng = np.random.default_rng(11)
    runs = np.repeat(rng.integers(-5, 5, 300).astype(np.int64), rng.integers(1, 50, 300))
    blk_rle = blocks.pack_block(blocks.RLE_INT, len(runs), rle.encode(runs))
    vals = rng.integers(0, 30, 10_000).astype(np.int64) * 1000
    blk_dict = blocks.pack_block(blocks.DICT_INT, len(vals), dict_codec.encode(vals))
    for blk, ref in [(blk_rle, runs), (blk_dict, vals)]:
        for start, n in [(0, 1), (17, 500), (len(ref) - 3, 3), (42, 0)]:
            np.testing.assert_array_equal(random_access.get_range(blk, start, n),
                                          ref[start:start + n])
