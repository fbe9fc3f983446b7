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
