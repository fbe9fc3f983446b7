"""Hypothesis property tests: every self-describing block round-trips
bit-identically for arbitrary inputs (the ``encode(decode(x)) == x``
criterion from BASELINE.json, strengthened from fixed fixtures to
generated ones)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from varint_spark.codecs import leb128, segdelta
from varint_spark.selector import (
    decode_int_block, decode_str_block, encode_int_block, encode_str_block,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
U64 = st.integers(min_value=0, max_value=2**64 - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(U64, max_size=300))
def test_leb128_any_uint64(xs):
    v = np.array(xs, dtype=np.uint64)
    np.testing.assert_array_equal(leb128.decode(leb128.encode(v), len(v)), v)


@settings(max_examples=200, deadline=None)
@given(st.lists(I64, max_size=300))
def test_int_block_any_int64(xs):
    v = np.array(xs, dtype=np.int64)
    blk = encode_int_block(v)
    np.testing.assert_array_equal(decode_int_block(blk), v)
    # cost gate: never beyond plain + header slack
    assert len(blk) <= 8 * len(v) + 16


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=120))
def test_str_block_any_strings(xs):
    blk = encode_str_block(np.array(xs, dtype=object))
    assert decode_str_block(blk).to_pylist() == xs


@settings(max_examples=150, deadline=None)
@given(st.lists(st.lists(I64, min_size=1, max_size=30), min_size=1, max_size=20))
def test_segdelta_any_segments(seglists):
    v = np.array([x for seg in seglists for x in seg], dtype=np.int64)
    segs = np.array([len(seg) for seg in seglists], dtype=np.int64)
    buf = segdelta.encode(v, segs)
    np.testing.assert_array_equal(segdelta.decode(buf, len(v)), v)
