"""Lossy float codec — mirrors reference src/varintFloatTest.c suites:
FULL lossless, HIGH/MEDIUM/LOW round-trip within the mode's error bound,
special values (NaN/Inf/zero/subnormal), precision error bounds, automatic
precision selection, compression ratio, single value."""

from __future__ import annotations

import math

import numpy as np
import pytest

from varint_spark.codecs import blocks, f64lossy


def _roundtrip(vals: np.ndarray, precision: str) -> np.ndarray:
    bits = vals.view(np.int64)
    payload = f64lossy.encode(bits, precision)
    return f64lossy.decode(payload, len(bits)).view(np.float64)


def _fixture(n=5000, seed=1):
    rng = np.random.default_rng(seed)
    return np.concatenate([
        rng.normal(0, 1, n),                  # unit scale
        rng.normal(0, 1e12, n // 4),          # large magnitudes
        rng.normal(0, 1e-12, n // 4),         # tiny magnitudes
        25.0 + rng.normal(0, 0.05, n // 4),   # sensor-like (ref MEDIUM case)
    ])


def test_full_precision_is_lossless():
    vals = _fixture()
    out = _roundtrip(vals, "full")
    np.testing.assert_array_equal(out.view(np.int64), vals.view(np.int64))


@pytest.mark.parametrize("precision", ["high", "medium", "low"])
def test_lossy_roundtrip_within_error_bound(precision):
    vals = _fixture()
    out = _roundtrip(vals, precision)
    bound = f64lossy.max_relative_error(precision)
    rel = np.abs(out - vals) / np.abs(vals)
    assert float(rel.max()) <= bound, (precision, float(rel.max()))


def test_special_values_exact_in_every_mode():
    vals = np.array([np.nan, np.inf, -np.inf, 0.0, -0.0, 5e-324, 1.5,
                     float.fromhex("0x1.fp-1030")])  # subnormal
    for precision in f64lossy.PRECISIONS:
        out = _roundtrip(vals, precision)
        assert math.isnan(out[0])
        # NaN payload bits preserved exactly (stored as special)
        assert out[0:1].view(np.int64)[0] == vals[0:1].view(np.int64)[0]
        assert out[1] == np.inf and out[2] == -np.inf
        assert out[3] == 0.0 and math.copysign(1.0, out[4]) == -1.0
        assert out[5] == 5e-324 and out[7] == vals[7]  # subnormals exact


def test_precision_error_bounds_table():
    # reference varintFloatPrecisionMaxRelativeError = 2^-mantissa_bits
    assert f64lossy.max_relative_error("full") == 2.0 ** -52
    assert f64lossy.max_relative_error("high") == 2.0 ** -23
    assert f64lossy.max_relative_error("medium") == 2.0 ** -10
    assert f64lossy.max_relative_error("low") == 2.0 ** -4


def test_automatic_precision_selection():
    # thresholds mirror reference varintFloatEncodeAuto (varintFloat.c:581-589)
    assert f64lossy.select_precision(1e-12) == "full"
    assert f64lossy.select_precision(1e-6) == "high"
    assert f64lossy.select_precision(1e-3) == "medium"
    assert f64lossy.select_precision(0.05) == "low"
    vals = _fixture(1000)
    blk = f64lossy.encode_block_auto(vals.view(np.int64), 1e-3)
    cid, count, payload = blocks.unpack_block(blk)
    assert cid == blocks.F64_LOSSY and count == len(vals)
    out = f64lossy.decode(payload, count).view(np.float64)
    rel = np.abs(out - vals) / np.abs(vals)
    assert float(rel.max()) <= 1e-3


def test_compression_ratio():
    vals = _fixture(8000)
    bits = vals.view(np.int64)
    for precision, floor in [("medium", 2.5), ("low", 3.5)]:
        enc = f64lossy.encode(bits, precision)
        assert len(enc) == f64lossy.encoded_size(bits, precision)
        assert vals.nbytes / len(enc) >= floor, precision
        # reference claims 1.5-4.0x (README.md:160)


def test_single_value_and_empty():
    one = np.array([3.14159])
    assert _roundtrip(one, "medium")[0] == pytest.approx(3.14159, rel=2**-10)
    empty = np.empty(0, dtype=np.float64)
    assert len(_roundtrip(empty, "low")) == 0


def test_rounding_carry_into_exponent():
    # value whose mantissa rounds up across the power-of-two boundary:
    # round-to-nearest must carry into the exponent, not wrap
    v = np.array([np.nextafter(2.0, 0.0)])  # 1.111...1 x 2^0
    out = _roundtrip(v, "low")
    assert out[0] == 2.0


def test_decode_via_selector_block_dispatch():
    from varint_spark.selector import decode_column
    vals = _fixture(500)
    blk = f64lossy.encode_block(vals.view(np.int64), "medium")
    out = decode_column(blk).to_numpy(zero_copy_only=False).astype(np.int64)
    rel = np.abs(out.view(np.float64) - vals) / np.abs(vals)
    assert float(rel.max()) <= 2.0 ** -10


def test_engine_lossy_roundtrip_within_bound(spark):
    """End-to-end: EncodeOptions(f64_precision=...) encodes every f64
    column lossily; decode stays within the bound, other columns exact."""
    import pandas as pd
    from varint_spark.engine import EncodeOptions, encode_transcripts, decode_blocks, roundtrip
    rng = np.random.default_rng(9)
    vals = rng.normal(100, 30, 4000)
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    opts = EncodeOptions(num_buckets=4, chunk_rows=512, salt_span=2048,
                         group_col="id", order_col="id", f64_precision="medium")
    blocks_df = encode_transcripts(df, opts)
    codecs = {r.codec for r in blocks_df.filter("column = 'v'").select("codec").distinct().collect()}
    assert codecs == {"f64_lossy"}
    out = decode_blocks(blocks_df, "id long, v double").toPandas().sort_values("id")
    got = out.v.to_numpy()
    rel = np.abs(got - vals) / np.abs(vals)
    assert float(rel.max()) <= 2.0 ** -10
    assert (out.id.to_numpy() == np.arange(4000)).all()


def test_exponent_mode_subsumption_ratios():
    """Same-magnitude (COMMON_EXPONENT) and drifting (DELTA_EXPONENT) data:
    the nested adaptive sign/exponent blocks collapse to ~0 bits, pushing
    MEDIUM past the reference's claimed 1.5-4.0x band."""
    rng = np.random.default_rng(5)
    sensor = 25.0 + rng.normal(0, 0.05, 10_000)
    drift = np.cumsum(rng.normal(1, 0.1, 10_000))
    for v in (sensor, drift):
        enc = f64lossy.encode(v.view(np.int64), "medium")
        assert v.nbytes / len(enc) >= 5.0
        out = f64lossy.decode(enc, len(v)).view(np.float64)
        assert float((np.abs(out - v) / np.abs(v)).max()) <= 2.0 ** -10
