"""HyperLogLog sidecar: kernel estimate/merge contracts and the engine's
metadata-only approximate COUNT(DISTINCT) (varint_spark/hll.py +
aggregate.approx_distinct_blocks)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from varint_spark import bloom, hll


def test_hll_estimate_accuracy_across_scales():
    rng = np.random.default_rng(7)
    for n in (100, 5_000, 200_000):
        v = rng.integers(0, 10**15, n)
        distinct = len(np.unique(v))
        est = hll.estimate(hll.build(bloom.hash_ints(v), p=12))
        assert abs(est / distinct - 1) < 0.05, (n, est, distinct)
    # duplicates don't move the estimate (set semantics)
    v = rng.integers(0, 1000, 50_000)
    est = hll.estimate(hll.build(bloom.hash_ints(v), p=12))
    assert abs(est / len(np.unique(v)) - 1) < 0.05


def test_hll_merge_equals_union_build():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 10**12, 30_000)
    b = rng.integers(5 * 10**11, 2 * 10**12, 30_000)
    sa = hll.build(bloom.hash_ints(a), p=12)
    sb = hll.build(bloom.hash_ints(b), p=12)
    merged = hll.merge(sa, sb)
    union = hll.build(bloom.hash_ints(np.concatenate([a, b])), p=12)
    assert merged == union  # register max == build-on-union, exactly
    assert hll.merge_many([sa, None, sb]) == union
    assert hll.merge(sa, sa) == sa  # idempotent
    with pytest.raises(ValueError, match="precision"):
        hll.merge(sa, hll.build(bloom.hash_ints(a), p=10))
    with pytest.raises(ValueError, match="p must be"):
        hll.build(bloom.hash_ints(a), p=3)


def test_hll_edge_shapes():
    assert hll.estimate(hll.build(np.array([], dtype=np.uint64))) == 0
    one = hll.build(bloom.hash_ints(np.array([42], dtype=np.int64)))
    assert hll.estimate(one) == 1
    # determinism: same value set, any order/duplication -> same bytes
    v = np.array([5, 1, 5, 9, 1], dtype=np.int64)
    assert hll.build(bloom.hash_ints(v)) == \
        hll.build(bloom.hash_ints(np.array([9, 5, 1], dtype=np.int64)))


def test_engine_approx_distinct_from_metadata(spark):
    from varint_spark.aggregate import approx_distinct_blocks
    from varint_spark.engine import (EncodeOptions, encode_transcripts,
                                     prune_chunks)

    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("rid"), (F.col("id") % 5).cast("string").alias("g"),
        F.pmod(F.col("id") * 7919, F.lit(1009)).alias("v"),
        F.concat(F.lit("u"), F.pmod(F.col("id") * 104729,
                                    F.lit(4999)).cast("string")).alias("s"))
    opts = EncodeOptions(num_buckets=2, chunk_rows=1024, salt_span=1 << 20,
                         group_col="g", order_col="rid",
                         hll_cols=("rid", "v", "s"))
    kinds = {"rid": "int64", "v": "int64", "s": "str"}
    blocks = encode_transcripts(df, opts, kinds=kinds).cache()
    got = {r.column: r.approx_distinct for r in
           approx_distinct_blocks(blocks, ["rid", "v", "s"]).collect()}
    for col, true in (("rid", n), ("v", 1009), ("s", 4999)):
        assert abs(got[col] / true - 1) < 0.05, (col, got[col], true)
    # composes with pruning: distinct over a chunk SUBSET, still no decode
    sub = prune_chunks(blocks, "rid", lo=0, hi=n // 4)
    est = {r.column: r.approx_distinct for r in
           approx_distinct_blocks(sub, ["rid"]).collect()}["rid"]
    n_sub = sub.filter(F.col("column") == "rid").agg(
        F.sum("count")).collect()[0][0]
    assert abs(est / n_sub - 1) < 0.06  # rid unique: distinct ≈ rows kept
    # opt-out columns fail loudly rather than under-counting
    blocks2 = encode_transcripts(
        df, EncodeOptions(num_buckets=1, chunk_rows=1024,
                          salt_span=1 << 20, group_col="g",
                          order_col="rid"), kinds=kinds)
    with pytest.raises(Exception, match="without HLL sidecars"):
        approx_distinct_blocks(blocks2, ["rid"]).collect()


def test_hll_deterministic_across_parallelism(spark):
    from varint_spark.engine import EncodeOptions, encode_transcripts

    df = spark.range(4096).select(
        F.col("id").alias("rid"), F.lit("g").alias("g"),
        F.pmod(F.col("id") * 37, F.lit(509)).alias("v"))
    opts = EncodeOptions(num_buckets=2, chunk_rows=512, salt_span=1 << 20,
                         group_col="g", order_col="rid", hll_cols=("v",))
    kinds = {"rid": "int64", "v": "int64"}

    def snap(parts):
        b = encode_transcripts(df.repartition(parts), opts, kinds=kinds)
        return sorted((r.part_key, r.chunk_id, r.column,
                       bytes(r.hll) if r.hll is not None else None)
                      for r in b.select("part_key", "chunk_id", "column",
                                        "hll").collect())

    assert snap(1) == snap(5)
