"""Bloom-sidecar tests: kernel FP/determinism contracts and the engine's
chunk-pruning stage (reference examples/advanced/bloom_filter.c)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from varint_spark import bloom


def test_bloom_no_false_negatives_and_fp_bound():
    rng = np.random.default_rng(41)
    v = rng.integers(-(10**15), 10**15, 8000)
    sc = bloom.build(bloom.hash_ints(v), bits_per_value=10)
    for x in v[::97]:
        assert bloom.might_contain(sc, bloom.probe_hash(int(x), "int64"))
    absent = rng.integers(2 * 10**15, 3 * 10**15, 4000)
    fp = sum(bloom.might_contain(sc, bloom.probe_hash(int(x), "int64"))
             for x in absent) / len(absent)
    # design bound ~1% at 10 bits/value; allow 2.5x sampling slack
    assert fp < 0.025, fp


def test_bloom_strings_and_determinism():
    arr = pa.array([f"user-{i * 7919}" for i in range(5000)],
                   type=pa.large_utf8())
    sc = bloom.build(bloom.hash_strings(arr), bits_per_value=12)
    assert sc == bloom.build(bloom.hash_strings(arr), bits_per_value=12)
    assert bloom.might_contain(sc, bloom.probe_hash("user-0", "str"))
    assert bloom.might_contain(sc, bloom.probe_hash("user-7919", "str"))
    fp = sum(bloom.might_contain(sc, bloom.probe_hash(f"nope-{i}", "str"))
             for i in range(3000)) / 3000
    assert fp < 0.02, fp
    # duplicates don't inflate sizing: the filter is built on UNIQUE values
    dup = pa.array(["a", "b"] * 1000, type=pa.large_utf8())
    assert len(bloom.build(bloom.hash_strings(dup), 10)) < 32


def test_bloom_edge_single_and_bits():
    sc = bloom.build(bloom.hash_ints(np.array([42], dtype=np.int64)), 10)
    assert bloom.might_contain(sc, bloom.probe_hash(42, "int64"))
    # k/m header round-trips through leb128 for larger bit budgets
    sc16 = bloom.build(bloom.hash_ints(np.arange(100000, dtype=np.int64)), 16)
    assert bloom.might_contain(sc16, bloom.probe_hash(99999, "int64"))


def test_engine_bloom_prune_skips_chunks(spark):
    """Scattered high-cardinality column: zone maps keep every chunk, the
    Bloom sidecar drops the chunks that definitely lack the probe, and the
    pruned-decode answer equals the plain filter (answer-invariance)."""
    from varint_spark.engine import (EncodeOptions, decode_blocks,
                                     encode_transcripts, prune_chunks,
                                     prune_chunks_bloom)

    n = 4096
    df = spark.range(n).select(
        F.col("id").alias("rid"), F.lit("all").alias("g"),
        F.concat(F.lit("u"), F.pmod(F.col("id") * 2654435761,
                                    F.lit(1000003)).cast("string")).alias("tag"),
        F.pmod(F.col("id") * 40503, F.lit(999983)).alias("num"))
    opts = EncodeOptions(num_buckets=2, chunk_rows=256, salt_span=1 << 20,
                         group_col="g", order_col="rid",
                         bloom_cols=("tag", "num"))
    kinds = {"rid": "int64", "tag": "str", "num": "int64"}
    blocks = encode_transcripts(df, opts, kinds=kinds).cache()
    n_chunks = blocks.select("part_key", "chunk_id").distinct().count()
    assert n_chunks >= 16

    probe = f"u{(7 * 2654435761) % 1000003}"  # tag of rid=7
    pruned = prune_chunks_bloom(blocks, "tag", probe, kind="str").cache()
    kept = pruned.select("part_key", "chunk_id").distinct().count()
    assert kept < n_chunks * 0.3, (kept, n_chunks)  # real pruning happened
    rows = decode_blocks(pruned, "rid long, tag string, num long",
                         kinds=kinds).filter(F.col("tag") == probe)
    assert [r.rid for r in rows.collect()] == [7]

    # int probe path: num of rid=11
    v = (11 * 40503) % 999983
    pruned_i = prune_chunks_bloom(blocks, "num", v, kind="int64")
    rows_i = decode_blocks(pruned_i, "rid long, tag string, num long",
                           kinds=kinds).filter(F.col("num") == v)
    assert [r.rid for r in rows_i.collect()] == [11]

    # zone maps are useless on this layout (hash-scattered values cover
    # the whole domain in every chunk) — bloom prunes where they can't
    zoned = prune_chunks(blocks, "num", lo=v, hi=v)
    assert zoned.select("part_key", "chunk_id").distinct().count() == n_chunks

    # a column without a sidecar is never pruned (NULL bloom kept)
    no_sc = prune_chunks_bloom(blocks, "rid", 7, kind="int64")
    assert no_sc.select("part_key", "chunk_id").distinct().count() == n_chunks


def test_bloom_deterministic_across_parallelism(spark):
    """The sidecar enters the lineage row, so it must be a deterministic
    function of (group, order, chunk) like the block bytes themselves."""
    from varint_spark.engine import EncodeOptions, encode_transcripts

    df = spark.range(2048).select(
        F.col("id").alias("rid"), F.lit("g").alias("g"),
        F.concat(F.lit("t"), (F.col("id") * 37 % 1009).cast("string")).alias("tag"))
    opts = EncodeOptions(num_buckets=2, chunk_rows=256, salt_span=1 << 20,
                         group_col="g", order_col="rid", bloom_cols=("tag",))
    kinds = {"rid": "int64", "tag": "str"}

    def snapshot(parts):
        b = encode_transcripts(df.repartition(parts), opts, kinds=kinds)
        return sorted((r.part_key, r.chunk_id, r.column,
                       bytes(r.bloom) if r.bloom is not None else None,
                       r.digest)
                      for r in b.select("part_key", "chunk_id", "column",
                                        "bloom", "digest").collect())

    assert snapshot(1) == snapshot(7)
