"""Z-order clustering: Morton math, multi-dim chunk pruning payoff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from varint_spark.engine import (EncodeOptions, decode_blocks,
                                 encode_transcripts, prune_chunks)
from varint_spark.zorder import with_zorder, zvalue


def _morton2(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_is_morton_interleave(spark):
    rows = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = df.withColumn("z", zvalue(["a", "b"], [0, 0], [7, 7], bits=3))
    got = {(r.a, r.b): r.z for r in out.collect()}
    assert got == {(a, b): _morton2(a, b, 3) for a, b in rows}
    with pytest.raises(ValueError, match="int64 budget"):
        zvalue(["a", "b", "a", "b"], [0] * 4, [7] * 4, bits=21)


def test_zorder_prunes_both_dimensions(spark):
    """Events laid out in z-order: BOTH user_id and ts range predicates
    drop chunks; the same data laid out in plain ts order prunes ~nothing
    on user_id. Decode + exact filter stays correct either way."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("event_id", "ts", "user_id")
    zdf = with_zorder(ev, ["user_id", "ts"], bits=16)
    zdf = zdf.withColumn("_zb", F.shiftrightunsigned("_z", 24).cast("long"))
    opts = EncodeOptions(num_buckets=2, chunk_rows=64, salt_span=2**60,
                         group_col="_zb", order_col="_z")
    kinds = {"event_id": "int64", "ts": "tsntz", "user_id": "int64"}
    blocks = encode_transcripts(zdf, opts, kinds=kinds).cache()

    lo_u, hi_u = 2, 5  # quarter of the 0..14 user domain, lower half
    n_all = blocks.select("part_key", "chunk_id").distinct().count()
    z_kept = prune_chunks(blocks, "user_id", lo_u, hi_u) \
        .select("part_key", "chunk_id").distinct().count()
    assert z_kept < n_all * 0.8, (z_kept, n_all)  # real pruning on dim 1

    ts_stats = blocks.filter(F.col("column") == "ts").agg(
        F.min("min_val").alias("lo"), F.max("max_val").alias("hi")).collect()[0]
    mid = (ts_stats.lo + ts_stats.hi) // 2
    z_kept_ts = prune_chunks(blocks, "ts", ts_stats.lo, mid) \
        .select("part_key", "chunk_id").distinct().count()
    assert z_kept_ts < n_all * 0.9  # still prunes on dim 2

    pruned = prune_chunks(prune_chunks(blocks, "user_id", lo_u, hi_u),
                          "ts", ts_stats.lo, mid)
    got = decode_blocks(pruned, "event_id bigint, ts timestamp_ntz, user_id bigint") \
        .filter((F.col("user_id").between(lo_u, hi_u))
                & (F.unix_micros(F.to_timestamp("ts")).between(ts_stats.lo, mid)))
    want = ev.filter((F.col("user_id").between(lo_u, hi_u))
                     & (F.unix_micros(F.to_timestamp("ts"))
                        .between(ts_stats.lo, mid)))
    assert sorted(r.event_id for r in got.collect()) == \
        sorted(r.event_id for r in want.collect())
