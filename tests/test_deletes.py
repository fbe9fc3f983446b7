"""Deletion vectors: row-level DELETE as bitmap sidecars over the
engine's own Roaring-style codec (varint_spark.deletes) — build from
encoded-form predicates, canonical OR-merge, decode-time masking, and
compaction fold-in."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from varint_spark.deletes import delete_where, merge_dv
from varint_spark.engine import (EncodeOptions, compact_blocks, decode_blocks,
                                 encode_transcripts)

DDL = "event_id bigint, g bigint, tag string, v bigint"
OPTS = EncodeOptions(num_buckets=4, chunk_rows=256, salt_span=1024,
                     group_col="g", order_col="event_id")


@pytest.fixture(scope="module")
def table(spark):
    n = 4000
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "g": (np.arange(n, dtype=np.int64) * 2654435761) % 37,
        "tag": [f"t{int(x):02d}" for x in rng.integers(0, 40, n)],
        "v": rng.integers(-1000, 1000, n).astype(np.int64),
    })
    df = spark.createDataFrame(pdf).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def blocks(table):
    b = encode_transcripts(table, OPTS).cache()
    b.count()
    return b


def _pdf(df):
    return df.toPandas().sort_values("event_id").reset_index(drop=True)


def test_delete_range_matches_filter(spark, table, blocks):
    dv = delete_where(blocks, "v", lo=0, hi=499)
    got = decode_blocks(blocks, DDL, deletes=dv)
    want = table.filter(~F.col("v").between(0, 499))
    pd.testing.assert_frame_equal(_pdf(got), _pdf(want))
    # DV sidecar bytes track selectivity, not store size
    total = dv.agg(F.sum("n_deleted")).first()[0]
    assert total == table.filter(F.col("v").between(0, 499)).count()


def test_delete_string_eq_and_prefix(spark, table, blocks):
    dv = delete_where(blocks, "tag", kind="str", eq="t07")
    got = decode_blocks(blocks, DDL, deletes=dv)
    want = table.filter(F.col("tag") != "t07")
    pd.testing.assert_frame_equal(_pdf(got), _pdf(want))

    dv2 = delete_where(blocks, "tag", kind="str", prefix="t1")
    got2 = decode_blocks(blocks, DDL, deletes=dv2)
    want2 = table.filter(~F.col("tag").startswith("t1"))
    pd.testing.assert_frame_equal(_pdf(got2), _pdf(want2))


def test_merge_is_or_and_canonical(spark, table, blocks):
    d_lo = delete_where(blocks, "v", lo=0, hi=499)
    d_tag = delete_where(blocks, "tag", kind="str", eq="t07")
    merged = merge_dv(d_lo, d_tag)
    got = decode_blocks(blocks, DDL, deletes=merged)
    want = table.filter(~(F.col("v").between(0, 499) | (F.col("tag") == "t07")))
    pd.testing.assert_frame_equal(_pdf(got), _pdf(want))

    # canonical bytes: merge order never shows; self-merge is idempotent
    a = {(r.part_key, r.chunk_id): bytes(r.dv)
         for r in merge_dv(d_lo, d_tag).collect()}
    b = {(r.part_key, r.chunk_id): bytes(r.dv)
         for r in merge_dv(d_tag, d_lo).collect()}
    assert a == b
    twice = {(r.part_key, r.chunk_id): bytes(r.dv)
             for r in merge_dv(d_lo, d_lo).collect()}
    base = {(r.part_key, r.chunk_id): bytes(r.dv) for r in d_lo.collect()}
    assert twice == base


def test_delete_whole_chunks_and_everything(spark, table, blocks):
    # every row matches → every chunk fully deleted → empty decode
    dv = delete_where(blocks, "event_id", lo=-1)
    assert decode_blocks(blocks, DDL, deletes=dv).count() == 0
    # a DV row deleting a full chunk yields no rows from that chunk only
    one = dv.limit(1)
    n_deleted = one.first().n_deleted
    remaining = decode_blocks(blocks, DDL, deletes=one).count()
    assert remaining == table.count() - n_deleted


def test_compaction_fold_in(spark, table, blocks):
    dv = merge_dv(delete_where(blocks, "v", lo=0, hi=499),
                  delete_where(blocks, "tag", kind="str", eq="t07"))
    folded = compact_blocks(blocks, DDL, target_chunk_rows=512,
                            group_col="g", deletes=dv).cache()
    # the rewritten store answers identically WITHOUT any vectors
    got = decode_blocks(folded, DDL)
    want = decode_blocks(blocks, DDL, deletes=dv)
    pd.testing.assert_frame_equal(_pdf(got), _pdf(want))
    # fold-in is byte-deterministic at any parallelism
    f2 = compact_blocks(blocks.repartition(7), DDL, target_chunk_rows=512,
                        group_col="g", deletes=dv)
    d1 = {tuple(r[:3]): r[3] for r in
          folded.select("part_key", "chunk_id", "column", "digest").collect()}
    d2 = {tuple(r[:3]): r[3] for r in
          f2.select("part_key", "chunk_id", "column", "digest").collect()}
    assert d1 == d2


def test_delete_where_validation(spark, blocks):
    with pytest.raises(ValueError, match="predicate"):
        delete_where(blocks, "v")
    with pytest.raises(ValueError, match="at most one"):
        delete_where(blocks, "tag", kind="str", eq="x", prefix="y")
    with pytest.raises(ValueError, match="not both"):
        delete_where(blocks, "tag", kind="str", eq="x", lo=3)


def test_delete_where_kind_discipline(spark, blocks):
    with pytest.raises(ValueError, match="kind='str'"):
        delete_where(blocks, "v", eq="x")            # eq on int kind
    with pytest.raises(ValueError, match="integer/timestamp"):
        delete_where(blocks, "tag", kind="str", lo=3)  # bounds on str kind


def test_decode_where_respects_deletes(spark, table, blocks):
    """Encoded-form predicate reads must not resurrect deleted rows:
    decode_blocks_where(deletes=) = predicate ∩ not-deleted."""
    from varint_spark.engine import decode_blocks_where

    dv = delete_where(blocks, "tag", kind="str", eq="t07")
    got = decode_blocks_where(blocks, DDL, "v", lo=0, deletes=dv)
    want = table.filter((F.col("v") >= 0) & (F.col("tag") != "t07"))
    pd.testing.assert_frame_equal(_pdf(got), _pdf(want))
    # string-predicate path too
    got2 = decode_blocks_where(blocks, DDL, "tag", None, prefix="t0",
                               deletes=dv)
    want2 = table.filter(F.col("tag").startswith("t0")
                         & (F.col("tag") != "t07"))
    pd.testing.assert_frame_equal(_pdf(got2), _pdf(want2))
