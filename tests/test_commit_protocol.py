"""Crash-atomic commit manifests: a logical commit touches several
files (lineage append, delete-log appends across stores, an overlay
encode); the marker under <root>/commits is written LAST, readers honor
only manifested ids, so every partial write of a crashed commit stays
invisible and a retry converges."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from varint_spark.deletes import delete_where
from varint_spark.engine import EncodeOptions
from varint_spark.lineage import (committed_ids, delete_checkpointed,
                                  encode_checkpointed, read_blocks,
                                  read_snapshot, upsert_checkpointed,
                                  _write_manifest)

DDL = "event_id bigint, g bigint, v bigint"
OPTS = EncodeOptions(num_buckets=2, chunk_rows=128, salt_span=1 << 30,
                     group_col="g", order_col="event_id")


def _batch(spark, lo, hi, v_of=lambda ids: (ids * 37) % 1000):
    ids = np.arange(lo, hi, dtype=np.int64)
    return spark.createDataFrame(pd.DataFrame(
        {"event_id": ids, "g": ids % 5, "v": v_of(ids)}))


def _pdf(df):
    return df.toPandas().sort_values("event_id").reset_index(drop=True)


def test_crashed_delete_is_invisible_until_manifested(spark, tmp_path):
    root = str(tmp_path / "store")
    a = _batch(spark, 0, 500)
    encode_checkpointed(a, root, OPTS)

    blocks = read_blocks(spark, root).drop("pk")
    res = delete_checkpointed(delete_where(blocks, "v", lo=0, hi=99), root,
                              write_manifest=False)  # "crash" before marker
    assert res["rows_deleted"] > 0
    # the delete rows are on disk but unmanifested: reads ignore them
    pd.testing.assert_frame_equal(_pdf(read_snapshot(spark, root, DDL)),
                                  _pdf(a))
    # the marker lands -> the delete applies, history intact
    _write_manifest(root, res["commit"])
    pd.testing.assert_frame_equal(
        _pdf(read_snapshot(spark, root, DDL)),
        _pdf(a.filter(~F.col("v").between(0, 99))))
    pd.testing.assert_frame_equal(
        _pdf(read_snapshot(spark, root, DDL, as_of=1)), _pdf(a))


def test_crashed_upsert_is_invisible_and_retry_converges(spark, tmp_path):
    root = str(tmp_path / "store")
    a = _batch(spark, 0, 500)
    encode_checkpointed(a, root, OPTS)

    up = _batch(spark, 100, 200, v_of=lambda ids: np.full(len(ids), -1))
    r = upsert_checkpointed(up, root, OPTS)
    # simulate a crash just before the manifest: remove the marker
    os.remove(f"{root}/commits/{r['commit']}")
    assert r["commit"] not in committed_ids(root)
    # DV appends AND the overlay are on disk, yet the table reads pre-upsert
    pd.testing.assert_frame_equal(_pdf(read_snapshot(spark, root, DDL)),
                                  _pdf(a))

    # retry under a FRESH id (crashed ids are never reused) converges
    r2 = upsert_checkpointed(up, root, OPTS)
    assert r2["commit"] == r["commit"] + 1
    assert r2["rows_replaced"] == 100  # base rows still visible, re-marked
    want = pd.concat([_pdf(a.filter(~F.col("event_id").between(100, 199))),
                      _pdf(up)]).sort_values("event_id").reset_index(drop=True)
    got = _pdf(read_snapshot(spark, root, DDL))
    pd.testing.assert_frame_equal(got, want)
    # exactly one row per key survived (the crashed overlay stays hidden)
    assert got.event_id.is_unique


def test_crashed_encode_reencodes_on_retry(spark, tmp_path):
    root = str(tmp_path / "store")
    a = _batch(spark, 0, 500)
    r1 = encode_checkpointed(a, root, OPTS)
    os.remove(f"{root}/commits/{r1['commit']}")  # crash before marker
    assert read_snapshot(spark, root, DDL).count() == 0  # nothing visible

    # retry must NOT trust the unmanifested lineage (else the rows would
    # be skipped into permanent invisibility)
    r2 = encode_checkpointed(a, root, OPTS)
    assert r2["partitions_skipped"] == 0 and r2["partitions_encoded"] > 0
    got = _pdf(read_snapshot(spark, root, DDL))
    pd.testing.assert_frame_equal(got, _pdf(a))
    assert got.event_id.is_unique  # overwrite, not duplication


def test_legacy_store_upgrades_in_place(spark, tmp_path):
    root = str(tmp_path / "store")
    a = _batch(spark, 0, 500)
    encode_checkpointed(a, root, OPTS)
    blocks = read_blocks(spark, root).drop("pk")
    delete_checkpointed(delete_where(blocks, "v", lo=0, hi=99), root)
    want = _pdf(a.filter(~F.col("v").between(0, 99)))

    shutil.rmtree(f"{root}/commits")  # the pre-manifest on-disk layout
    assert committed_ids(root) is None
    # ungated legacy read still exact
    pd.testing.assert_frame_equal(_pdf(read_snapshot(spark, root, DDL)), want)

    # first manifest-aware write backfills markers for the old commits
    blocks = read_blocks(spark, root).drop("pk")
    delete_checkpointed(delete_where(blocks, "v", lo=900, hi=999), root)
    assert {1, 2, 3} <= committed_ids(root)
    pd.testing.assert_frame_equal(
        _pdf(read_snapshot(spark, root, DDL)),
        _pdf(a.filter(~F.col("v").between(0, 99)
                      & ~F.col("v").between(900, 999))))
    # and the old history is still addressable
    pd.testing.assert_frame_equal(
        _pdf(read_snapshot(spark, root, DDL, as_of=2)), want)


def test_vacuum_reclaims_crashed_overlay(spark, tmp_path):
    """vacuum(orphan_overlays=True) removes the invisible overlay a
    crashed upsert left, and touches nothing manifested."""
    from varint_spark.lineage import vacuum

    root = str(tmp_path / "store")
    a = _batch(spark, 0, 300)
    encode_checkpointed(a, root, OPTS)
    up = _batch(spark, 50, 100, v_of=lambda ids: np.full(len(ids), -1))
    ok = upsert_checkpointed(up, root, OPTS)              # commit 2, kept
    bad = upsert_checkpointed(up, root, OPTS)             # commit 3 ...
    os.remove(f"{root}/commits/{bad['commit']}")          # ... "crashed"

    before = _pdf(read_snapshot(spark, root, DDL))
    r = vacuum(spark, root, dry_run=True, orphan_overlays=True)
    assert r["orphan_overlays"] == [bad["commit"]]
    assert os.path.exists(f"{root}/overlays/{bad['commit']:06d}")  # dry run

    r = vacuum(spark, root, orphan_overlays=True)
    assert r["orphan_overlays"] == [bad["commit"]]
    assert not os.path.exists(f"{root}/overlays/{bad['commit']:06d}")
    assert os.path.exists(f"{root}/overlays/{ok['commit']:06d}")
    pd.testing.assert_frame_equal(_pdf(read_snapshot(spark, root, DDL)),
                                  before)


def test_gate_commits_plan_stays_bounded(spark):
    """The manifested-commit gate must not inline every commit id into
    the plan (O(total commits) planning work on long-lived stores —
    ADVICE r6): a contiguous prefix gates as one range predicate, only
    the out-of-order tail (crashed-id gaps) lands in an isin()."""
    from varint_spark.lineage import _gate_commits

    df = spark.range(12000).select(F.col("id").alias("commit"))
    # 10k contiguous commits -> no isin at all, plan stays flat
    plan = _gate_commits(df, set(range(1, 10_001))) \
        ._jdf.queryExecution().analyzed().toString()
    assert "10000" in plan and plan.count(",") < 50, plan[:2000]
    # gap at 5 (crashed id): range over 1..4 + isin of just the tail
    got = sorted(r.commit for r in _gate_commits(
        df.filter("commit <= 12"),
        {1, 2, 3, 4, 6, 7}).collect())
    assert got == [0, 1, 2, 3, 4, 6, 7]
