"""Hypertable-style rollups: bucket correctness vs a direct aggregation,
and the cascade identity (coarse-from-fine == coarse-from-raw)."""

from __future__ import annotations

from pyspark.sql import functions as F

from varint_spark.pipeline import rollup


def _events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def _key(r):
    return (r.bucket_start_s, r.event_type)


def test_hourly_rollup_matches_direct_agg(spark):
    ev = _events(spark)
    got = {_key(r): (r.n_rows, r.sum_mvalue, r.min_ts_us, r.max_ts_us)
           for r in rollup.rollup(ev, "ts", 3600, ["event_type"],
                                  value_col="value").collect()}
    us = F.unix_micros(F.to_timestamp("ts"))
    want = {(r.b, r.event_type): (r.n, r.s, r.mn, r.mx) for r in
            ev.groupBy((F.floor(us / 3_600_000_000) * 3600).cast("long")
                       .alias("b"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("s"),
                 F.min(us).alias("mn"), F.max(us).alias("mx")).collect()}
    assert got == want


def test_cascade_equals_rollup_from_raw(spark):
    ev = _events(spark)
    hourly = rollup.rollup(ev, "ts", 3600, ["event_type"], value_col="value")
    daily_cascaded = {_key(r): (r.n_rows, r.sum_mvalue, r.min_ts_us, r.max_ts_us)
                      for r in rollup.rollup_cascade(hourly, 3600, 86400,
                                                     ["event_type"]).collect()}
    daily_raw = {_key(r): (r.n_rows, r.sum_mvalue, r.min_ts_us, r.max_ts_us)
                 for r in rollup.rollup(ev, "ts", 86400, ["event_type"],
                                        value_col="value").collect()}
    assert daily_cascaded == daily_raw


def test_cascade_rejects_non_multiple_buckets(spark):
    import pytest

    ev = _events(spark)
    hourly = rollup.rollup(ev, "ts", 3600, ["event_type"])
    with pytest.raises(ValueError, match="multiple"):
        rollup.rollup_cascade(hourly, 3600, 5000, ["event_type"])
