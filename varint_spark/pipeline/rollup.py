"""Hypertable-style time-bucket rollups (TimescaleDB continuous-aggregate
shape): bucket a timestamp column to fixed intervals, aggregate, and
refresh COARSER resolutions from FINER rollups instead of rescanning the
raw table.

All JVM-side (`floor(epoch_us / width)` + groupBy — one shuffle); the
cascade works because every aggregate here is re-aggregable (count→sum,
sum→sum, min→min, max→max), which is the invariant that makes continuous
aggregates refreshable at all. Double-typed measures are floored to
integer milli-units BEFORE summing so results are order-independent
(a float sum's value depends on reduction order — on 1000 executors that
is a different answer every run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ROLLUP_COLS = ("n_rows", "sum_mvalue", "min_ts_us", "max_ts_us")


def time_bucket(ts_col: str, bucket_seconds: int):
    """Bucket start in epoch seconds (DuckDB twin: time_bucket /
    epoch_us-based arithmetic)."""
    us = F.unix_micros(F.to_timestamp(F.col(ts_col)))
    return (F.floor(us / (bucket_seconds * 1_000_000))
            * bucket_seconds).cast("long")


def rollup(df: DataFrame, ts_col: str, bucket_seconds: int,
           group_cols: list[str], value_col: str | None = None) -> DataFrame:
    """Raw rows -> one row per (bucket_start_s, *group_cols) with the
    re-aggregable measures: row count, floored milli-value sum, min/max
    event time (µs)."""
    us = F.unix_micros(F.to_timestamp(F.col(ts_col)))
    mval = (F.floor(F.col(value_col) * 1000).cast("long")
            if value_col else F.lit(0))
    return df.groupBy(
        time_bucket(ts_col, bucket_seconds).alias("bucket_start_s"),
        *group_cols,
    ).agg(
        F.count("*").alias("n_rows"),
        F.sum(mval).alias("sum_mvalue"),
        F.min(us).alias("min_ts_us"),
        F.max(us).alias("max_ts_us"),
    )


def rollup_cascade(fine: DataFrame, fine_bucket_seconds: int,
                   coarse_bucket_seconds: int,
                   group_cols: list[str]) -> DataFrame:
    """Coarser rollup FROM a finer one — the continuous-aggregate refresh
    path: sums of sums, sums of counts, mins of mins, maxes of maxes. The
    raw table is never rescanned; at 100 TB the hourly→daily→monthly
    chain touches only rollup rows (orders of magnitude fewer)."""
    if coarse_bucket_seconds % fine_bucket_seconds:
        raise ValueError("coarse bucket must be a multiple of the fine bucket")
    b = (F.floor(F.col("bucket_start_s") / coarse_bucket_seconds)
         * coarse_bucket_seconds).cast("long")
    return fine.groupBy(b.alias("bucket_start_s"), *group_cols).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_mvalue").alias("sum_mvalue"),
        F.min("min_ts_us").alias("min_ts_us"),
        F.max("max_ts_us").alias("max_ts_us"),
    )
