"""Sessionization — gap-based session assignment over event streams,
the standard feature-engineering step before behavioral training data.

Shape at 100 TB: ONE shuffle, on the user key, shared by every stage —
the lag/cumsum windows partition by ``user_col``, and the follow-up
``groupBy(user_col, session_idx)`` reuses that hash partitioning
(HashPartitioning(user) satisfies ClusteredDistribution(user, idx), so
Catalyst inserts no second exchange — pinned by the plan test). State is
a per-row window scan, never a per-user collect; skewed users cost one
partition's sort, not a driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: int = 30,
               tiebreak_col: str = "event_id") -> DataFrame:
    """Assign a per-user ``session_idx`` (1-based): a new session starts
    at the first event and whenever the gap since the previous event
    exceeds ``gap_minutes`` (strictly). ``tiebreak_col`` makes the order
    total so equal timestamps sessionize deterministically."""
    w = W.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(ts_col).over(w)
    gap_us = gap_minutes * 60_000_000
    is_new = (prev.isNull()
              | ((F.unix_micros(F.to_timestamp(F.col(ts_col))) - F.unix_micros(F.to_timestamp(prev)))
                 > F.lit(gap_us))).cast("long")
    return df.withColumn("session_idx", F.sum(is_new).over(w))


def session_stats(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", gap_minutes: int = 30,
                  tiebreak_col: str = "event_id") -> DataFrame:
    """Session-level rollup: one row per (user, session) with event
    count and µs start/end/duration."""
    s = sessionize(df, user_col, ts_col, gap_minutes, tiebreak_col)
    return s.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min(F.unix_micros(F.to_timestamp(F.col(ts_col)))).alias("start_us"),
        F.max(F.unix_micros(F.to_timestamp(F.col(ts_col)))).alias("end_us"),
        (F.max(F.unix_micros(F.to_timestamp(F.col(ts_col))))
         - F.min(F.unix_micros(F.to_timestamp(F.col(ts_col))))).alias("duration_us"))
