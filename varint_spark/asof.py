"""Backward as-of join — the temporal operator Spark's DataFrame API
lacks (pandas has merge_asof; DuckDB has ASOF JOIN, which the driver
oracle uses to verify this implementation).

For each left row, attach the LATEST right row of the same key whose
time is <= the left row's time. The scalable shape is NOT a range join
(which explodes into an inequality nested loop): tag both sides, union,
and run ONE window scan per key —

    union(left tagged 1, right tagged 0)
      -> Window.partitionBy(key).orderBy(time, side, tie)
      -> last(right-struct, ignorenulls) over rows unbounded..current
      -> filter side == 1

One shuffle on the key, O(n log n) partition-local sort, no pairwise
blowup — the same plan Spark executes for any window aggregation, so it
survives 100 TB exactly as well as a groupBy does. Rows at equal time:
the right row sorts FIRST (side 0 < 1), so a right row at exactly the
left row's time matches (<= semantics, like DuckDB's ``l.t >= r.t``).
Ties among right rows at the same (key, time) break by ``tie_col``
descending-last, making the result deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def range_join(left: DataFrame, right: DataFrame, by: str,
               left_on: str, right_on: str,
               lower: int, upper: int) -> DataFrame:
    """Band/range join: pairs where ``right_on`` falls in
    ``[left_on + lower, left_on + upper]`` for the same key — WITHOUT the
    inequality-join nested loop. Time is bucketized at the band width
    (``upper - lower``): a right row lands in exactly one bucket and a
    left row's band covers at most two consecutive buckets, so exploding
    the left side into those two bucket keys turns the range condition
    into an equi-join on (key, bucket) + an exact filter. Each qualifying
    pair is produced exactly once (no distinct needed). Time columns must
    be integers (e.g. epoch-µs); ``lower``/``upper`` likewise.

    At 100 TB this is the plan you want: one shuffle on (key, bucket),
    candidate count bounded by band density, never |L|×|R| per key."""
    span = upper - lower
    if span <= 0:
        raise ValueError("upper must exceed lower")
    shared = (set(left.columns) & set(right.columns)) - {by}
    if shared:
        raise ValueError(
            f"left and right share columns besides {by!r}: {sorted(shared)} "
            "— alias them apart (the join output would be ambiguous)")
    rb = right.withColumn("_b", F.floor(F.col(right_on) / span))
    lb = left.withColumn("_b0", F.floor((F.col(left_on) + lower) / span))
    lb = lb.withColumn("_b", F.explode(F.array(F.col("_b0"),
                                               F.col("_b0") + 1))).drop("_b0")
    return (lb.join(rb, [by, "_b"])
            .filter((F.col(right_on) >= F.col(left_on) + lower)
                    & (F.col(right_on) <= F.col(left_on) + upper))
            .drop("_b"))


def asof_join_backward(left: DataFrame, right: DataFrame, by: str,
                       left_on: str, right_on: str,
                       value_cols: list[str], suffix: str = "_asof",
                       tie_col: str | None = None) -> DataFrame:
    """Left rows + ``{v}{suffix}`` columns carrying the matched right
    row's ``value_cols`` (null when no right row precedes). ``by`` is the
    equality key, ``left_on``/``right_on`` the time columns. The matched
    right row is packed as a struct before the window scan, so right rows
    whose value columns are legitimately NULL still count as matches."""
    lcols = left.columns
    clash = {"_t", "_side", "_rrow", "_tie", "_match"} & set(lcols)
    if clash:
        raise ValueError(f"left columns clash with internals: {sorted(clash)}")
    tie = tie_col or value_cols[0]
    sel_left = left.withColumn("_t", F.col(left_on)) \
        .withColumn("_side", F.lit(1)) \
        .withColumn("_rrow", F.lit(None).cast(
            "struct<" + ", ".join(
                f"{v}: {right.schema[v].dataType.simpleString()}"
                for v in value_cols) + ">")) \
        .withColumn("_tie", F.lit(None).cast(right.schema[tie].dataType))
    sel_right = right.select(
        F.col(by), F.col(right_on).alias("_t"), F.lit(0).alias("_side"),
        F.struct(*[F.col(v) for v in value_cols]).alias("_rrow"),
        F.col(tie).alias("_tie"))
    for c in lcols:
        if c != by and c not in sel_right.columns:
            sel_right = sel_right.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType))
    combined = sel_left.unionByName(sel_right.select(sel_left.columns))
    w = (Window.partitionBy(by).orderBy("_t", "_side", "_tie")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = combined.withColumn(
        "_match", F.last("_rrow", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_match.{v}").alias(f"{v}{suffix}")
                  for v in value_cols])
    return out
