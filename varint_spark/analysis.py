"""Distributed analysis operators — the reference's analyze surface
(varintRLEAnalyze reference src/varintRLE.c:10-54, varintAdaptiveAnalyze
src/varintAdaptive.c:183-242) re-expressed as scale-correct Spark plans.

``run_count`` exists because the obvious formulation — ``lag()`` over a
global ``Window.orderBy(...)`` with no partitionBy — pulls the entire
table through ONE task: correct at small scale, a scale-killer at 100 TB.
The plan here is the distributed textbook shape:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order columns
   (one shuffle; ranges guarantee partition p's keys all precede p+1's).
2. One ``mapInArrow`` pass per partition: Arrow-kernel run-break count,
   threading the previous value across Arrow batches; emits ONE summary
   row per partition (first key, first/last value, local rows/runs).
3. A final merge over the tiny per-partition summary (one row per
   partition — hundreds of rows even on a 1000-executor cluster):
   global runs = sum(local runs) − boundaries where prev partition's last
   value equals this partition's first value.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame, Window as W, functions as F


def _neq_null_safe(a, b):
    """Element-wise run-break predicate: True iff exactly one side is null,
    or both are non-null and differ (null==null is NOT a break). Stays in
    Arrow compute — no per-row Python, no object-dtype round trip."""
    an, bn = pc.is_null(a), pc.is_null(b)
    either = pc.or_(an, bn)
    return pc.if_else(either, pc.xor(an, bn), pc.not_equal(a, b))


def make_partition_runs_udf(order_cols: list[str], value_col: str):
    """mapInArrow fn: one summary row per (non-empty) input partition.
    All comparisons are Arrow-kernel vectorized (pc.not_equal) — for string
    columns this is a SIMD memcmp sweep, not a per-row Python compare."""

    def fn(iterator):
        n_rows = 0
        n_runs = 0
        prev = None  # 1-element Arrow slice: last value of the previous batch
        first_key = None  # 1-element Arrow slices: keeps the input types exact
        first_val = None
        started = False
        for batch in iterator:
            col = batch.column(value_col)
            n = len(col)
            if n == 0:
                continue
            if n > 1:
                diffs = _neq_null_safe(col.slice(1), col.slice(0, n - 1))
                breaks = int(pc.sum(diffs).as_py() or 0)
            else:
                breaks = 0
            head = col.slice(0, 1)
            if not started:
                first_key = [batch.column(c).slice(0, 1) for c in order_cols]
                first_val = head
                started = True
                breaks += 1  # the partition's first value opens a run
            elif bool(_neq_null_safe(head, prev)[0].as_py()):
                breaks += 1
            n_runs += breaks
            n_rows += n
            prev = col.slice(n - 1, 1)
        if started:
            yield pa.RecordBatch.from_arrays(
                list(first_key)
                + [
                    pa.array([n_rows], type=pa.int64()),
                    pa.array([n_runs], type=pa.int64()),
                    first_val,
                    prev,
                ],
                names=[f"_k{i}" for i in range(len(order_cols))]
                + ["n_rows", "n_runs", "first_val", "last_val"],
            )

    return fn


def run_count(df: DataFrame, order_cols: list[str], value_col: str) -> DataFrame:
    """Global (n_rows, n_runs) of ``value_col`` under ``order_cols`` order —
    one range shuffle + one vectorized pass; no global single-partition
    window (see module docstring). Returns a one-row DataFrame."""
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    key_ddl = ", ".join(f"_k{i} {by_name[c]}" for i, c in enumerate(order_cols))
    out_ddl = (
        f"{key_ddl}, n_rows long, n_runs long, "
        f"first_val {by_name[value_col]}, last_val {by_name[value_col]}"
    )
    parts = (
        df.select(*order_cols, value_col)
        .repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .mapInArrow(make_partition_runs_udf(order_cols, value_col), out_ddl)
    )
    # the summary is one row per partition — this window is over a tiny
    # relation by construction, unlike a window over the input table
    w = W.orderBy(*[f"_k{i}" for i in range(len(order_cols))])
    merged = parts.withColumn("_prev_last", F.lag("last_val").over(w))
    return merged.select(
        F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n_rows"),
        F.coalesce(
            F.sum("n_runs")
            - F.sum(F.when(F.col("_prev_last") == F.col("first_val"), 1).otherwise(0)),
            F.lit(0),
        ).alias("n_runs"),
    )
