"""varint_spark.analysis — distributed run counting (the scale-correct
replacement for a global single-partition lag window)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window as W, functions as F

from varint_spark.analysis import run_count


def _naive(spark_df, order_cols, value_col):
    w = W.orderBy(*order_cols)
    runs = spark_df.withColumn("prev", F.lag(value_col).over(w))
    return runs.select(
        F.count("*").alias("n_rows"),
        F.sum(
            F.when(F.col("prev").isNull() | (F.col("prev") != F.col(value_col)), 1)
            .otherwise(0)
        ).alias("n_runs"),
    ).collect()[0]


@pytest.mark.parametrize("n,n_vals,seed", [(1, 1, 0), (50, 2, 1), (5000, 3, 2), (5000, 50, 3)])
def test_run_count_matches_naive_window(spark, n, n_vals, seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, n_vals, size=n)
    rows = [(int(i), f"v{v}") for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, flag string").repartition(7)
    got = run_count(df, ["k"], "flag").collect()[0]
    want = _naive(df, ["k"], "flag")
    assert (got.n_rows, got.n_runs) == (want.n_rows, want.n_runs)


def test_run_count_runs_span_partition_boundaries(spark):
    # one long constant run: every partition boundary must merge (n_runs == 1)
    df = spark.createDataFrame([(i, "x") for i in range(1000)], "k long, flag string")
    got = run_count(df.repartition(13), ["k"], "flag").collect()[0]
    assert (got.n_rows, got.n_runs) == (1000, 1)


def test_run_count_composite_order_and_empty(spark):
    rows = [(1, 2, "a"), (1, 1, "a"), (2, 1, "b"), (2, 2, "a"), (3, 1, "a")]
    df = spark.createDataFrame(rows, "a int, b int, flag string")
    got = run_count(df, ["a", "b"], "flag").collect()[0]
    # order: (1,1)a (1,2)a (2,1)b (2,2)a (3,1)a -> runs: a,b,a = 3
    assert (got.n_rows, got.n_runs) == (5, 3)
    empty = spark.createDataFrame([], "a int, b int, flag string")
    got0 = run_count(empty, ["a", "b"], "flag").collect()[0]
    assert (got0.n_rows, got0.n_runs) == (0, 0)


def test_run_count_plan_has_no_global_single_partition_sort(spark):
    df = spark.createDataFrame([(i, "x") for i in range(100)], "k long, flag string")
    plan = run_count(df, ["k"], "flag")._jdf.queryExecution().executedPlan().toString()
    # the input-table pass must be range-partitioned, not a global window;
    # the only single-partition stage is over the per-partition summary
    assert "rangepartitioning" in plan.lower()
