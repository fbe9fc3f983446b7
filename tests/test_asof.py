"""Backward as-of join: window-scan implementation vs a brute-force
per-row reference, including no-match, equal-time, and null-value rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from varint_spark.asof import asof_join_backward


def test_asof_join_matches_bruteforce(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d"), (3, 9, "e")],
        "k long, t long, tag string")
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 15, 101), (1, 1, 102), (2, 8, 103), (4, 1, 104)],
        "k long, t long, rid long")
    out = asof_join_backward(left, right, "k", "t", "t", ["rid", "t"])
    got = {(r.k, r.t): (r.rid_asof, r.t_asof) for r in out.collect()}
    lrows = [(1, 10), (1, 20), (1, 5), (2, 7), (3, 9)]
    rrows = [(1, 10, 100), (1, 15, 101), (1, 1, 102), (2, 8, 103), (4, 1, 104)]
    for k, t in lrows:
        cand = [(rt, rid) for rk, rt, rid in rrows if rk == k and rt <= t]
        want = (None, None) if not cand else \
            (max(cand)[1], max(cand)[0])
        assert got[(k, t)] == want, (k, t)
    assert out.count() == left.count()  # left join semantics


def test_asof_join_null_right_values_still_match(spark):
    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame([(1, 3, None), (1, 8, None)],
                                  "k long, t long, v string")
    out = asof_join_backward(left, right, "k", "t", "t", ["v", "t"],
                             tie_col="t").collect()
    # the t=8 row matches even though v is null (struct packing)
    assert out[0].t_asof == 8 and out[0].v_asof is None


def test_asof_join_tie_breaks_deterministically(spark):
    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame([(1, 10, 5), (1, 10, 9), (1, 10, 7)],
                                  "k long, t long, rid long")
    for _ in range(3):
        out = asof_join_backward(left, right.repartition(3), "k", "t", "t",
                                 ["rid"]).collect()
        assert out[0].rid_asof == 9  # highest tie_col wins, every time


def test_range_join_matches_bruteforce(spark):
    import itertools
    import random

    from varint_spark.asof import range_join

    random.seed(3)
    lrows = [(k, random.randrange(0, 1000)) for k in (1, 1, 1, 2, 2, 3)
             for _ in range(10)]
    rrows = [(k, random.randrange(0, 1000), i) for i, (k, _) in
             enumerate((x, 0) for x in [1] * 25 + [2] * 15 + [4] * 5)]
    left = spark.createDataFrame([(k, t) for k, t in lrows], "k long, lt long")
    right = spark.createDataFrame(rrows, "k long, rt long, rid long")
    lo, hi = -50, 20
    out = range_join(left, right, "k", "lt", "rt", lo, hi)
    got = sorted((r.k, r.lt, r.rt, r.rid) for r in out.collect())
    want = sorted((lk, lt, rt, rid)
                  for (lk, lt), (rk, rt, rid) in itertools.product(lrows, rrows)
                  if lk == rk and lt + lo <= rt <= lt + hi)
    assert got == want


def test_guards_reject_ambiguous_inputs(spark):
    import pytest

    from varint_spark.asof import asof_join_backward, range_join

    l1 = spark.createDataFrame([(1, 2)], "k long, _t long")
    r1 = spark.createDataFrame([(1, 2, 3)], "k long, t long, v long")
    with pytest.raises(ValueError, match="clash"):
        asof_join_backward(l1, r1, "k", "_t", "t", ["v"])
    l2 = spark.createDataFrame([(1, 2)], "k long, t long")
    with pytest.raises(ValueError, match="share columns"):
        range_join(l2, r1, "k", "t", "t", -5, 5)
