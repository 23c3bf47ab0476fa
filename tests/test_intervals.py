"""interval_join: bucketed rewrite equals the naive theta join, boundary
semantics are half-open, and the plan stays an equi-join (no nested loop)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from importer_spark.operators.intervals import interval_join


def _naive(points, intervals, point_col, start_col, end_col):
    return points.join(
        intervals,
        (points[point_col] >= intervals[start_col])
        & (points[point_col] < intervals[end_col]),
        "inner",
    )


def _pairs(df):
    return sorted((r.pid, r.iid) for r in df.select("pid", "iid").collect())


@pytest.mark.parametrize("bin_width", [1, 3, 7, 100])
def test_interval_join_matches_naive(spark, bin_width):
    # Negative domain values, intervals spanning many bins, overlapping
    # intervals, an empty interval, and points on both boundaries.
    points = spark.createDataFrame(
        [Row(pid=i, p=v) for i, v in enumerate([-15, -1, 0, 1, 5, 9, 10, 23, 99])]
    )
    intervals = spark.createDataFrame(
        [
            Row(iid=0, s=-20, e=-10),   # all-negative
            Row(iid=1, s=-5, e=5),      # crosses zero
            Row(iid=2, s=0, e=10),      # half-open: 0 in, 10 out
            Row(iid=3, s=0, e=100),     # spans many bins
            Row(iid=4, s=5, e=5),       # empty -> matches nothing
            Row(iid=5, s=9, e=24),      # overlaps iid=2/3
        ]
    )
    got = interval_join(points, intervals, "p", "s", "e", bin_width)
    want = _naive(points, intervals, "p", "s", "e")
    assert _pairs(got) == _pairs(want)
    # Each matching pair exactly once (no dedup pass needed).
    assert got.count() == len(_pairs(got))


def test_interval_join_boundary_semantics(spark):
    points = spark.createDataFrame([Row(pid=0, p=10), Row(pid=1, p=20)])
    intervals = spark.createDataFrame([Row(iid=0, s=10, e=20)])
    got = _pairs(interval_join(points, intervals, "p", "s", "e", 8))
    assert got == [(0, 0)]  # start inclusive, end exclusive


def test_interval_join_rejects_bad_args(spark):
    pts = spark.createDataFrame([Row(pid=0, p=1)])
    ivs = spark.createDataFrame([Row(iid=0, s=0, e=2)])
    with pytest.raises(ValueError, match="bin_width"):
        interval_join(pts, ivs, "p", "s", "e", 0)
    shared = spark.createDataFrame([Row(pid=0, s=0, e=2)])
    with pytest.raises(ValueError, match="share column"):
        interval_join(pts, shared, "p", "s", "e", 4)


def test_interval_join_plan_is_equi(spark):
    """The whole point of the rewrite: no BroadcastNestedLoopJoin /
    CartesianProduct in the physical plan — the bin equality becomes a hash
    join key and the range predicate a post-join filter."""
    points = spark.range(1000).select(F.col("id").alias("p"))
    intervals = spark.range(50).select(
        F.col("id").alias("iid"),
        (F.col("id") * 20).alias("s"),
        (F.col("id") * 20 + 30).alias("e"),
    )
    plan = interval_join(points, intervals, "p", "s", "e", 16)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
