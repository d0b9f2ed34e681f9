"""Interval join: bucketed equi-join semantics and plan shape."""

from pyspark.sql import functions as F

from janus_spark.operators.rangejoin import interval_join


def _frames(spark):
    points = spark.createDataFrame(
        [(1, 1, 50), (2, 1, 150), (3, 1, 250), (4, 2, 100), (5, 1, 1000)],
        "pid long, k long, ts long",
    )
    intervals = spark.createDataFrame(
        # k=1: [100,200] and overlapping [150,400]; k=2: [500,600] (no hit)
        [(10, 1, 100, 200), (11, 1, 150, 400), (12, 2, 500, 600)],
        "iid long, k long, start long, end long",
    )
    return points, intervals


def _pairs(df):
    return sorted((r["pid"], r["iid"]) for r in df.collect())


def test_interval_join_inner(spark):
    points, intervals = _frames(spark)
    out = interval_join(
        points, intervals, ts_col="ts", start_col="start", end_col="end",
        by=("k",), bucket_ms=100,
    )
    # pid=2 @150 hits both k=1 intervals; pid=3 @250 hits only [150,400];
    # bounds inclusive: ts=150 matches start=150
    assert _pairs(out) == [(2, 10), (2, 11), (3, 11)]


def test_interval_join_no_duplicates_across_buckets(spark):
    # tiny buckets force each interval into many buckets; pairs must
    # still appear exactly once (a point lives in exactly one bucket)
    points, intervals = _frames(spark)
    out = interval_join(
        points, intervals, ts_col="ts", start_col="start", end_col="end",
        by=("k",), bucket_ms=7,
    )
    assert _pairs(out) == [(2, 10), (2, 11), (3, 11)]


def test_interval_join_left_keeps_unmatched_points(spark):
    points, intervals = _frames(spark)
    out = interval_join(
        points, intervals, ts_col="ts", start_col="start", end_col="end",
        by=("k",), bucket_ms=100, how="left",
    )
    rows = {r["pid"]: r["iid"] for r in out.collect() if r["iid"] is None}
    # unmatched points appear once with null interval columns
    assert set(rows) == {1, 4, 5}
    assert out.count() == 3 + 3  # 3 matches + 3 null-extended


def test_interval_join_boundary_inclusive(spark):
    points = spark.createDataFrame([(1, 1, 100), (2, 1, 200)], "pid long, k long, ts long")
    intervals = spark.createDataFrame([(10, 1, 100, 200)], "iid long, k long, start long, end long")
    out = interval_join(points, intervals, ts_col="ts", start_col="start",
                        end_col="end", by=("k",), bucket_ms=1000)
    assert _pairs(out) == [(1, 10), (2, 10)]


def test_interval_join_is_equi_join_not_nested_loop(spark):
    points, intervals = _frames(spark)
    plan = (
        interval_join(points, intervals, ts_col="ts", start_col="start",
                      end_col="end", by=("k",), bucket_ms=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
