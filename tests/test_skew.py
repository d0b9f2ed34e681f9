"""Salted join / skew-safe aggregate: identical results to the plain
operators, only the partitioning differs."""

from pyspark.sql import functions as F

from janus_spark.operators.skew import salted_join, skew_safe_count_distinct


def _frames(spark):
    # k=1 is the hot key
    left = spark.createDataFrame(
        [(i, 1 if i < 90 else 2, float(i)) for i in range(100)],
        "id long, k long, v double",
    )
    right = spark.createDataFrame([(1, "hot"), (3, "cold")], "k long, name string")
    return left, right


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_equals_plain(spark):
    left, right = _frames(spark)
    plain = left.join(right, ["k"], "inner").select("k", "id", "v", "name")
    salted = salted_join(left, right, ["k"], salt=8).select("k", "id", "v", "name")
    assert _rows(salted) == _rows(plain)


def test_salted_left_equals_plain(spark):
    left, right = _frames(spark)
    plain = left.join(right, ["k"], "left").select("k", "id", "v", "name")
    salted = salted_join(left, right, ["k"], salt=8, how="left").select("k", "id", "v", "name")
    assert _rows(salted) == _rows(plain)
    # unmatched left keys (k=2) survive exactly once with nulls
    assert sum(1 for r in _rows(salted) if r[3] is None) == 10


def test_salt_column_not_leaked(spark):
    left, right = _frames(spark)
    assert "__salt" not in salted_join(left, right, ["k"], salt=4).columns


def test_skew_safe_count_distinct_equals_builtin(spark):
    df = spark.createDataFrame(
        [(i % 3, f"v{i % 7}") for i in range(200)], "k long, val string"
    )
    ours = {
        (r["k"], r["n_distinct"])
        for r in skew_safe_count_distinct(df, ["k"], "val").collect()
    }
    builtin = {
        (r["k"], r["n"])
        for r in df.groupBy("k").agg(F.countDistinct("val").alias("n")).collect()
    }
    assert ours == builtin
