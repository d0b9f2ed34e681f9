"""Unit tests for janus_spark/digest.py — the order-free multiset
digests that back the stress-scale compares and the A/B differential."""

from pyspark.sql import Row

from janus_spark.digest import multiset_digest, norm, spark_multiset_digest


def test_digest_is_order_and_column_order_free():
    rows = [(1, "a", 2.5), (2, "b", float("nan")), (3, None, 0.0)]
    cols = ["x", "y", "z"]
    n1, d1 = multiset_digest(rows, cols)
    n2, d2 = multiset_digest(list(reversed(rows)), cols)
    assert (n1, d1) == (n2, d2) == (3, d1)
    # column order must not matter (hashing is by name-sorted order)
    swapped = [(r[2], r[1], r[0]) for r in rows]
    n3, d3 = multiset_digest(swapped, ["z", "y", "x"])
    assert (n3, d3) == (n1, d1)


def test_digest_distinguishes_multiplicity():
    n1, d1 = multiset_digest([(1,), (1,), (2,)], ["x"])
    n2, d2 = multiset_digest([(1,), (2,), (2,)], ["x"])
    assert n1 == n2 == 3 and d1 != d2


def test_norm_nan_and_bool():
    assert norm(float("nan")) == "NaN"
    assert norm(True) is True and norm(1) == 1
    # bool vs int rows must digest differently
    _, db = multiset_digest([(True,)], ["x"])
    _, di = multiset_digest([(1,)], ["x"])
    assert db != di


def test_spark_digest_matches_local(spark):
    rows = [Row(a=i, b=f"s{i % 3}", c=float(i) / 7 if i % 5 else None) for i in range(500)]
    df = spark.createDataFrame(rows).repartition(8)
    sn, sd = spark_multiset_digest(df)
    ln, ld = multiset_digest([tuple(r) for r in rows], ["a", "b", "c"])
    assert (sn, sd) == (ln, ld)
    # and invariant to a different partitioning
    sn2, sd2 = spark_multiset_digest(df.repartition(3, "b"))
    assert (sn2, sd2) == (sn, sd)
