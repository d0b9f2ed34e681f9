"""Bloom-filter join pruning: exactness + the pruning actually prunes."""

from pyspark.sql import functions as F

from janus_spark.operators.bloomjoin import bloom_join, bloom_prune, build_bloom


def test_bloom_join_exact_vs_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sup = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .where("s_nationkey = 3")
        .select(F.col("s_suppkey").alias("l_suppkey"), "s_name")
    )
    plain = li.join(sup, "l_suppkey").groupBy("s_name").count()
    bloomed = bloom_join(li, sup, on="l_suppkey").groupBy("s_name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, bloomed.collect()))


def test_bloom_prune_no_false_negatives_and_prunes(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sup = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .where("s_nationkey = 3")
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    words = build_bloom(sup, F.col("l_suppkey"))
    pruned = bloom_prune(li, F.col("l_suppkey"), words, 1 << 16)
    true_matches = li.join(sup, "l_suppkey", "semi").count()
    kept = pruned.count()
    # no false negatives: every true match survives
    assert pruned.join(sup, "l_suppkey", "semi").count() == true_matches
    # pruning is tight: false positives bounded well under the fp-rate
    # budget (theory ~3e-4 at k=3, m=2^16, n~hundreds; allow 1%)
    assert true_matches <= kept <= true_matches + li.count() * 0.01


def test_bloom_prune_is_narrow(spark, sf_dir):
    """The probe-side filter must be map-side: no exchange between the
    parquet scan and the bloom Filter."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").where("s_nationkey = 3")
    words = build_bloom(sup, F.col("s_suppkey"))
    pruned = bloom_prune(li, F.col("l_suppkey"), words, 1 << 16)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
