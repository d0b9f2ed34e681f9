"""Sketch aggregates: accuracy bounds + re-aggregation consistency."""

import pytest
from pyspark.sql import functions as F

from janus_spark.functions import sketches
from janus_spark.sources.melt import read_events


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return read_events(spark, sf_dir).cache()


def test_hll_distinct_error_bound(events):
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.hll_distinct(events, "user_id", ["event_type"]).collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) / exact[k] < 0.03


def test_hll_sketches_survive_storage_and_merge(events, tmp_path):
    """The rollup pattern: persist per-(type, user-bucket) sketches, read
    them back, union to per-type — estimates must equal the direct path
    (sketch union is lossless re-aggregation, no rescan of raw data)."""
    per_bucket = sketches.hll_by_key(
        events.withColumn("bucket", F.col("user_id") % 7), "user_id", ["event_type", "bucket"]
    )
    path = str(tmp_path / "hll_rollup")
    per_bucket.write.parquet(path)
    rolled = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.hll_merge(events.sparkSession.read.parquet(path), ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.hll_distinct(events, "user_id", ["event_type"]).collect()
    }
    assert rolled == direct


def test_approx_quantiles_close_to_exact(events):
    approx = {
        r["event_type"]: r["q"]
        for r in sketches.approx_quantiles(events, "value", ["event_type"], [0.5, 0.95]).collect()
    }
    exact = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in events.groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.95).alias("p95"),
        )
        .collect()
    }
    for k, (p50, p95) in exact.items():
        spread = max(abs(p95), 1.0)
        assert abs(approx[k][0] - p50) < 0.05 * spread
        assert abs(approx[k][1] - p95) < 0.05 * spread


def test_hll_det_error_bound(events):
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.hll_det_distinct(events, "user_id", ["event_type"]).collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) / exact[k] < 0.05


def test_hll_det_partials_survive_storage_and_merge(events, tmp_path):
    """Portable-rollup pattern: persist per-(type, bucket) register rows,
    read back, merge to per-type via max(rank) — estimates must equal the
    direct path exactly (register-max merge is lossless and the state is
    plain rows, so ANY engine could have done the rollup)."""
    per_bucket = sketches.hll_det_partials(
        events.withColumn("bucket", F.col("user_id") % 7), "user_id", ["event_type", "bucket"]
    )
    path = str(tmp_path / "hll_det_rollup")
    per_bucket.write.parquet(path)
    merged = (
        events.sparkSession.read.parquet(path)
        .groupBy("event_type", "reg")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    rolled = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.hll_det_estimate(merged, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.hll_det_distinct(events, "user_id", ["event_type"]).collect()
    }
    assert rolled == direct


def test_hll_det_matches_duckdb_estimate(events, sf_dir):
    """The portability claim itself: DuckDB running hll_det_oracle_sql on
    the same parquet reproduces the Spark estimate bit-for-bit."""
    import duckdb

    spark_est = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.hll_det_distinct(events, "user_id", ["event_type"]).collect()
    }
    sql = sketches.hll_det_oracle_sql(
        "user_id", "event_type", f"read_parquet('{sf_dir}/events.parquet')"
    )
    duck_est = {k: v for k, v in duckdb.sql(sql).fetchall()}
    assert spark_est == duck_est


def test_cms_never_undercounts_and_bounds_error(events):
    exact = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in events.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_total = {}
    for (et, _), n in exact.items():
        n_total[et] = n_total.get(et, 0) + n
    partials = sketches.cms_partials(events, "user_id", ["event_type"], depth=4, width=256)
    probes = events.select("user_id").distinct()
    est = {
        (r["event_type"], r["item"]): r["est"]
        for r in sketches.cms_estimate(
            partials, probes, "user_id", ["event_type"], depth=4, width=256
        ).collect()
    }
    for (et, uid), n in exact.items():
        e = est[(et, uid)]
        assert e >= n  # CMS never undercounts
        # eps = e/width ~ 1% of the group's total mass; generous 3x slack
        assert e - n <= 3 * 2.718 * n_total[et] / 256


def test_cms_partials_merge_across_storage(events, tmp_path):
    """Persist per-(type, bucket) partials, re-merge to per-type with a
    plain SUM, estimates must equal the direct build."""
    fine = sketches.cms_partials(
        events.withColumn("bucket", F.col("user_id") % 5),
        "user_id", ["event_type", "bucket"], depth=4, width=256,
    )
    path = str(tmp_path / "cms")
    fine.write.parquet(path)
    merged = (
        events.sparkSession.read.parquet(path)
        .groupBy("event_type", "row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    probes = events.select("user_id").distinct().limit(20)
    a = sketches.cms_estimate(merged, probes, "user_id", ["event_type"], depth=4, width=256)
    direct_partials = sketches.cms_partials(events, "user_id", ["event_type"], depth=4, width=256)
    b = sketches.cms_estimate(direct_partials, probes, "user_id", ["event_type"], depth=4, width=256)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cms_join_size_bounds(spark, sf_dir):
    from janus_spark.functions.sketches import cms_join_size, cms_partials

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    true = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    pa = cms_partials(orders, "o_orderkey", [], depth=4, width=4096)
    pb = cms_partials(li, "l_orderkey", [], depth=4, width=4096)
    est = cms_join_size(pa, pb, depth=4).collect()[0]["est_join_size"]
    n_a, n_b = orders.count(), li.count()
    assert true <= est <= true + 3 * 2.718 * n_a * n_b / 4096


def test_cms_join_size_disjoint_keys_is_small(spark):
    from pyspark.sql import functions as F

    from janus_spark.functions.sketches import cms_join_size, cms_partials

    a = spark.range(0, 2000).select(F.col("id").alias("k"))
    b = spark.range(10000, 12000).select(F.col("id").alias("k"))
    pa = cms_partials(a, "k", [], depth=4, width=4096)
    pb = cms_partials(b, "k", [], depth=4, width=4096)
    est = cms_join_size(pa, pb, depth=4).collect()[0]["est_join_size"]
    assert est <= 3 * 2.718 * 2000 * 2000 / 4096  # collision noise only
