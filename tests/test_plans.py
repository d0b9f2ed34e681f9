"""Physical-plan shape guards — the properties that matter at 100 TB.

These assert the plans we designed for, so a future refactor that
silently reintroduces a nested-loop join or breaks column pruning fails
loudly here.
"""

import os

from pyspark.sql import functions as F

from janus_spark.compiler import compile_sparql, parse_sparql
from janus_spark.sources.melt import melt_sensor_fixture, melt_table


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_constant_predicate_scan_prunes_columns(spark, sf_dir):
    quads = melt_table(spark.read.parquet(f"{sf_dir}/orders.parquet"), "orders")
    df = compile_sparql(
        parse_sparql("SELECT ?o ?p WHERE { ?o <urn:orders:o_totalprice> ?p . }"), quads
    )
    plan = plan_of(df)
    assert plan.count("Scan parquet") == 1, "union branches must fold to one scan"
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "o_totalprice" in read
    assert "o_orderdate" not in read, "unused columns must be pruned from the scan"


def test_bgp_join_broadcasts(spark, sf_dir):
    quads = melt_table(spark.read.parquet(f"{sf_dir}/orders.parquet"), "orders")
    df = compile_sparql(
        parse_sparql(
            """SELECT ?o ?s ?p WHERE {
                 ?o <urn:orders:o_orderstatus> ?s .
                 ?o <urn:orders:o_totalprice> ?p . }"""
        ),
        quads,
    )
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sliding_window_has_no_nested_loop_join(spark):
    from janus_spark.engine import JanusEngine

    quads = melt_sensor_fixture(spark, 1000)
    eng = JanusEngine(spark, quads)
    qid = eng.register_query(
        """PREFIX ex: <http://example.org/>
        REGISTER RStream <out> AS
        SELECT (COUNT(?s) AS ?n)
        FROM NAMED WINDOW ex:h ON LOG ex:s [OFFSET 50000 RANGE 10000 STEP 5000]
        WHERE { WINDOW ex:h { ?s ex:temperature ?t . } }"""
    )
    df = eng.start_historical(qid, now=100000)["http://example.org/h"]
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan, "window assignment must be arithmetic, not a range join"


def test_aggregate_is_partial_then_final(spark, sf_dir):
    quads = melt_table(spark.read.parquet(f"{sf_dir}/orders.parquet"), "orders")
    df = compile_sparql(
        parse_sparql(
            "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?o <urn:orders:o_orderstatus> ?s . } GROUP BY ?s"
        ),
        quads,
    )
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 2, "expect map-side partial + final aggregation"


def test_quadstore_scan_prunes_partitions(spark, tmp_path):
    from janus_spark.sources.quadstore import QuadStore

    store = QuadStore(spark, os.path.join(str(tmp_path), "qs"), bucket_ms=1000)
    store.write(melt_sensor_fixture(spark, 1000))  # ts 100..100000 → ~100 buckets
    df = store.query(5000, 6000)
    plan = plan_of(df)
    assert "ts_bucket" in plan  # partition filter present
    # only 2 buckets qualify; the scan should not list ~100 partitions
    scan_line = [l for l in plan.splitlines() if "Scan parquet" in l or "FileScan" in l]
    assert df.count() == 11  # inclusive bounds


def test_static_quads_join_stays_broadcastable(spark):
    quads = melt_sensor_fixture(spark, 1000)
    static = spark.createDataFrame(
        [(0, "http://example.org/sensor1", "https://janus.rs/baseline#mean", "22.5", "")],
        ["ts", "subject", "predicate", "object", "graph"],
    )
    df = compile_sparql(
        parse_sparql(
            """SELECT ?s ?t ?m WHERE {
                 ?s <http://example.org/temperature> ?t .
                 ?s <https://janus.rs/baseline#mean> ?m . }"""
        ),
        quads,
        static_quads=static,
    )
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan
