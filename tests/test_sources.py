"""N-Quads parse/format round-trip (S1) and quad store pruning (S2/S3)."""

import os

from pyspark.sql import functions as F

from janus_spark.sources import QuadStore, format_nquads, parse_nquads_lines
from janus_spark.sources.melt import melt_sensor_fixture


def test_parse_nquads_forms(spark):
    lines = spark.createDataFrame(
        [
            ('1000 <http://ex/s> <http://ex/p> "23.5"^^<http://www.w3.org/2001/XMLSchema#decimal> <http://ex/g> .',),
            ('<http://ex/s2> <http://ex/p> "hello"@en .',),
            ("<http://ex/s3> <http://ex/p> <http://ex/o> <http://ex/g> .",),
            ("# comment",),
            ("",),
            ('2000 <http://ex/s4> <http://ex/p> "plain" .',),
        ],
        ["value"],
    )
    rows = parse_nquads_lines(lines, default_ts=F.lit(7)).orderBy("ts").collect()
    assert len(rows) == 4
    by_s = {r["subject"]: r for r in rows}
    # datatype stripped (rdf_parser.rs:130-154)
    assert by_s["http://ex/s"]["object"] == "23.5"
    assert by_s["http://ex/s"]["ts"] == 1000
    # lang tag stripped, no leading ts -> default
    assert by_s["http://ex/s2"]["object"] == "hello"
    assert by_s["http://ex/s2"]["ts"] == 7
    # IRI object + graph
    assert by_s["http://ex/s3"]["graph"] == "http://ex/g"
    assert by_s["http://ex/s4"]["object"] == "plain"


def test_nquads_round_trip(spark):
    quads = melt_sensor_fixture(spark, 50)
    lines = format_nquads(quads)
    back = parse_nquads_lines(lines)
    a = {tuple(r) for r in quads.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_quadstore_write_query_inclusive(spark, tmp_path):
    path = os.path.join(str(tmp_path), "store")
    store = QuadStore(spark, path, bucket_ms=1000)
    store.write(melt_sensor_fixture(spark, 100))  # ts 100..10000
    got = store.query(1000, 3000)
    assert got.count() == 21  # inclusive bounds
    assert set(got.columns) == {"ts", "subject", "predicate", "object", "graph"}
    # partition pruning: only buckets 1..3 scanned
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ts_bucket" in plan


def test_quadstore_append(spark, tmp_path):
    path = os.path.join(str(tmp_path), "store2")
    store = QuadStore(spark, path, bucket_ms=1000)
    store.write(melt_sensor_fixture(spark, 10))
    store.write(melt_sensor_fixture(spark, 10))
    assert store.read().count() == 20


def test_quadstore_compact_preserves_data(spark, tmp_path):
    import glob

    path = os.path.join(str(tmp_path), "store3")
    store = QuadStore(spark, path, bucket_ms=1000)
    # 10 small appends -> many small files
    for _ in range(10):
        store.write(melt_sensor_fixture(spark, 100))
    before_files = len(glob.glob(f"{path}/**/*.parquet", recursive=True))
    before = store.read().count()
    store.compact()
    after_files = len(glob.glob(f"{path}/**/*.parquet", recursive=True))
    assert store.read().count() == before == 1000
    assert after_files < before_files
    # pruned range query still correct after compaction
    assert store.query(1000, 3000).count() == 210
