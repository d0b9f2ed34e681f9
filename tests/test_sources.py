"""N-Quads parse/format round-trip (S1) and quad store pruning (S2/S3)."""

import os

import pytest
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


# ---------------------------------------------------------------- S7 streams
def test_decode_kafka_quads_batch(spark):
    """Kafka value→quads decode: own-timestamp lines keep it, bare lines
    default to the broker append time (stored-in-log ⇒ replay-stable)."""
    from datetime import datetime, timezone

    from janus_spark.sources.stream import decode_kafka_quads

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [
            (b'500 <http://ex/s1> <http://ex/p> "7" <http://ex/g> .', t0),
            (b'<http://ex/s2> <http://ex/p> "8" .', t0),
            (b"# comment", t0),
        ],
        "value binary, timestamp timestamp",
    )
    rows = {tuple(r) for r in decode_kafka_quads(df).collect()}
    t0ms = int(t0.timestamp() * 1000)
    assert rows == {
        (500, "http://ex/s1", "http://ex/p", "7", "http://ex/g"),
        (t0ms, "http://ex/s2", "http://ex/p", "8", ""),
    }


def test_open_quad_stream_parquet_and_text(spark, tmp_path):
    from janus_spark.model import QUAD_SCHEMA
    from janus_spark.sources.stream import open_quad_stream

    pdir = tmp_path / "quads.parquet"
    melt_sensor_fixture(spark, 10).write.parquet(str(pdir))
    s = open_quad_stream(spark, f"file://{pdir}")
    assert s.isStreaming
    assert [(f.name, f.dataType) for f in s.schema.fields] == [
        (f.name, f.dataType) for f in QUAD_SCHEMA.fields
    ]

    tdir = tmp_path / "lines"
    tdir.mkdir()
    (tdir / "a.nq").write_text('100 <http://ex/s> <http://ex/p> "v" .\n')
    s2 = open_quad_stream(spark, str(tdir))
    q = (
        s2.writeStream.format("memory").queryName("s7txt")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM s7txt").collect()
    assert [tuple(r) for r in got] == [(100, "http://ex/s", "http://ex/p", "v", "")]


def test_open_quad_stream_kafka_missing_package(spark):
    from janus_spark.sources.stream import open_quad_stream

    with pytest.raises(Exception, match="(?i)kafka"):
        open_quad_stream(spark, "kafka://broker:9092/sensors")


def test_dedup_quad_stream(spark, tmp_path):
    from janus_spark.model import QUAD_SCHEMA
    from janus_spark.sources.stream import dedup_quad_stream

    rows = [
        (1000, "s1", "p", "a", ""),
        (1000, "s1", "p", "a", ""),  # redelivered duplicate
        (2000, "s2", "p", "b", ""),
        (2000, "s2", "p", "b", ""),
        (3000, "s2", "p", "c", ""),
    ]
    src = tmp_path / "dupsrc"
    src.mkdir()
    spark.createDataFrame(rows, QUAD_SCHEMA).coalesce(1).write.parquet(str(src / "f"))
    stream = spark.readStream.schema(QUAD_SCHEMA).parquet(str(src / "f"))
    q = (
        dedup_quad_stream(stream, within="1 minute")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_stream").collect()
    assert len(got) == 3
    assert {(r["ts"], r["subject"], r["object"]) for r in got} == {
        (1000, "s1", "a"), (2000, "s2", "b"), (3000, "s2", "c")
    }
    # batch fallback
    batch = dedup_quad_stream(spark.createDataFrame(rows, QUAD_SCHEMA))
    assert batch.count() == 3


def test_quadstore_vacuum(spark, tmp_path):
    from janus_spark.model import QUAD_SCHEMA
    from janus_spark.sources.quadstore import QuadStore

    store = QuadStore(spark, str(tmp_path / "vac"), bucket_ms=1000)
    rows = [(i * 1000 + 1, f"s{i}", "p", "o", "") for i in range(10)]
    store.write(spark.createDataFrame(rows, QUAD_SCHEMA))
    # now = 10_000; retain 3 s -> cutoff bucket 7: buckets 0..6 removed
    removed = store.vacuum(retain_ms=3000, now_ts=10_000)
    assert removed == 7
    left = store.read()
    assert left.count() == 3
    assert left.agg(F.min("ts")).collect()[0][0] == 7001
    # idempotent
    assert store.vacuum(retain_ms=3000, now_ts=10_000) == 0


def _parquet_files(root):
    from pathlib import Path

    return [p for p in Path(root).rglob("*.parquet") if p.is_file()]


def test_quadstore_predicate_clustering_gives_homogeneous_rowgroups(spark, tmp_path):
    """cluster='predicate' must produce predicate-runs across row groups
    (non-overlapping min/max ranges) — that is what makes
    constant-predicate scans skip row groups via footer stats."""
    import duckdb

    from janus_spark.sources.melt import melt_sensor_fixture
    from janus_spark.sources.quadstore import QuadStore

    hc = spark._jsc.hadoopConfiguration()
    old_bs = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 64 * 1024)
    try:
        store = QuadStore(spark, str(tmp_path / "st"), bucket_ms=10**12)
        store.write(melt_sensor_fixture(spark, 60_000), mode="overwrite", cluster="predicate")
        con = duckdb.connect()
        multi = checked = 0
        for f in _parquet_files(tmp_path / "st"):
            rgs = con.execute(
                "SELECT row_group_id, stats_min_value, stats_max_value "
                "FROM parquet_metadata(?) WHERE path_in_schema = 'predicate' "
                "ORDER BY row_group_id",
                [str(f)],
            ).fetchall()
            if len(rgs) < 2:
                continue
            multi += 1
            for (_, lo1, hi1), (_, lo2, hi2) in zip(rgs, rgs[1:]):
                assert hi1 <= lo2, f"overlapping predicate runs in {f}"
                checked += 1
        assert multi >= 1 and checked >= 1  # the assertion actually ran
    finally:
        if old_bs is None:
            hc.unset("parquet.block.size")
        else:
            hc.set("parquet.block.size", old_bs)


def test_quadstore_bloom_filter_written_on_subject(spark, tmp_path):
    """bloom_subjects=True must emit Parquet bloom filters for the
    subject column (footer bloom offset set); default write must not.

    NB parquet-mr skips the bloom when a column chunk ends up fully
    dictionary-encoded (the dictionary already gives exact row-group
    membership), so the fixture needs realistic subject cardinality —
    which is exactly the 100 TB case where the filter matters."""
    import pyspark.sql.functions as F

    from janus_spark.sources.quadstore import QuadStore

    def bloom_offsets(root):
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        offs = []
        for f in _parquet_files(root):
            inf = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                jvm.org.apache.hadoop.fs.Path(str(f)), conf
            )
            reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inf)
            try:
                for block in reader.getFooter().getBlocks():
                    for col in block.getColumns():
                        if col.getPath().toDotString() == "subject":
                            offs.append(col.getBloomFilterOffset())
            finally:
                reader.close()
        return offs

    quads = spark.range(50_000).select(
        F.concat(F.lit("http://example.org/u"), F.col("id")).alias("subject"),
        F.lit("http://example.org/value").alias("predicate"),
        F.col("id").cast("string").alias("object"),
        F.lit("").alias("graph"),
        F.col("id").alias("ts"),
    )
    plain = QuadStore(spark, str(tmp_path / "plain"), bucket_ms=10**12)
    plain.write(quads, mode="overwrite")
    bloomed = QuadStore(spark, str(tmp_path / "bloom"), bucket_ms=10**12)
    bloomed.write(quads, mode="overwrite", bloom_subjects=True, bloom_ndv=50_000)
    assert all(o == -1 for o in bloom_offsets(tmp_path / "plain"))
    offs = bloom_offsets(tmp_path / "bloom")
    assert offs and any(o > 0 for o in offs)
    # scans stay correct through the bloomed store
    got = bloomed.read().where("subject = 'http://example.org/u123'").count()
    exp = quads.where("subject = 'http://example.org/u123'").count()
    assert got == exp == 1
