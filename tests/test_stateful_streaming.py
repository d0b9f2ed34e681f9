"""Streaming stateful comparator (W9 via applyInPandasWithState):
state persists across micro-batches, matching the batch comparator."""

import pytest
from pyspark.sql import functions as F

from janus_spark.model import QUAD_SCHEMA  # noqa: F401  (session warm import)
from janus_spark.operators.comparator import detect_anomalies
from janus_spark.streaming.stateful import streaming_comparator


def _stream_rows(spark, tmp_path, batches):
    """Write per-batch parquet files and return a file-streaming DF."""
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("ts", DoubleType()),
            StructField("live", DoubleType()),
            StructField("hist", DoubleType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / f"b{i}"))
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src / "b*"))


def test_streaming_matches_batch_comparator(spark, tmp_path):
    # trend-divergent series split across two micro-batches
    rows = [("k", float(t), float(t), float(9 - t)) for t in range(10)]
    stream = _stream_rows(spark, tmp_path, [rows[:5], rows[5:]])
    out = streaming_comparator(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("cmp_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM cmp_out ORDER BY ts").collect()
    assert len(got) == 10
    # state crossed the batch boundary: the last row sees all 10 points
    last = got[-1]
    assert "TrendDivergence" in last["anomalies"]
    # equivalence with the batch comparator on the same data
    bdf = spark.createDataFrame(
        [(float(t), float(t), float(9 - t)) for t in range(10)], ["ts", "live", "hist"]
    )
    batch_last = detect_anomalies(bdf, "live", "hist").orderBy("ts").collect()[-1]
    assert set(last["anomalies"]) == set(batch_last["anomalies"])
    assert abs(last["live_mean"] - 4.5) < 1e-9


def test_streaming_keys_isolated(spark, tmp_path):
    rows_a = [("a", float(t), float(t), float(9 - t)) for t in range(10)]
    rows_b = [("b", float(t), 5.0, 5.0) for t in range(10)]
    stream = _stream_rows(spark, tmp_path, [rows_a + rows_b])
    out = streaming_comparator(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("cmp_keys")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM cmp_keys ORDER BY key, ts").collect()
    a_last = [r for r in got if r["key"] == "a"][-1]
    b_last = [r for r in got if r["key"] == "b"][-1]
    assert "TrendDivergence" in a_last["anomalies"]
    assert list(b_last["anomalies"]) == []
