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


def test_streaming_funnel_matches_batch_funnel_counts(spark, tmp_path):
    """Streaming completions must agree with the batch funnel's final
    step count on the same events (same earliest-completion greedy),
    with state crossing micro-batch boundaries."""
    import uuid

    from janus_spark.operators.analytics import funnel
    from janus_spark.streaming.stateful import streaming_funnel

    u = spark.range(0, 30)
    ev = (
        u.selectExpr("CAST(id AS STRING) AS user", "CAST(10*id + 1 AS DOUBLE) AS ts", "'a' AS event")
        .unionByName(u.where("id % 2 = 0").selectExpr(
            "CAST(id AS STRING) AS user", "CAST(10*id + 2 AS DOUBLE) AS ts", "'b' AS event"))
        .unionByName(u.where("id % 5 = 0").selectExpr(
            "CAST(id AS STRING) AS user", "CAST(10*id + 3 AS DOUBLE) AS ts", "'c' AS event"))
    )
    root = str(tmp_path / "funnel_stream")
    ev.where("event = 'a'").coalesce(1).write.parquet(f"{root}/b0.parquet")
    ev.where("event = 'b'").coalesce(1).write.parquet(f"{root}/b1.parquet")
    ev.where("event = 'c'").coalesce(1).write.parquet(f"{root}/b2.parquet")
    stream = (
        spark.readStream.schema("user string, ts double, event string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{root}/b*.parquet")
    )
    name = f"funnel_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_funnel(stream, ["a", "b", "c"])
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{root}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    completions = spark.table(name).collect()
    batch = funnel(
        ev.withColumn("ts_ms", ev.ts.cast("long")),
        ["a", "b", "c"], user_col="user", ts_col="ts_ms", event_col="event",
    ).collect()
    final = {r["step"]: r["n_users"] for r in batch}[3]
    assert len(completions) == final
    assert {r["user"] for r in completions} == {str(i) for i in range(0, 30, 10)}


def test_streaming_funnel_within_window_rejects_slow_completion(spark, tmp_path):
    import uuid

    from janus_spark.streaming.stateful import streaming_funnel

    rows = spark.createDataFrame(
        [("fast", 0.0, "a"), ("fast", 5.0, "b"),
         ("slow", 0.0, "a"), ("slow", 50.0, "b")],
        "user string, ts double, event string",
    )
    root = str(tmp_path / "funnel_w")
    rows.coalesce(1).write.parquet(f"{root}/b0.parquet")
    stream = (
        spark.readStream.schema("user string, ts double, event string")
        .parquet(f"{root}/b*.parquet")
    )
    name = f"funnelw_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_funnel(stream, ["a", "b"], within_ms=10)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{root}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r["user"] for r in spark.table(name).collect()}
    assert got == {"fast"}


def test_streaming_cep_equals_batch_on_random_splits(spark, tmp_path):
    """Batch/stream equivalence: for a terminal-symbol pattern, total
    streaming match counts equal the batch operator's, regardless of
    where micro-batch boundaries fall."""
    import random
    import uuid

    from janus_spark.operators.analytics import match_pattern
    from janus_spark.streaming.stateful import streaming_match_pattern

    rng = random.Random(3)
    rows = []
    for u in range(6):
        for i in range(30):
            rows.append((str(u), float(i * 10), rng.choice(["view", "click", "purchase", "error"])))
    # batch reference
    bdf = spark.createDataFrame(
        [(int(u), i, e, int(t)) for i, (u, t, e) in enumerate(rows)],
        ["user_id", "event_id", "event_type", "ts_ms"],
    )
    want = {
        str(r["user_id"]): r["n_matches"]
        for r in match_pattern(
            bdf, "vc+p", {"view": "v", "click": "c", "purchase": "p"}
        ).collect()
    }
    # stream the same rows in 4 random-boundary batches (per-user ts order
    # preserved because rows are globally ts-sorted per user already)
    cuts = sorted(rng.sample(range(1, len(rows)), 3))
    batches = [rows[a:b] for a, b in zip([0] + cuts, cuts + [len(rows)])]
    src = tmp_path / "src"
    for i, b in enumerate(batches):
        spark.createDataFrame(b, "user string, ts double, event string").coalesce(
            1
        ).write.parquet(str(src / f"b{i}"))
    stream = (
        spark.readStream.schema("user string, ts double, event string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    out = streaming_match_pattern(stream, "vc+p", {"view": "v", "click": "c", "purchase": "p"})
    name = f"cep_eq_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {}
    for r in spark.table(name).collect():
        got[r["user"]] = got.get(r["user"], 0) + r["n_new"]
    assert got == want
