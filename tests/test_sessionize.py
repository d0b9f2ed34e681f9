"""Sessionization operator: batch semantics + streaming parity."""

import datetime as dt

from janus_spark.operators.sessionize import sessionize


def _df(spark, offsets_by_user, base=dt.datetime(2024, 1, 1)):
    rows = [
        (u, base + dt.timedelta(seconds=s), float(s))
        for u, offsets in offsets_by_user.items()
        for s in offsets
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_inclusive_merge_at_exact_gap_boundary(spark):
    # event at exactly prev_ts + gap still merges (pinned: the DuckDB
    # oracle's island condition is `diff > gap`, not `>=`)
    df = _df(spark, {1: [0, 10, 25]})
    out = sorted(sessionize(df, gap="10 seconds").collect(), key=lambda r: r["session_start"])
    assert [(r["n_events"], r["session_end"] - r["session_start"]) for r in out] == [
        (2, 20_000),  # [0, 10+10): the 10s event merged
        (1, 10_000),  # [25, 35)
    ]


def test_session_end_is_last_event_plus_gap(spark):
    df = _df(spark, {7: [0, 3, 4]})
    (row,) = sessionize(df, gap="60 seconds").collect()
    base_ms = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert row["session_start"] == base_ms
    assert row["session_end"] == base_ms + 4_000 + 60_000


def test_sessionize_streaming_matches_batch(spark, tmp_path):
    """The same operator over a Structured Stream (watermarked session
    windows) produces exactly the batch answer."""
    df = _df(spark, {1: [0, 5, 20, 21, 50], 2: [2, 4, 40]})
    src = tmp_path / "sess_src"
    df.coalesce(1).write.parquet(str(src))

    def key(rows):
        return {(r["user_id"], r["session_start"], r["session_end"], r["n_events"]) for r in rows}

    batch = key(sessionize(df, gap="10 seconds").collect())
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    out = sessionize(stream.withWatermark("ts", "0 seconds"), gap="10 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "sess_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert key(spark.sql("SELECT * FROM sess_stream").collect()) == batch
    assert len(batch) == 5  # 3 sessions for user 1, 2 for user 2
