"""Streaming quad sources — operator S7/S9 (live broker feeds).

The reference subscribes to an MQTT broker and feeds parsed N-Quads
lines into the live runtime (src/api/janus_api.rs:849-884 maps stream
IRIs onto broker URIs).  Spark has no MQTT source, and brokered
ingestion at 100 TB/day is Kafka's job anyway — so the Spark-first
mapping is:

- ``kafka://host:port/topic``   → Structured Streaming Kafka source,
  one N-Quads line per message value (the exact payload the reference's
  stream bus publishes, stream_bus.rs:279-298);
- ``mqtt://host:port/topic``    → native MQTT 3.1.1 subscriber
  (``sources/mqtt.py``, QoS 1) bridged through an atomically-committed
  spool directory that Spark's file source tails — the broker feed is
  made replayable BEFORE Spark sees it; ``mqtt+kafka://host:port/topic``
  keeps the old external-bridge mapping (Kafka side of an MQTT→Kafka
  relay);
- ``socket://host:port``        → Spark's built-in socket text source
  (dev/demo only — not replayable);
- ``file:///dir`` or bare path  → file stream (``*.parquet`` dirs as
  quad parquet, anything else as N-Quads text files).

All of them yield the canonical quads schema, so
``LiveQueryRunner.attach`` / ``native_window_agg_stream`` work
unchanged on any of them.

The Kafka path needs the ``spark-sql-kafka`` package on the classpath
(not bundled with plain pyspark); ``open_quad_stream`` raises a clear
error when it is missing.  The value→quads decode is pure Column logic
(``decode_kafka_quads``) and is unit-tested on batch frames without a
broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from janus_spark.model import QUAD_SCHEMA
from janus_spark.sources.nquads import parse_nquads_lines

#: live MqttSpoolBridge instances started by ``open_quad_stream`` —
#: callers stop them individually (df.mqtt_bridge.stop()) or in bulk.
active_mqtt_bridges: list = []


def decode_kafka_quads(kafka_df: DataFrame, default_ts=None) -> DataFrame:
    """Kafka records → quads.  ``value`` holds one N-Quads line
    (optionally timestamp-prefixed); lines without their own timestamp
    default to the broker append time — the closest Spark analogue of
    the reference's arrival-time stamping (rdf_parser.rs:36-44), but
    stable across replays because it is stored in the log.

    Pure Column expressions (JVM-side); works on the streaming Kafka
    frame and on any batch frame with ``value``/``timestamp`` columns.
    """
    if default_ts is None and "timestamp" in kafka_df.columns:
        default_ts = F.unix_millis(F.col("timestamp").cast("timestamp"))
    lines = kafka_df.select(
        F.col("value").cast("string").alias("value"),
        *([default_ts.alias("__arrival_ms")] if default_ts is not None else []),
    )
    return parse_nquads_lines(
        lines,
        default_ts=F.col("__arrival_ms") if default_ts is not None else None,
    )


def open_quad_stream(
    spark: SparkSession,
    uri: str,
    default_ts=None,
    **options,
) -> DataFrame:
    """Open a streaming quads DataFrame for a stream URI (scheme table
    in the module docstring).  Extra ``options`` pass through to the
    underlying reader (e.g. ``maxFilesPerTrigger``, Kafka consumer
    settings prefixed ``kafka.``).

    The ``mqtt://`` branch starts a native subscriber bridge
    (``sources/mqtt.py::MqttSpoolBridge``); pass ``spool_dir=`` to pin
    the spool location (default: a fresh temp dir), and stop the bridge
    via the ``mqtt_bridge`` attribute of the returned DataFrame (also
    tracked in ``active_mqtt_bridges``)."""
    if uri.startswith("mqtt://"):
        import tempfile

        from janus_spark.engine import parse_mqtt_uri
        from janus_spark.sources.mqtt import MqttSpoolBridge

        host, port, topic = parse_mqtt_uri(uri)
        spool = options.pop("spool_dir", None) or tempfile.mkdtemp(prefix="mqtt_spool_")
        bridge = MqttSpoolBridge(host, port, topic, spool).start()
        active_mqtt_bridges.append(bridge)
        reader = spark.readStream
        for k, v in options.items():
            reader = reader.option(k, v)
        out = parse_nquads_lines(reader.text(spool), default_ts=default_ts)
        out.mqtt_bridge = bridge
        return out
    if uri.startswith("kafka://") or uri.startswith("mqtt+kafka://"):
        from janus_spark.engine import parse_mqtt_uri

        host, port, topic = parse_mqtt_uri(
            "mqtt://" + uri.split("://", 1)[1]
        )
        if uri.startswith("kafka://") and port == 1883:  # mqtt default never applies
            port = 9092
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", f"{host}:{port}")
            .option("subscribe", topic)
        )
        for k, v in options.items():
            reader = reader.option(k, v)
        try:
            return decode_kafka_quads(reader.load(), default_ts=default_ts)
        except Exception as e:  # jar not on classpath → actionable error
            if "kafka" in str(e).lower() or "DATA_SOURCE_NOT_FOUND" in str(e):
                raise RuntimeError(
                    "Kafka source needs the spark-sql-kafka package: start Spark with "
                    "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
                ) from e
            raise
    if uri.startswith("socket://"):
        hostport = uri[len("socket://"):].rstrip("/")
        host, _, port = hostport.partition(":")
        reader = spark.readStream.format("socket").option("host", host or "localhost")
        reader = reader.option("port", int(port or 9999))
        for k, v in options.items():
            reader = reader.option(k, v)
        return parse_nquads_lines(reader.load(), default_ts=default_ts)
    path = uri[len("file://"):] if uri.startswith("file://") else uri
    if path.rstrip("/").endswith(".parquet") or options.pop("format", None) == "parquet":
        reader = spark.readStream.schema(QUAD_SCHEMA)
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.parquet(path)
    reader = spark.readStream
    for k, v in options.items():
        reader = reader.option(k, v)
    return parse_nquads_lines(reader.text(path), default_ts=default_ts)


def dedup_quad_stream(stream_df: DataFrame, within: str = "10 minutes") -> DataFrame:
    """Exactly-once-ish ingestion over at-least-once transports (MQTT QoS1
    redelivery, Kafka replays): drop duplicate quads arriving within the
    watermark horizon via ``dropDuplicatesWithinWatermark`` — state per
    quad key is evicted once the watermark passes, so memory is bounded
    by (ingest rate × horizon), not by history.  Batch DataFrames fall
    back to a plain dropDuplicates."""
    key = ["ts", "subject", "predicate", "object", "graph"]
    if not stream_df.isStreaming:
        return stream_df.dropDuplicates(key)
    out = (
        stream_df.withColumn("__et", F.timestamp_millis(F.col("ts")))
        .withWatermark("__et", within)
        .dropDuplicatesWithinWatermark(key)
        .drop("__et")
    )
    return out
