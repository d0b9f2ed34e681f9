"""S7 native MQTT leg, end-to-end with zero external services: the
from-scratch MQTT 3.1.1 client/broker (sources/mqtt.py) carries real
protocol bytes over real TCP sockets, the spool bridge commits the feed
into a replayable directory, and Structured Streaming consumes it into
canonical quads (reference behavior: src/stream/mqtt_subscriber.rs:100-191).
"""

from __future__ import annotations

import os
import time

import pytest

from janus_spark.sources.mqtt import (
    MiniMqttBroker,
    MqttClient,
    MqttSpoolBridge,
    encode_varint,
    topic_matches,
)


def test_varint_and_topic_match():
    assert encode_varint(0) == b"\x00"
    assert encode_varint(127) == b"\x7f"
    assert encode_varint(128) == b"\x80\x01"
    assert encode_varint(16_383) == b"\xff\x7f"
    assert encode_varint(268_435_455) == b"\xff\xff\xff\x7f"
    with pytest.raises(ValueError):
        encode_varint(268_435_456)

    assert topic_matches("a/b", "a/b")
    assert not topic_matches("a/b", "a/c")
    assert topic_matches("a/+", "a/b")
    assert not topic_matches("a/+", "a/b/c")
    assert topic_matches("a/#", "a/b/c")
    assert topic_matches("#", "anything/at/all")
    assert not topic_matches("a/#/b", "a/x/b")  # '#' must be last


def _wait(pred, timeout=10.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.02)
    return False


def test_broker_pubsub_qos0_and_qos1():
    broker = MiniMqttBroker().start()
    try:
        got: list[tuple[str, bytes]] = []
        sub = MqttClient("127.0.0.1", broker.port)
        sub.connect()
        sub.subscribe("sensors/+/temp", qos=1)
        import threading

        stop = threading.Event()
        t = threading.Thread(target=sub.loop, args=(lambda tp, p: got.append((tp, p)), stop), daemon=True)
        t.start()

        pub = MqttClient("127.0.0.1", broker.port)
        pub.connect()
        pub.publish("sensors/a/temp", b"17", qos=0)
        pub.publish("sensors/b/temp", b"21", qos=1)  # waits for broker PUBACK
        pub.publish("sensors/a/humidity", b"99", qos=0)  # filter must NOT match

        assert _wait(lambda: len(got) >= 2)
        time.sleep(0.2)  # allow any misrouted third message to arrive
        assert sorted(got) == [("sensors/a/temp", b"17"), ("sensors/b/temp", b"21")]
        stop.set()
        t.join(timeout=5)
        pub.disconnect()
        sub.disconnect()
    finally:
        broker.stop()


def test_spool_bridge_commits_complete_files(tmp_path):
    broker = MiniMqttBroker().start()
    spool = str(tmp_path / "spool")
    bridge = MqttSpoolBridge("127.0.0.1", broker.port, "quads", spool, flush_interval_s=0.1)
    try:
        bridge.start()
        pub = MqttClient("127.0.0.1", broker.port)
        pub.connect()
        lines = [f'{100 * (i + 1)} <http://ex/s{i}> <http://ex/p> "{i}" .' for i in range(5)]
        pub.publish("quads", "\n".join(lines[:3]).encode(), qos=1)  # multi-line payload
        for ln in lines[3:]:
            pub.publish("quads", ln.encode(), qos=1)
        assert _wait(
            lambda: sum(
                1
                for f in os.listdir(spool)
                if f.endswith(".txt")
            ) > 0
            and sum(
                len(open(os.path.join(spool, f), encoding="utf-8").read().splitlines())
                for f in os.listdir(spool)
                if f.endswith(".txt")
            )
            == 5
        )
        # no torn temp files left behind after the flush cadence
        committed = [f for f in os.listdir(spool) if f.endswith(".txt")]
        assert committed and all(not f.startswith(".") for f in committed)
        pub.disconnect()
    finally:
        bridge.stop()
        broker.stop()


def test_mqtt_stream_end_to_end(spark, tmp_path):
    """mqtt://… URI → native subscriber → spool → streaming quads."""
    from janus_spark.sources.stream import open_quad_stream

    broker = MiniMqttBroker().start()
    spool = str(tmp_path / "spool")
    stream = open_quad_stream(
        spark, f"mqtt://127.0.0.1:{broker.port}/sensors", spool_dir=spool
    )
    try:
        assert stream.isStreaming
        pub = MqttClient("127.0.0.1", broker.port)
        pub.connect()
        pub.publish(
            "sensors",
            b'100 <http://ex/s1> <http://ex/p> "7" .\n200 <http://ex/s2> <http://ex/p> "8" .',
            qos=1,
        )
        assert _wait(lambda: any(f.endswith(".txt") for f in os.listdir(spool)))
        q = (
            stream.writeStream.format("memory")
            .queryName("mqtt_e2e")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {tuple(r) for r in spark.sql("SELECT * FROM mqtt_e2e").collect()}
        assert got == {
            (100, "http://ex/s1", "http://ex/p", "7", ""),
            (200, "http://ex/s2", "http://ex/p", "8", ""),
        }
        pub.disconnect()
    finally:
        stream.mqtt_bridge.stop()
        broker.stop()


LIVE_AGG_QUERY = """
PREFIX ex: <http://example.org/>
REGISTER RStream <out> AS
SELECT ?sensor (COUNT(?temp) AS ?n)
FROM NAMED WINDOW ex:w ON STREAM ex:sensors [RANGE 2000 STEP 2000]
WHERE { WINDOW ex:w { ?sensor ex:temperature ?temp . } }
GROUP BY ?sensor
"""


def test_mqtt_source_engine_lifecycle(spark, tmp_path):
    """The full S7 story over a real broker: REGISTER → start_live_auto
    on an mqtt:// stream → native streaming window agg → results match
    the batch evaluation of the same fixture → stop (status machine)."""
    import time as _time

    from pyspark.sql import functions as F

    from janus_spark.engine import JanusEngine
    from janus_spark.sources.melt import melt_sensor_fixture
    from janus_spark.sources.nquads import format_nquads
    from janus_spark.sources.stream import open_quad_stream

    EX = "http://example.org/"
    quads = melt_sensor_fixture(spark, 200)  # ts 100..20000
    lines = [r["value"] for r in format_nquads(quads).collect()]

    broker = MiniMqttBroker().start()
    stream = open_quad_stream(
        spark,
        f"mqtt://127.0.0.1:{broker.port}/sensors",
        spool_dir=str(tmp_path / "spool"),
    )
    try:
        eng = JanusEngine(spark, quads)
        qid = eng.register_query(LIVE_AGG_QUERY)
        assert eng.get_query(qid).status == "Registered"

        mode, out = eng.start_live_auto(
            qid, stream, str(tmp_path / "buf"), watermark="1 seconds"
        )
        assert mode == "native"
        assert eng.get_query(qid).status == "Running"

        pub = MqttClient("127.0.0.1", broker.port)
        pub.connect()
        # chunked QoS1 publishes — redelivery-safe transport into the spool
        for i in range(0, len(lines), 50):
            pub.publish("sensors", "\n".join(lines[i : i + 50]).encode(), qos=1)

        q = (
            out.writeStream.format("memory")
            .queryName("mqtt_agg")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            deadline = _time.time() + 180
            got = []
            while _time.time() < deadline:
                got = spark.sql("SELECT * FROM mqtt_agg").collect()
                if len(got) >= 20:  # 5 sensors x several closed 2s windows
                    break
                _time.sleep(1.0)
            assert len(got) >= 20, f"only {len(got)} rows arrived via mqtt"
        finally:
            q.stop()

        batch = {
            (int(r["ws"]), r["sensor"]): r["n"]
            for r in quads.where(F.col("predicate") == f"{EX}temperature")
            .select(
                (F.floor(F.col("ts") / 2000) * 2000).alias("ws"),
                F.col("subject").alias("sensor"),
            )
            .groupBy("ws", "sensor")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for r in got:
            d = r.asDict()
            assert batch[(int(d["window_start"]), d["sensor"])] == d["n"], d

        eng.stop_query(qid)
        assert eng.get_query(qid).status == "Stopped"
        pub.disconnect()
    finally:
        stream.mqtt_bridge.stop()
        broker.stop()
