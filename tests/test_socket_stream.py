"""S7 end-to-end over a REAL socket: a TCP server feeds ts-prefixed
N-Quads lines, ``open_quad_stream``'s socket branch parses them into the
canonical quads schema, and the engine lifecycle runs the native
streaming window aggregation on top (register -> start -> consume ->
stop, status machine asserted).

No broker exists in this container, so this is the live-transport leg of
S7 (reference: src/stream/mqtt_subscriber.rs:100-191) — the Kafka/MQTT
branch shares the same decode (`decode_kafka_quads` is unit-tested in
test_sources.py) and differs only in the reader format string.
"""

from __future__ import annotations

import socket
import threading
import time

import pytest
from pyspark.sql import functions as F

from janus_spark.engine import JanusEngine
from janus_spark.sources.melt import melt_sensor_fixture
from janus_spark.sources.nquads import format_nquads
from janus_spark.sources.stream import open_quad_stream

EX = "http://example.org/"

LIVE_AGG_QUERY = f"""
PREFIX ex: <{EX}>
REGISTER RStream <out> AS
SELECT ?sensor (COUNT(?temp) AS ?n)
FROM NAMED WINDOW ex:w ON STREAM ex:sensors [RANGE 2000 STEP 2000]
WHERE {{ WINDOW ex:w {{ ?sensor ex:temperature ?temp . }} }}
GROUP BY ?sensor
"""


class _LineServer:
    """Minimal TCP server: accepts one client, sends all lines, keeps the
    connection open until released (the socket source treats EOF as
    stream end/failure)."""

    def __init__(self, lines: list[str]):
        self.lines = lines
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.release = threading.Event()
        self.sent = threading.Event()
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        conn, _ = self.sock.accept()
        try:
            payload = ("\n".join(self.lines) + "\n").encode()
            conn.sendall(payload)
            self.sent.set()
            self.release.wait(timeout=300)
        finally:
            conn.close()
            self.sock.close()

    def close(self):
        self.release.set()


def test_socket_source_live_lifecycle(spark, tmp_path):
    quads = melt_sensor_fixture(spark, 200)  # ts 100..20000
    lines = [r["value"] for r in format_nquads(quads).collect()]
    server = _LineServer(lines)
    try:
        eng = JanusEngine(spark, quads)
        qid = eng.register_query(LIVE_AGG_QUERY)
        assert eng.get_query(qid).status == "Registered"

        stream = open_quad_stream(spark, f"socket://127.0.0.1:{server.port}")
        assert stream.isStreaming
        mode, out = eng.start_live_auto(
            qid, stream, str(tmp_path / "buf"), watermark="1 seconds"
        )
        assert mode == "native"  # single-pattern aggregate -> native path
        assert eng.get_query(qid).status == "Running"

        q = (
            out.writeStream.format("memory")
            .queryName("socket_agg")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            deadline = time.time() + 180
            got = []
            while time.time() < deadline:
                got = spark.sql("SELECT * FROM socket_agg").collect()
                # 5 sensors x several closed 2s windows
                if len(got) >= 20:
                    break
                time.sleep(1.0)
            assert len(got) >= 20, f"only {len(got)} rows arrived via socket"
        finally:
            q.stop()
        server.close()

        # every emitted (window, sensor, n) matches the batch evaluation
        # of the same fixture — the socket transport lost/damaged nothing
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
            ws = int(d["window_start"])
            assert batch[(ws, d["sensor"])] == d["n"], d

        eng.stop_query(qid)
        assert eng.get_query(qid).status == "Stopped"
    finally:
        server.close()
