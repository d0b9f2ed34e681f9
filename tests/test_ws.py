"""WebSocket result delivery (C6 WS leg) — the reference's WS endpoint
(src/http/server.rs:473-545) served by the from-scratch RFC 6455 layer
(janus_spark/ws.py) and driven end-to-end over a real TCP connection
through the live Flask dev server."""

import json
import threading

import pytest

from janus_spark.engine import JanusEngine
from janus_spark.http_api import HAVE_FLASK, create_app
from janus_spark.sources.melt import melt_sensor_fixture
from janus_spark.ws import (
    OP_CLOSE,
    OP_PING,
    OP_PONG,
    OP_TEXT,
    MiniWsClient,
    encode_frame,
    handshake_accept,
    read_frame,
)

pytestmark = pytest.mark.skipif(not HAVE_FLASK, reason="flask not available")

EX = "http://example.org/"

HIST_QUERY = f"""
PREFIX ex: <{EX}>
REGISTER RStream <out> AS
SELECT ?sensor ?temp
FROM NAMED WINDOW ex:hist ON LOG ex:sensors [START 1000 END 3000]
WHERE {{ WINDOW ex:hist {{ ?sensor ex:temperature ?temp . }} }}
"""


def test_handshake_accept_rfc_vector():
    # the worked example from RFC 6455 §1.3
    assert handshake_accept("dGhlIHNhbXBsZSBub25jZQ==") == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="


def test_frame_roundtrip_all_length_classes():
    import socket as s

    for n in (0, 125, 126, 65535, 65536):
        for mask in (False, True):
            payload = bytes(i % 251 for i in range(n))
            a, b = s.socketpair()
            try:
                a.sendall(encode_frame(payload, OP_TEXT, mask=mask))
                opcode, got = read_frame(b)
                assert opcode == OP_TEXT and got == payload, (n, mask)
            finally:
                a.close()
                b.close()


def test_poll_control_partial_frame_never_desyncs():
    # ADVICE r5: a poll timeout firing after part of a frame header had
    # been consumed used to discard those bytes and desync every later
    # frame.  Feed a masked PING one byte at a time, polling between
    # bytes — the connection must stay in sync, answer the PING once it
    # completes, and then answer a second, fully-sent PING too.
    import socket as s

    from janus_spark.ws import WsServerConnection

    client, server = s.socketpair()
    try:
        conn = WsServerConnection(server)
        frame = encode_frame(b"p1", OP_PING, mask=True)
        for i, byte in enumerate(frame):
            client.sendall(bytes([byte]))
            assert conn.poll_control(timeout=0.05) is True, f"dropped at byte {i}"
        opcode, payload = read_frame(client)
        assert (opcode, payload) == (OP_PONG, b"p1")
        client.sendall(encode_frame(b"p2", OP_PING, mask=True))
        assert conn.poll_control(timeout=0.2) is True
        opcode, payload = read_frame(client)
        assert (opcode, payload) == (OP_PONG, b"p2")
        # CLOSE still detected through the buffered path
        client.sendall(encode_frame(b"\x03\xe8", OP_CLOSE, mask=True))
        assert conn.poll_control(timeout=0.2) is False
    finally:
        client.close()
        server.close()


@pytest.fixture()
def live_server(spark, tmp_path):
    from werkzeug.serving import make_server

    quads = melt_sensor_fixture(spark, 100)
    engine = JanusEngine(spark, quads)
    app = create_app(engine, buffer_root=str(tmp_path / "live"))
    server = make_server("127.0.0.1", 0, app, threaded=True)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield server.server_port, app
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_ws_results_end_to_end(live_server):
    port, app = live_server
    client = app.test_client()
    qid = client.post("/api/queries", json={"query": HIST_QUERY}).get_json()["query_id"]
    client.post(f"/api/queries/{qid}/start")

    ws = MiniWsClient("127.0.0.1", port, f"/api/queries/{qid}/results/ws?timeout=60&max=1")
    opcode, payload = ws.recv_message()
    assert opcode == OP_TEXT
    msg = json.loads(payload.decode())
    assert msg["source"] == "historical" and msg["type"] == "result"
    assert msg["query_id"] == qid
    assert len(msg["bindings"]) == 21  # same stream the SSE test pins
    # after max=1 the server closes cleanly
    opcode, _ = ws.recv_message()
    assert opcode == OP_CLOSE
    ws.close()


def test_ws_server_answers_ping(live_server):
    port, app = live_server
    client = app.test_client()
    qid = client.post("/api/queries", json={"query": HIST_QUERY}).get_json()["query_id"]
    # no start → no results; server sits in the drain loop polling control
    ws = MiniWsClient("127.0.0.1", port, f"/api/queries/{qid}/results/ws?timeout=10&max=1")
    ws.sock.sendall(encode_frame(b"hb", OP_PING, mask=True))
    opcode, payload = ws.recv_message()
    assert (opcode, payload) == (OP_PONG, b"hb")
    ws.close()
