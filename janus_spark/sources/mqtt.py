"""Native MQTT 3.1.1 transport for the live quad source — operator S7.

The reference's live source is an MQTT subscriber feeding parsed N-Quads
lines into the runtime (src/stream/mqtt_subscriber.rs:100-191; URI
mapping janus_api.rs:849-884).  No MQTT client library ships in this
environment, so this module implements the required slice of the public
OASIS MQTT 3.1.1 wire protocol directly over TCP sockets: CONNECT /
CONNACK, SUBSCRIBE / SUBACK, PUBLISH (QoS 0 and 1) / PUBACK, PINGREQ /
PINGRESP, DISCONNECT.  ~150 lines of framing is all the protocol needs
for subscribe-and-consume plus publish.

Spark integration is the **spool bridge**: Structured Streaming cannot
read an arbitrary socket protocol, and an unreplayable transport is the
wrong ingestion contract anyway — so ``MqttSpoolBridge`` subscribes
(QoS 1, at-least-once), batches received payload lines, and commits
them as atomically-renamed text files in a spool directory that
``spark.readStream.text`` tails.  That turns the fire-and-forget broker
feed into a replayable log BEFORE Spark sees it — the same durability
move as the reference's stream-bus dual-write (stream_bus.rs:279-298),
and it composes with ``dedup_quad_stream`` for redelivered QoS 1
messages.  At cluster scale the spool directory is object storage and
the bridge is a tiny stateless pod per topic; Spark's file source
handles exactly-once tracking of committed files.

``MiniMqttBroker`` is a correct-subset broker (exact + ``+``/``#``
wildcard routing, QoS 0/1) so the whole path — broker → client →
spool → Structured Streaming — runs end-to-end in tests without any
external service; the client speaks the standard protocol, so against
a production broker (mosquitto, EMQX, HiveMQ) nothing changes.
"""

from __future__ import annotations

import os
import socket
import struct
import threading
import time
import uuid

# packet types (MQTT 3.1.1 §2.2.1)
CONNECT, CONNACK, PUBLISH, PUBACK = 1, 2, 3, 4
SUBSCRIBE, SUBACK, UNSUBSCRIBE, UNSUBACK = 8, 9, 10, 11
PINGREQ, PINGRESP, DISCONNECT = 12, 13, 14


# ---------------------------------------------------------------- framing
def encode_varint(n: int) -> bytes:
    """Remaining-length varint (§2.2.3): 7 bits per byte, MSB = more."""
    if n < 0 or n > 268_435_455:
        raise ValueError(f"remaining length out of range: {n}")
    out = bytearray()
    while True:
        n, digit = divmod(n, 128)
        out.append(digit | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("MQTT peer closed the connection")
        buf.extend(chunk)
    return bytes(buf)


def read_packet(sock: socket.socket) -> tuple[int, int, bytes]:
    """Read one MQTT control packet → (type, flags, body)."""
    head = _read_exact(sock, 1)[0]
    length, shift = 0, 0
    for _ in range(4):
        b = _read_exact(sock, 1)[0]
        length |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    else:
        raise ValueError("malformed remaining length")
    body = _read_exact(sock, length) if length else b""
    return head >> 4, head & 0x0F, body


def _mqtt_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


def _packet(ptype: int, flags: int, body: bytes) -> bytes:
    return bytes([(ptype << 4) | flags]) + encode_varint(len(body)) + body


def topic_matches(filt: str, topic: str) -> bool:
    """Topic-filter match (§4.7): ``+`` one level, ``#`` rest (last only)."""
    fparts, tparts = filt.split("/"), topic.split("/")
    for i, fp in enumerate(fparts):
        if fp == "#":
            return i == len(fparts) - 1
        if i >= len(tparts):
            return False
        if fp != "+" and fp != tparts[i]:
            return False
    return len(fparts) == len(tparts)


# ---------------------------------------------------------------- client
class MqttClient:
    """Minimal blocking MQTT 3.1.1 client (QoS 0/1) over a TCP socket.

    Protocol-complete for the engine's needs: the subscribe leg acks
    QoS 1 deliveries (at-least-once), the publish leg waits for PUBACK,
    and idle periods send PINGREQ inside the keepalive window.

    One instance is EITHER a subscriber (``loop``) or a publisher —
    a concurrent ``publish`` while ``loop`` owns the socket reader
    would race the read; use two connections for both roles (that is
    also every broker's recommendation for head-of-line blocking).
    """

    def __init__(
        self,
        host: str,
        port: int = 1883,
        client_id: str | None = None,
        keepalive_s: int = 60,
        timeout_s: float = 30.0,
    ):
        self.host, self.port = host, port
        self.client_id = client_id or f"janus-{uuid.uuid4().hex[:12]}"
        self.keepalive_s = keepalive_s
        self.timeout_s = timeout_s
        self.sock: socket.socket | None = None
        self._pid = 0
        self._wlock = threading.Lock()

    def _next_pid(self) -> int:
        self._pid = self._pid % 65535 + 1
        return self._pid

    def _send(self, data: bytes) -> None:
        with self._wlock:
            self.sock.sendall(data)

    def connect(self) -> None:
        self.sock = socket.create_connection((self.host, self.port), timeout=self.timeout_s)
        body = (
            _mqtt_str("MQTT")
            + bytes([0x04])                      # protocol level 4 = 3.1.1
            + bytes([0x02])                      # clean session
            + struct.pack(">H", self.keepalive_s)
            + _mqtt_str(self.client_id)
        )
        self._send(_packet(CONNECT, 0, body))
        ptype, _, ack = read_packet(self.sock)
        if ptype != CONNACK or len(ack) < 2 or ack[1] != 0:
            raise ConnectionError(f"CONNACK refused: type={ptype} body={ack!r}")

    def subscribe(self, topic: str, qos: int = 1) -> None:
        pid = self._next_pid()
        self._send(_packet(SUBSCRIBE, 0x02, struct.pack(">H", pid) + _mqtt_str(topic) + bytes([qos])))
        ptype, _, body = read_packet(self.sock)
        if ptype != SUBACK or struct.unpack(">H", body[:2])[0] != pid or body[2] == 0x80:
            raise ConnectionError(f"SUBACK refused: type={ptype} body={body!r}")

    def publish(self, topic: str, payload: bytes, qos: int = 0) -> None:
        if qos == 0:
            self._send(_packet(PUBLISH, 0, _mqtt_str(topic) + payload))
            return
        pid = self._next_pid()
        self._send(_packet(PUBLISH, 0x02, _mqtt_str(topic) + struct.pack(">H", pid) + payload))
        while True:  # QoS1: wait for our PUBACK, acking any interleaved delivery
            ptype, flags, body = read_packet(self.sock)
            if ptype == PUBACK and struct.unpack(">H", body[:2])[0] == pid:
                return
            if ptype == PUBLISH:
                self._handle_publish(flags, body, lambda t, p: None)

    def _handle_publish(self, flags: int, body: bytes, on_message) -> None:
        qos = (flags >> 1) & 0x03
        tlen = struct.unpack(">H", body[:2])[0]
        topic = body[2 : 2 + tlen].decode("utf-8")
        rest = body[2 + tlen :]
        if qos:
            pid, rest = struct.unpack(">H", rest[:2])[0], rest[2:]
            self._send(_packet(PUBACK, 0, struct.pack(">H", pid)))  # at-least-once ack
        on_message(topic, rest)

    def loop(self, on_message, stop: threading.Event) -> None:
        """Receive loop: dispatch PUBLISH payloads to ``on_message(topic,
        payload_bytes)`` until ``stop`` is set; pings inside keepalive."""
        self.sock.settimeout(1.0)
        last_io = time.monotonic()
        while not stop.is_set():
            try:
                ptype, flags, body = read_packet(self.sock)
                last_io = time.monotonic()
            except (TimeoutError, socket.timeout):
                if time.monotonic() - last_io > self.keepalive_s / 2:
                    self._send(_packet(PINGREQ, 0, b""))
                    last_io = time.monotonic()
                continue
            except (ConnectionError, OSError):
                if stop.is_set():
                    return
                raise
            if ptype == PUBLISH:
                self._handle_publish(flags, body, on_message)
            # PINGRESP / PUBACK(for qos1 pubs from other threads) ignored here

    def disconnect(self) -> None:
        try:
            if self.sock:
                self._send(_packet(DISCONNECT, 0, b""))
                self.sock.close()
        except OSError:
            pass
        self.sock = None


# ---------------------------------------------------------------- bridge
class MqttSpoolBridge:
    """MQTT topic → replayable spool directory (the Spark ingestion leg).

    Subscribes at QoS 1 and appends each received payload line to an
    in-memory batch; every ``flush_lines`` lines or ``flush_interval_s``
    seconds the batch is written to ``<spool>/.part-<seq>.tmp`` and
    atomically renamed to ``part-<seq>.txt`` — Spark's file source only
    ever lists committed files, so a reader never observes a torn write.
    The spool IS the durable log: replays and at-least-once redeliveries
    are handled downstream (``dedup_quad_stream``), exactly the
    reference's bus-dual-write contract (stream_bus.rs:279-298).
    """

    def __init__(
        self,
        host: str,
        port: int,
        topic: str,
        spool_dir: str,
        flush_lines: int = 500,
        flush_interval_s: float = 0.25,
    ):
        self.topic = topic
        self.spool_dir = spool_dir
        self.flush_lines = flush_lines
        self.flush_interval_s = flush_interval_s
        self.client = MqttClient(host, port)
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._batch: list[str] = []
        self._seq = 0
        self._thread: threading.Thread | None = None
        self._flusher: threading.Thread | None = None

    def start(self) -> "MqttSpoolBridge":
        os.makedirs(self.spool_dir, exist_ok=True)
        self.client.connect()
        self.client.subscribe(self.topic, qos=1)
        self._thread = threading.Thread(target=self._recv_loop, daemon=True)
        self._flusher = threading.Thread(target=self._flush_loop, daemon=True)
        self._thread.start()
        self._flusher.start()
        return self

    def _on_message(self, _topic: str, payload: bytes) -> None:
        lines = [ln for ln in payload.decode("utf-8", "replace").splitlines() if ln.strip()]
        with self._lock:
            self._batch.extend(lines)
            if len(self._batch) >= self.flush_lines:
                self._flush_locked()

    def _recv_loop(self) -> None:
        self.client.loop(self._on_message, self._stop)

    def _flush_loop(self) -> None:
        while not self._stop.wait(self.flush_interval_s):
            with self._lock:
                self._flush_locked()

    def _flush_locked(self) -> None:
        if not self._batch:
            return
        seq = self._seq
        self._seq += 1
        tmp = os.path.join(self.spool_dir, f".part-{seq:08d}.tmp")
        final = os.path.join(self.spool_dir, f"part-{seq:08d}.txt")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(self._batch) + "\n")
        os.rename(tmp, final)  # atomic commit — readers never see partials
        self._batch = []

    def stop(self) -> None:
        self._stop.set()
        for t in (self._thread, self._flusher):
            if t:
                t.join(timeout=5)
        with self._lock:
            self._flush_locked()
        self.client.disconnect()


# ---------------------------------------------------------------- broker
class MiniMqttBroker:
    """Correct-subset MQTT 3.1.1 broker: CONNECT/SUBSCRIBE/PUBLISH
    (QoS 0/1) with exact + ``+``/``#`` wildcard routing and PINGREQ.

    Exists so the full live path runs end-to-end in tests (and works as
    a dev bus); it is NOT the production broker — the client side
    speaks the standard protocol against any real one.  Retained
    messages, QoS 2, sessions, and wills are intentionally absent.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind((host, port))
        self.sock.listen(16)
        self.host, self.port = self.sock.getsockname()[:2]
        self._subs: dict[socket.socket, list[tuple[str, int]]] = {}
        self._locks: dict[socket.socket, threading.Lock] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._accept_thread = threading.Thread(target=self._accept_loop, daemon=True)

    def start(self) -> "MiniMqttBroker":
        self._accept_thread.start()
        return self

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _send(self, conn: socket.socket, data: bytes) -> None:
        with self._locks.setdefault(conn, threading.Lock()):
            conn.sendall(data)

    def _serve(self, conn: socket.socket) -> None:
        try:
            ptype, _, _body = read_packet(conn)
            if ptype != CONNECT:
                return
            self._send(conn, _packet(CONNACK, 0, b"\x00\x00"))
            while not self._stop.is_set():
                ptype, flags, body = read_packet(conn)
                if ptype == SUBSCRIBE:
                    pid = struct.unpack(">H", body[:2])[0]
                    i, granted = 2, []
                    with self._lock:
                        subs = self._subs.setdefault(conn, [])
                        while i < len(body):
                            tlen = struct.unpack(">H", body[i : i + 2])[0]
                            topic = body[i + 2 : i + 2 + tlen].decode("utf-8")
                            qos = min(body[i + 2 + tlen], 1)
                            subs.append((topic, qos))
                            granted.append(qos)
                            i += 3 + tlen
                    self._send(conn, _packet(SUBACK, 0, struct.pack(">H", pid) + bytes(granted)))
                elif ptype == PUBLISH:
                    qos = (flags >> 1) & 0x03
                    tlen = struct.unpack(">H", body[:2])[0]
                    topic = body[2 : 2 + tlen].decode("utf-8")
                    rest = body[2 + tlen :]
                    if qos:
                        pid, rest = struct.unpack(">H", rest[:2])[0], rest[2:]
                        self._send(conn, _packet(PUBACK, 0, struct.pack(">H", pid)))
                    self._route(topic, rest)
                elif ptype == PINGREQ:
                    self._send(conn, _packet(PINGRESP, 0, b""))
                elif ptype in (DISCONNECT,):
                    return
        except (ConnectionError, OSError, ValueError):
            pass
        finally:
            with self._lock:
                self._subs.pop(conn, None)
                self._locks.pop(conn, None)
            try:
                conn.close()
            except OSError:
                pass

    def _route(self, topic: str, payload: bytes) -> None:
        pid = int(time.monotonic_ns() % 65535) + 1
        with self._lock:
            targets = [
                (c, qos)
                for c, subs in self._subs.items()
                for filt, qos in subs
                if topic_matches(filt, topic)
            ]
        for conn, qos in targets:
            try:
                if qos:
                    pkt = _packet(
                        PUBLISH, 0x02, _mqtt_str(topic) + struct.pack(">H", pid) + payload
                    )
                else:
                    pkt = _packet(PUBLISH, 0, _mqtt_str(topic) + payload)
                self._send(conn, pkt)
            except OSError:
                pass  # dead subscriber; reaped by its serve thread

    def stop(self) -> None:
        self._stop.set()
        try:
            self.sock.close()
        except OSError:
            pass
