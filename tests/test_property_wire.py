"""Property fuzz for the two from-scratch wire protocols (round 5).

These are the highest-risk byte-level codecs in the repo — a silent
framing bug corrupts results in flight rather than failing a gate — so
they get differential/property coverage beyond the e2e tests:

- RFC 6455 frames (janus_spark/ws.py): encode→decode roundtrip across
  the 7/16/64-bit length encodings, masked and unmasked, glued frames,
  and arbitrary splits between the handshake-buffered prefix and the
  socket (the ``_frame_from_buffer`` top-up path).
- MQTT 3.1.1 packets (janus_spark/sources/mqtt.py): remaining-length
  varint roundtrip at every boundary, packet roundtrip over a real
  socket with adversarial chunking, and the §4.7 topic-filter matcher
  checked against an independently-written recursive reference.
"""

from __future__ import annotations

import socket
import struct
import threading

from hypothesis import given, settings
from hypothesis import strategies as st

from janus_spark import ws
from janus_spark.sources import mqtt

# ---------------------------------------------------------------- helpers

# payload sizes straddling every length-encoding boundary, without
# megabyte examples on every run
_sizes = st.one_of(
    st.integers(0, 130),
    st.sampled_from([125, 126, 127, 65534, 65535, 65536, 65600]),
)
_payloads = _sizes.flatmap(lambda n: st.binary(min_size=n, max_size=n))


def _chunked_feed(data: bytes, cuts: list[int]):
    """A connected socket whose peer has already sent ``data`` in
    arbitrary chunks (kernel buffers it; sizes here stay << SO_SNDBUF)."""
    a, b = socket.socketpair()
    offsets = sorted({min(c, len(data)) for c in cuts})
    prev = 0
    for off in offsets + [len(data)]:
        if off > prev:
            a.sendall(data[prev:off])
            prev = off
    return a, b


# ---------------------------------------------------------------- RFC 6455

@given(
    payload=_payloads,
    opcode=st.sampled_from([ws.OP_TEXT, ws.OP_BIN, ws.OP_PING, ws.OP_PONG]),
    mask=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_ws_frame_roundtrip_buffer(payload, opcode, mask):
    frame = ws.encode_frame(payload, opcode, mask=mask)
    # header invariants: FIN set, mask bit mirrors the flag
    assert frame[0] == 0x80 | opcode
    assert bool(frame[1] & 0x80) == mask
    got_op, got_payload, rest = ws._frame_from_buffer(frame, None)
    assert (got_op, got_payload, rest) == (opcode, payload, b"")


@given(
    payloads=st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=5),
    mask=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_ws_glued_frames_parse_in_order(payloads, mask):
    buf = b"".join(ws.encode_frame(p, ws.OP_BIN, mask=mask) for p in payloads)
    out = []
    while buf:
        _, p, buf = ws._frame_from_buffer(buf, None)
        out.append(p)
    assert out == payloads


@given(
    payload=_payloads,
    mask=st.booleans(),
    split=st.integers(0, 70000),
)
@settings(max_examples=40, deadline=None)
def test_ws_buffer_socket_seam(payload, mask, split):
    """Any split between the handshake-glued prefix and the socket —
    including mid-header, mid-extended-length, mid-mask-key — parses."""
    frame = ws.encode_frame(payload, ws.OP_TEXT, mask=mask)
    split = min(split, len(frame))
    a, b = socket.socketpair()
    try:
        if split < len(frame):
            a.sendall(frame[split:])
        op, got, rest = ws._frame_from_buffer(frame[:split], b)
        assert (op, got, rest) == (ws.OP_TEXT, payload, b"")
    finally:
        a.close()
        b.close()


@given(payload=_payloads, mask=st.booleans(), cuts=st.lists(st.integers(0, 70000), max_size=6))
@settings(max_examples=40, deadline=None)
def test_ws_read_frame_chunked_socket(payload, mask, cuts):
    frame = ws.encode_frame(payload, ws.OP_BIN, mask=mask)
    a, b = _chunked_feed(frame, cuts)
    try:
        assert ws.read_frame(b) == (ws.OP_BIN, payload)
    finally:
        a.close()
        b.close()


def test_ws_mask_key_applied():
    # deterministic spot check that masked bytes actually differ when the
    # key is nonzero: decode of the wire bytes must invert the XOR
    frame = ws.encode_frame(b"\x00" * 8, ws.OP_BIN, mask=True)
    key = frame[2:6]
    wire_payload = frame[6:]
    assert wire_payload == bytes(key[i % 4] for i in range(8))


# ---------------------------------------------------------------- MQTT

@given(st.one_of(
    st.integers(0, 300),
    st.sampled_from([127, 128, 16383, 16384, 2097151, 2097152, 268435455]),
))
@settings(max_examples=80, deadline=None)
def test_mqtt_varint_roundtrip(n):
    enc = mqtt.encode_varint(n)
    assert 1 <= len(enc) <= 4
    # continuation bit on every byte but the last
    assert all(b & 0x80 for b in enc[:-1]) and not enc[-1] & 0x80
    val, shift = 0, 0
    for byte in enc:
        val |= (byte & 0x7F) << shift
        shift += 7
    assert val == n


def test_mqtt_varint_range_errors():
    import pytest

    for bad in (-1, 268435456):
        with pytest.raises(ValueError):
            mqtt.encode_varint(bad)


def test_mqtt_malformed_varint_raises():
    import pytest

    a, b = socket.socketpair()
    try:
        a.sendall(bytes([mqtt.PUBLISH << 4]) + b"\x80\x80\x80\x80\x80")
        with pytest.raises(ValueError):
            mqtt.read_packet(b)
    finally:
        a.close()
        b.close()


@given(
    packets=st.lists(
        st.tuples(
            st.sampled_from([mqtt.CONNECT, mqtt.PUBLISH, mqtt.SUBACK, mqtt.PINGREQ]),
            st.integers(0, 15),
            st.binary(min_size=0, max_size=400),
        ),
        min_size=1,
        max_size=4,
    ),
    cuts=st.lists(st.integers(0, 2000), max_size=6),
)
@settings(max_examples=50, deadline=None)
def test_mqtt_packet_roundtrip_chunked(packets, cuts):
    wire = b"".join(mqtt._packet(t, f, body) for t, f, body in packets)
    a, b = _chunked_feed(wire, cuts)
    try:
        for t, f, body in packets:
            assert mqtt.read_packet(b) == (t, f, body)
    finally:
        a.close()
        b.close()


def _ref_topic_match(fparts: list[str], tparts: list[str]) -> bool:
    """Independent recursive statement of MQTT 3.1.1 §4.7 semantics
    (including '#' matching its parent level: 'a/#' matches 'a')."""
    if not fparts:
        return not tparts
    if fparts[0] == "#":
        return len(fparts) == 1
    if not tparts:
        return False
    if fparts[0] == "+" or fparts[0] == tparts[0]:
        return _ref_topic_match(fparts[1:], tparts[1:])
    return False


_level = st.sampled_from(["a", "b", "cc", "+", "#", ""])
_topic_level = st.sampled_from(["a", "b", "cc", "d", ""])


@given(
    filt=st.lists(_level, min_size=1, max_size=4).map("/".join),
    topic=st.lists(_topic_level, min_size=1, max_size=5).map("/".join),
)
@settings(max_examples=400, deadline=None)
def test_mqtt_topic_match_differential(filt, topic):
    assert mqtt.topic_matches(filt, topic) == _ref_topic_match(
        filt.split("/"), topic.split("/")
    )


def test_mqtt_topic_match_spec_vectors():
    # §4.7.1 examples
    cases = [
        ("sport/tennis/player1/#", "sport/tennis/player1", True),
        ("sport/tennis/player1/#", "sport/tennis/player1/ranking", True),
        ("sport/tennis/player1/#", "sport/tennis/player1/score/wimbledon", True),
        ("sport/#", "sport", True),
        ("sport/tennis/+", "sport/tennis/player1", True),
        ("sport/tennis/+", "sport/tennis/player1/ranking", False),
        ("sport/+", "sport", False),
        ("sport/+", "sport/", True),
        ("+/+", "/finance", True),
        ("/+", "/finance", True),
        ("+", "/finance", False),
    ]
    for filt, topic, want in cases:
        assert mqtt.topic_matches(filt, topic) is want, (filt, topic)


def test_mqtt_publish_header_layout():
    # PUBLISH QoS1 body: topic string, packet id, then raw payload —
    # parse one built by the client against the broker's decode logic
    body = mqtt._mqtt_str("a/b") + struct.pack(">H", 7) + b"payload"
    tlen = struct.unpack(">H", body[:2])[0]
    assert body[2 : 2 + tlen].decode() == "a/b"
    pid = struct.unpack(">H", body[2 + tlen : 4 + tlen])[0]
    assert pid == 7 and body[4 + tlen :] == b"payload"


def test_ws_client_server_fragpath_e2e():
    """Server frames pushed back-to-back arrive through MiniWsClient's
    buffered-then-socket path regardless of TCP segmentation."""
    a, b = socket.socketpair()
    try:
        msgs = [f"row-{i}".encode() for i in range(50)]
        wire = b"".join(ws.encode_frame(m) for m in msgs)
        # deliver in pathological 3-byte segments from a thread
        def feed():
            for i in range(0, len(wire), 3):
                a.sendall(wire[i : i + 3])
        t = threading.Thread(target=feed)
        t.start()
        got = [ws.read_frame(b)[1] for _ in range(50)]
        t.join()
        assert got == msgs
    finally:
        a.close()
        b.close()
