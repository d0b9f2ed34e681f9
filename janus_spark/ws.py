"""RFC 6455 WebSocket framing — result delivery parity with the
reference's WS endpoint (src/http/server.rs:473-545).

No WebSocket library is importable in this environment, so the
server-side protocol slice is implemented directly from the public RFC:
the HTTP Upgrade handshake (Sec-WebSocket-Accept = base64(SHA-1(key +
GUID))), unmasked server→client frames with 7/16/64-bit lengths, masked
client→server frame decode, and PING/PONG + CLOSE control handling.
``http_api.py`` hijacks the raw connection via werkzeug's documented
``werkzeug.socket`` environ key (a Flask route marked
``websocket=True`` so the router accepts the upgrade request) — the
same seam the public simple-websocket package uses.

``MiniWsClient`` is the client half (random masked frames, handshake
validation) so the endpoint is testable end-to-end in-repo; it speaks
the standard protocol, so any browser/production WS client
interoperates with the server route.
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import struct

WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_TEXT, OP_BIN, OP_CLOSE, OP_PING, OP_PONG = 0x1, 0x2, 0x8, 0x9, 0xA


def handshake_accept(key: str) -> str:
    """Sec-WebSocket-Accept for a client key (RFC 6455 §4.2.2)."""
    return base64.b64encode(hashlib.sha1((key + WS_GUID).encode()).digest()).decode()


def encode_frame(payload: bytes, opcode: int = OP_TEXT, mask: bool = False) -> bytes:
    """One FIN frame.  Servers send unmasked; clients MUST mask (§5.3)."""
    head = bytearray([0x80 | opcode])
    mbit = 0x80 if mask else 0
    n = len(payload)
    if n < 126:
        head.append(mbit | n)
    elif n < 65536:
        head.append(mbit | 126)
        head += struct.pack(">H", n)
    else:
        head.append(mbit | 127)
        head += struct.pack(">Q", n)
    if mask:
        key = os.urandom(4)
        head += key
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return bytes(head) + payload


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("WebSocket peer closed the connection")
        buf.extend(chunk)
    return bytes(buf)


def read_frame(sock: socket.socket) -> tuple[int, bytes]:
    """Read one frame → (opcode, unmasked payload)."""
    b0, b1 = _read_exact(sock, 2)
    opcode = b0 & 0x0F
    masked = b1 & 0x80
    n = b1 & 0x7F
    if n == 126:
        n = struct.unpack(">H", _read_exact(sock, 2))[0]
    elif n == 127:
        n = struct.unpack(">Q", _read_exact(sock, 8))[0]
    key = _read_exact(sock, 4) if masked else None
    payload = _read_exact(sock, n) if n else b""
    if key:
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return opcode, payload


def _try_parse_frame(buf: bytes) -> tuple[int, bytes, bytes] | None:
    """Parse one complete frame from ``buf`` without touching a socket.
    Returns (opcode, payload, rest) or None if the frame is incomplete —
    the caller keeps ``buf`` and retries after more bytes arrive, so a
    partially-received frame is never dropped mid-header."""
    if len(buf) < 2:
        return None
    b0, b1 = buf[0], buf[1]
    opcode, masked, n = b0 & 0x0F, b1 & 0x80, b1 & 0x7F
    off = 2
    if n == 126:
        if len(buf) < off + 2:
            return None
        n = struct.unpack(">H", buf[off : off + 2])[0]
        off += 2
    elif n == 127:
        if len(buf) < off + 8:
            return None
        n = struct.unpack(">Q", buf[off : off + 8])[0]
        off += 8
    klen = 4 if masked else 0
    if len(buf) < off + klen + n:
        return None
    key = buf[off : off + klen] if masked else None
    payload = buf[off + klen : off + klen + n]
    if key:
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return opcode, payload, buf[off + klen + n :]


class WsServerConnection:
    """Server side of an upgraded connection: text push + control frames."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self._rx = b""  # bytes received but not yet parsed into a frame

    @classmethod
    def upgrade(cls, sock: socket.socket, key: str) -> "WsServerConnection":
        sock.sendall(
            b"HTTP/1.1 101 Switching Protocols\r\n"
            b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
            b"Sec-WebSocket-Accept: " + handshake_accept(key).encode() + b"\r\n\r\n"
        )
        return cls(sock)

    def send_text(self, text: str) -> None:
        self.sock.sendall(encode_frame(text.encode("utf-8")))

    def poll_control(self, timeout: float = 0.0) -> bool:
        """Answer any pending PING, detect CLOSE.  Returns False once the
        client has closed (data frames from the client are drained and
        ignored — the results endpoint is push-only).

        Bytes are drained into ``self._rx`` and frames parsed from the
        buffer only when complete (ADVICE r5: a timeout firing after
        ``_read_exact`` had consumed part of a header used to discard
        those bytes and desync every subsequent frame)."""
        eof = False
        self.sock.settimeout(timeout or 0.001)
        try:
            chunk = self.sock.recv(65536)
            if chunk:
                self._rx += chunk
                # drain whatever else is already queued, without blocking
                self.sock.settimeout(0.0)
                while True:
                    try:
                        chunk = self.sock.recv(65536)
                    except (BlockingIOError, InterruptedError, TimeoutError, socket.timeout):
                        break
                    except (ConnectionError, OSError):
                        eof = True
                        break
                    if not chunk:
                        eof = True
                        break
                    self._rx += chunk
            else:
                eof = True
        except (TimeoutError, socket.timeout):
            pass  # nothing new; parse whatever is already buffered
        except (ConnectionError, OSError):
            eof = True
        finally:
            self.sock.settimeout(None)
        while True:
            parsed = _try_parse_frame(self._rx)
            if parsed is None:
                break
            opcode, payload, self._rx = parsed
            if opcode == OP_PING:
                try:
                    self.sock.sendall(encode_frame(payload, OP_PONG))
                except OSError:
                    return False
            elif opcode == OP_CLOSE:
                try:
                    self.sock.sendall(encode_frame(payload[:2], OP_CLOSE))
                except OSError:
                    pass
                return False
        return not eof

    def close(self, code: int = 1000) -> None:
        try:
            self.sock.sendall(encode_frame(struct.pack(">H", code), OP_CLOSE))
            self.sock.close()
        except OSError:
            pass


class MiniWsClient:
    """Standard-protocol WebSocket client (handshake validation, masked
    sends, server-frame reads) for driving the endpoint in tests."""

    def __init__(self, host: str, port: int, path: str, timeout_s: float = 30.0):
        self.sock = socket.create_connection((host, port), timeout=timeout_s)
        key = base64.b64encode(os.urandom(16)).decode()
        req = (
            f"GET {path} HTTP/1.1\r\nHost: {host}:{port}\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
        )
        self.sock.sendall(req.encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise ConnectionError("no handshake response")
            resp += chunk
        head, _, rest = resp.partition(b"\r\n\r\n")
        if b" 101 " not in head.split(b"\r\n", 1)[0]:
            raise ConnectionError(f"upgrade refused: {head[:120]!r}")
        expect = handshake_accept(key).encode()
        if expect not in head:
            raise ConnectionError("Sec-WebSocket-Accept mismatch")
        self._buf = rest  # frames that arrived glued to the handshake

    def recv_message(self) -> tuple[int, bytes]:
        """Next frame, answering pings transparently."""
        while True:
            if self._buf:
                # replay buffered bytes through a socketpair-free path:
                # feed them back via a memory cursor
                opcode, payload, self._buf = _frame_from_buffer(self._buf, self.sock)
            else:
                opcode, payload = read_frame(self.sock)
            if opcode == OP_PING:
                self.sock.sendall(encode_frame(payload, OP_PONG, mask=True))
                continue
            return opcode, payload

    def send_text(self, text: str) -> None:
        self.sock.sendall(encode_frame(text.encode("utf-8"), OP_TEXT, mask=True))

    def close(self) -> None:
        try:
            self.sock.sendall(encode_frame(b"\x03\xe8", OP_CLOSE, mask=True))
            self.sock.close()
        except OSError:
            pass


def _frame_from_buffer(buf: bytes, sock: socket.socket) -> tuple[int, bytes, bytes]:
    """Parse one frame from ``buf``, topping up from ``sock`` if the
    frame is split across the handshake read boundary."""
    need = 2
    while len(buf) < need:
        buf += _read_exact(sock, need - len(buf))
    b0, b1 = buf[0], buf[1]
    opcode, masked, n = b0 & 0x0F, b1 & 0x80, b1 & 0x7F
    off = 2
    if n == 126:
        need = off + 2
        while len(buf) < need:
            buf += _read_exact(sock, need - len(buf))
        n = struct.unpack(">H", buf[off : off + 2])[0]
        off += 2
    elif n == 127:
        need = off + 8
        while len(buf) < need:
            buf += _read_exact(sock, need - len(buf))
        n = struct.unpack(">Q", buf[off : off + 8])[0]
        off += 8
    klen = 4 if masked else 0
    need = off + klen + n
    while len(buf) < need:
        buf += _read_exact(sock, need - len(buf))
    key = buf[off : off + klen] if masked else None
    payload = buf[off + klen : off + klen + n]
    if key:
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return opcode, payload, buf[need:]
