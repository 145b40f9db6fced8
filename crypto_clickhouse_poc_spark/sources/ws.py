"""Minimal RFC 6455 WebSocket *client* on the standard library.

Enough protocol for a read-mostly market-data feed (the reference's
``src/stream_binance.py:87-115`` socket loop): client handshake with
``Sec-WebSocket-Accept`` verification, text/binary frames with 7/16/64-bit
lengths, fragmented-message reassembly, ping→pong keepalive, clean close.
``ws://`` and ``wss://`` (stdlib ``ssl``) both work. No third-party
dependency — the live Binance source (``sources.binance.LiveTradesReader``)
runs on this, and a local stdlib server in ``tests/test_ws.py`` exercises
the full framing path hermetically.

Protocol facts used here are from RFC 6455 itself (public spec):
- client→server frames MUST be masked; server→client frames MUST NOT be.
- payload length: 7 bits, or 126 → 16-bit BE, or 127 → 64-bit BE.
- accept token: base64(sha1(key + 258EAFA5-E914-47DA-95CA-C5AB0DC85B11)).
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import ssl as _ssl
import struct
from urllib.parse import urlparse

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG = 0, 1, 2, 8, 9, 10

# A frame's wire length field is up to 64 bits; buffering whatever a
# misbehaving server advertises would let one frame exhaust driver memory
# (the reader's deque bounds message COUNT, not message size). Trade
# messages are <1 KB; 16 MB is orders of magnitude of headroom.
MAX_FRAME_BYTES = 16 * 1024 * 1024


def accept_token(key: str) -> str:
    """Server handshake response token for a client key (RFC 6455 §4.2.2)."""
    return base64.b64encode(
        hashlib.sha1((key + _GUID).encode()).digest()
    ).decode()


def encode_frame(opcode: int, payload: bytes, mask: bool) -> bytes:
    """One unfragmented frame (FIN set). Client frames set ``mask=True``."""
    head = bytearray([0x80 | opcode])
    n = len(payload)
    mbit = 0x80 if mask else 0
    if n < 126:
        head.append(mbit | n)
    elif n < 1 << 16:
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


class WSClient:
    """Blocking WebSocket client: ``connect`` → ``recv()`` messages.

    ``recv`` returns the next complete text (str) or binary (bytes)
    message, transparently answering pings; returns None on clean close.
    """

    def __init__(self, url: str, timeout: float = 30.0) -> None:
        u = urlparse(url)
        if u.scheme not in ("ws", "wss"):
            raise ValueError(f"not a websocket url: {url}")
        host = u.hostname or "127.0.0.1"
        port = u.port or (443 if u.scheme == "wss" else 80)
        path = (u.path or "/") + (f"?{u.query}" if u.query else "")
        self._sock = socket.create_connection((host, port), timeout=timeout)
        if u.scheme == "wss":
            ctx = _ssl.create_default_context()
            self._sock = ctx.wrap_socket(self._sock, server_hostname=host)
        key = base64.b64encode(os.urandom(16)).decode()
        req = (
            f"GET {path} HTTP/1.1\r\n"
            f"Host: {host}:{port}\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        )
        self._sock.sendall(req.encode())
        self._rbuf = b""  # bytes past the handshake (frames can coalesce)
        resp = self._read_headers()
        status = resp.split("\r\n", 1)[0]
        if " 101 " not in f" {status} ":
            raise ConnectionError(f"handshake rejected: {status}")
        want = accept_token(key)
        got = None
        for line in resp.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            if k.strip().lower() == "sec-websocket-accept":
                got = v.strip()
        if got != want:
            raise ConnectionError("Sec-WebSocket-Accept mismatch")
        self._closed = False

    def _read_headers(self) -> str:
        buf = b""
        while b"\r\n\r\n" not in buf:
            chunk = self._sock.recv(4096)
            if not chunk:
                raise ConnectionError("socket closed during handshake")
            buf += chunk
        head, rest = buf.split(b"\r\n\r\n", 1)
        self._rbuf = rest  # first frames may ride in the same segment
        return head.decode("latin-1")

    def _read_exact(self, n: int) -> bytes:
        while len(self._rbuf) < n:
            chunk = self._sock.recv(max(4096, n - len(self._rbuf)))
            if not chunk:
                raise ConnectionError("socket closed mid-frame")
            self._rbuf += chunk
        out, self._rbuf = self._rbuf[:n], self._rbuf[n:]
        return out

    def _read_frame(self) -> tuple[bool, int, bytes]:
        b1, b2 = self._read_exact(2)
        fin, opcode = bool(b1 & 0x80), b1 & 0x0F
        masked, n = bool(b2 & 0x80), b2 & 0x7F
        if n == 126:
            (n,) = struct.unpack(">H", self._read_exact(2))
        elif n == 127:
            (n,) = struct.unpack(">Q", self._read_exact(8))
        if n > MAX_FRAME_BYTES:
            raise ConnectionError(f"frame of {n} bytes exceeds {MAX_FRAME_BYTES}")
        key = self._read_exact(4) if masked else None
        payload = self._read_exact(n)
        if key:  # tolerated though servers must not mask (RFC 6455 §5.1)
            payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
        return fin, opcode, payload

    def recv(self) -> str | bytes | None:
        """Next complete message; None once the server closes.

        Bounded assembly: the per-frame cap alone doesn't bound memory — a
        hostile server can stream unlimited sub-cap continuation fragments
        of ONE message, so the ACCUMULATED message size is capped too.
        """
        parts: list[bytes] = []
        total = 0
        opcode0: int | None = None
        while True:
            fin, opcode, payload = self._read_frame()
            if opcode == OP_PING:
                self._sock.sendall(encode_frame(OP_PONG, payload, mask=True))
                continue
            if opcode == OP_PONG:
                continue
            if opcode == OP_CLOSE:
                if not self._closed:
                    self._sock.sendall(encode_frame(OP_CLOSE, b"", mask=True))
                    self._closed = True
                return None
            if opcode in (OP_TEXT, OP_BINARY):
                if opcode0 is not None:
                    # a new data frame while a fragmented message is still
                    # open would silently DROP the buffered fragments —
                    # fail the connection instead (RFC 6455 §5.4: data
                    # frames must not interleave with a fragmented message)
                    raise ConnectionError(
                        "protocol error: new data frame inside fragmented message"
                    )
                opcode0 = opcode
                parts = [payload]
                total = len(payload)
            elif opcode == OP_CONT:
                if opcode0 is None:  # continuation with nothing to continue
                    raise ConnectionError("protocol error: orphan continuation frame")
                total += len(payload)
                if total > MAX_FRAME_BYTES:
                    raise ConnectionError(
                        f"fragmented message exceeds {MAX_FRAME_BYTES} bytes"
                    )
                parts.append(payload)
            else:
                # reserved opcode (0x3-0x7, 0xB-0xF): RFC 6455 §5.2 — fail
                # the connection rather than silently truncating a message
                raise ConnectionError(f"protocol error: reserved opcode {opcode}")
            if fin:
                msg = b"".join(parts)
                return msg.decode() if opcode0 == OP_TEXT else msg

    def send_text(self, text: str) -> None:
        self._sock.sendall(encode_frame(OP_TEXT, text.encode(), mask=True))

    def close(self) -> None:
        if not self._closed:
            try:
                self._sock.sendall(encode_frame(OP_CLOSE, b"", mask=True))
            except OSError:
                pass
            self._closed = True
        try:
            self._sock.close()
        except OSError:
            pass
