"""Hermetic live-WebSocket-path tests: a local stdlib RFC 6455 *server*
feeds the stdlib client (sources/ws.py) and the live Binance reader
(sources/binance.py::LiveTradesReader) — the code path the reference
exercises with its manual smoke script (binance_ws_test.py:1-95), here
runnable offline end-to-end through Structured Streaming."""

from __future__ import annotations

import base64
import hashlib
import json
import socket
import struct
import threading

import pytest

from crypto_clickhouse_poc_spark.sources.binance import (
    LiveTradesReader,
    synthetic_event,
)
from crypto_clickhouse_poc_spark.sources.ws import (
    OP_CLOSE,
    OP_PING,
    OP_PONG,
    OP_TEXT,
    WSClient,
    accept_token,
    encode_frame,
)

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


class LocalWSServer:
    """Stdlib WebSocket test server: per-connection scripted frames, then
    close. Accepts one connection per script in ``sessions`` (sequential —
    exercises client reconnect). Records any (unmasked) client frames."""

    def __init__(self, script, extra_sessions=()):
        # script: list of (opcode, payload-bytes) server→client frames for
        # the first connection; extra_sessions: scripts for reconnects
        self.sessions = [script, *extra_sessions]
        self.client_frames = []
        self.pongs = []
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def url(self) -> str:
        return f"ws://127.0.0.1:{self.port}/stream?streams=test"

    def _read_exact(self, conn, n):
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("closed")
            buf += chunk
        return buf

    def _read_client_frame(self, conn):
        b1, b2 = self._read_exact(conn, 2)
        opcode, masked, n = b1 & 0x0F, bool(b2 & 0x80), b2 & 0x7F
        if n == 126:
            (n,) = struct.unpack(">H", self._read_exact(conn, 2))
        elif n == 127:
            (n,) = struct.unpack(">Q", self._read_exact(conn, 8))
        assert masked, "RFC 6455: client frames MUST be masked"
        key = self._read_exact(conn, 4)
        payload = bytes(
            b ^ key[i % 4] for i, b in enumerate(self._read_exact(conn, n))
        )
        return opcode, payload

    def _run(self):
        try:
            for script in self.sessions:
                conn, _ = self._srv.accept()
                try:
                    req = b""
                    while b"\r\n\r\n" not in req:
                        req += conn.recv(4096)
                    headers = req.decode("latin-1")
                    key = next(
                        line.partition(":")[2].strip()
                        for line in headers.split("\r\n")
                        if line.lower().startswith("sec-websocket-key")
                    )
                    conn.sendall(
                        (
                            "HTTP/1.1 101 Switching Protocols\r\n"
                            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                            f"Sec-WebSocket-Accept: {accept_token(key)}\r\n\r\n"
                        ).encode()
                    )
                    for opcode, payload in script:
                        conn.sendall(encode_frame(opcode, payload, mask=False))
                        if opcode == OP_PING:  # collect the client's pong
                            op, pl = self._read_client_frame(conn)
                            self.pongs.append((op, pl))
                    conn.sendall(encode_frame(OP_CLOSE, b"", mask=False))
                    # drain the client's close reply (and more) until EOF
                    try:
                        while True:
                            self.client_frames.append(self._read_client_frame(conn))
                    except (ConnectionError, OSError):
                        pass
                finally:
                    conn.close()
        finally:
            self._srv.close()


def test_ws_client_handshake_frames_ping_close():
    """Text frames at 7-bit and 16-bit lengths, a ping mid-stream (client
    must pong with the same payload), then a clean close."""
    big = "x" * 300  # forces the 126/16-bit length form
    srv = LocalWSServer(
        [
            (OP_TEXT, b"hello"),
            (OP_PING, b"keepalive"),
            (OP_TEXT, big.encode()),
        ]
    )
    c = WSClient(srv.url(), timeout=10)
    assert c.recv() == "hello"
    assert c.recv() == big  # the ping in between is answered transparently
    assert c.recv() is None  # server close → clean None
    c.close()
    srv._thread.join(timeout=5)
    assert srv.pongs == [(OP_PONG, b"keepalive")]
    assert any(op == OP_CLOSE for op, _ in srv.client_frames)


def test_ws_client_rejects_bad_accept_token():
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def bad_server():
        conn, _ = srv.accept()
        req = b""
        while b"\r\n\r\n" not in req:
            req += conn.recv(4096)
        conn.sendall(
            b"HTTP/1.1 101 Switching Protocols\r\n"
            b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
            b"Sec-WebSocket-Accept: bogus\r\n\r\n"
        )
        conn.close()
        srv.close()

    threading.Thread(target=bad_server, daemon=True).start()
    with pytest.raises(ConnectionError, match="Accept mismatch"):
        WSClient(f"ws://127.0.0.1:{port}/", timeout=10)


def test_accept_token_matches_rfc_vector():
    # the worked example from RFC 6455 §1.3
    assert (
        accept_token("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )
    # and it IS sha1(key+GUID) — belt and braces against a typo'd GUID
    key = "dGhlIHNhbXBsZSBub25jZQ=="
    want = base64.b64encode(hashlib.sha1((key + _GUID).encode()).digest()).decode()
    assert accept_token(key) == want


def _event_lines(n):
    return [synthetic_event(i, ["btcusdt", "ethusdt"]) for i in range(n)]


def test_live_reader_drains_local_ws():
    """LiveTradesReader end-to-end against a local server: buffer fills from
    the socket thread, read() drains in offset order, offsets advance."""
    import time

    lines = _event_lines(20)
    srv = LocalWSServer([(OP_TEXT, ln.encode()) for ln in lines])
    # high max_retries: the one-shot server goes away after its script, and
    # the reconnecting pump must not surface an error while we drain
    rdr = LiveTradesReader({"url": srv.url(), "max_retries": "100000"})
    got = []
    deadline = time.time() + 15
    off = rdr.initialOffset()
    while len(got) < len(lines) and time.time() < deadline:
        rows, off = rdr.read(off)
        got.extend(r[0] for r in rows)
        time.sleep(0.05)
    assert got == lines
    assert off == {"seq": len(lines)}
    # a live batch cannot be replayed (at-least-once contract)
    assert list(rdr.readBetweenOffsets({"seq": 0}, off)) == []


def test_live_reader_reconnects_after_server_close(spark):
    """Reconnect parity with the reference collector: the server closes
    after the first half of the stream; the pump must reconnect and drain
    the second half from the next connection."""
    import time

    lines = _event_lines(20)
    first = [(OP_TEXT, ln.encode()) for ln in lines[:10]]
    second = [(OP_TEXT, ln.encode()) for ln in lines[10:]]
    srv = LocalWSServer(first, extra_sessions=[second])
    rdr = LiveTradesReader({"url": srv.url(), "max_retries": "100000"})
    got = []
    deadline = time.time() + 20
    off = rdr.initialOffset()
    while len(got) < len(lines) and time.time() < deadline:
        rows, off = rdr.read(off)
        got.extend(r[0] for r in rows)
        time.sleep(0.05)
    assert got == lines  # both halves, in order, across the reconnect


def test_live_ws_pipeline_through_streaming(spark, tmp_path):
    """The full live path under Structured Streaming: local WS server →
    binance_trades (synthetic=false, url=local) → normalize → parquet sink.
    Decoded rows equal the synthetic generator's ground truth."""
    import time

    from pyspark.sql import functions as F

    from crypto_clickhouse_poc_spark.sources.binance import BinanceTradesDataSource
    from crypto_clickhouse_poc_spark.streaming import ingest

    lines = _event_lines(30)
    srv = LocalWSServer([(OP_TEXT, ln.encode()) for ln in lines])
    spark.dataSource.register(BinanceTradesDataSource)
    raw = (
        spark.readStream.format("binance_trades")
        .option("synthetic", "false")
        .option("url", srv.url())
        .option("max_retries", "100000")
        .load()
    )
    dest, ckpt = str(tmp_path / "trades"), str(tmp_path / "ckpt")
    q = ingest.start_ingest(raw, dest, ckpt, trigger_sec=0, dedup=False)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                if spark.read.parquet(dest).count() >= len(lines):
                    break
            except Exception:
                pass
            time.sleep(0.2)
    finally:
        q.stop()
    df = spark.read.parquet(dest)
    assert df.count() == len(lines)
    want = {(json.loads(ln)["data"]["t"], json.loads(ln)["data"]["s"]) for ln in lines}
    got = {
        (r["trade_id"], r["symbol"])
        for r in df.select("trade_id", "symbol").collect()
    }
    assert got == want
    assert df.where(F.col("price").isNull() | F.col("ts").isNull()).count() == 0


def test_oversize_frame_rejected_before_buffering():
    """A frame advertising a multi-GB payload must be rejected from the
    length field alone — never buffered (the deque caps message count,
    not message size; this cap bounds per-message memory)."""
    import struct

    from crypto_clickhouse_poc_spark.sources.ws import MAX_FRAME_BYTES

    c = object.__new__(WSClient)
    # FIN|binary, unmasked 64-bit length of 4 GiB — no payload follows
    c._rbuf = bytes([0x82, 127]) + struct.pack(">Q", 1 << 32)
    c._sock = None  # must never be touched: the cap fires first
    with pytest.raises(ConnectionError, match="exceeds"):
        c._read_frame()
    # boundary: exactly MAX_FRAME_BYTES is allowed through the length check
    c._rbuf = bytes([0x82, 127]) + struct.pack(">Q", MAX_FRAME_BYTES)
    with pytest.raises(AttributeError):  # proceeds to read payload from _sock
        c._read_frame()


def test_live_reader_seq_resumes_from_checkpoint_offset():
    """After a restart the engine hands read() the checkpointed offset; a
    fresh reader must seed its counter from it so offsets never regress
    or repeat (offset uniqueness/monotonicity)."""
    rdr = LiveTradesReader({"url": "ws://127.0.0.1:1/", "max_retries": "0"})
    rdr._thread = object()  # pretend the pump is running; no network
    rdr._buffer.extend(["m1", "m2"])
    msgs, end = rdr.read({"seq": 500})
    assert len(list(msgs)) == 2
    assert end == {"seq": 502}
    # and a later batch continues monotonically from the new offset
    rdr._buffer.extend(["m3"])
    _, end2 = rdr.read(end)
    assert end2 == {"seq": 503}


def test_fragmented_message_assembly_is_bounded():
    """The per-frame cap alone doesn't bound memory: unlimited sub-cap
    continuation fragments of ONE message must also trip the cap once the
    ACCUMULATED size passes MAX_FRAME_BYTES."""
    from crypto_clickhouse_poc_spark.sources.ws import (
        MAX_FRAME_BYTES,
        OP_BINARY,
        OP_CONT,
    )

    c = object.__new__(WSClient)
    c._closed = False
    # one non-fin BINARY frame + enough non-fin CONT frames to pass the
    # cap; 126-style 16-bit lengths keep the header simple
    import struct

    def frame(op, fin):
        return bytes([(0x80 if fin else 0) | op, 126]) + struct.pack(">H", 0xFFFF) + b"y" * 0xFFFF

    n_frames = MAX_FRAME_BYTES // 0xFFFF + 2
    buf = frame(OP_BINARY, False) + b"".join(frame(OP_CONT, False) for _ in range(n_frames))
    c._rbuf = buf
    c._sock = None
    with pytest.raises(ConnectionError, match="fragmented message exceeds"):
        c.recv()


def test_interleaved_data_frame_inside_fragmented_message_fails():
    """A new TEXT/BINARY frame while a fragmented message is open must fail
    the connection (RFC 6455 §5.4) — never silently drop the buffered
    fragments."""
    import struct

    from crypto_clickhouse_poc_spark.sources.ws import OP_TEXT

    def frame(op, fin, payload):
        return bytes([(0x80 if fin else 0) | op, len(payload)]) + payload

    c = object.__new__(WSClient)
    c._closed = False
    c._rbuf = frame(OP_TEXT, False, b"part1") + frame(OP_TEXT, True, b"part2")
    c._sock = None
    with pytest.raises(ConnectionError, match="inside fragmented"):
        c.recv()
