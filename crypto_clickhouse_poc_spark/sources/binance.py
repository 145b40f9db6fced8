"""Binance WebSocket streaming source — PySpark DataSource API (Spark 4).

The live-mode equivalent of the reference collector's socket loop
(``src/stream_binance.py:87-115``): subscribes to the combined stream
``wss://stream.binance.com:9443/stream?streams=btcusdt@trade/...`` and
yields raw envelope JSON as a ``value string`` column, which
``streaming.ingest.normalize`` decodes — the source is deliberately dumb so
the typed decode stays in the Catalyst plan.

Modes:
- ``synthetic=true`` (default here): deterministic generated trade events —
  lets the full readStream → normalize → sink pipeline run (and be tested)
  with no network. Offsets are exact event counters → replayable batches.
- live: runs on the stdlib RFC 6455 client (``sources.ws`` — zero
  third-party dependencies, so the live path is exercisable here: a local
  stdlib WS server in ``tests/test_ws.py`` feeds it hermetically; the
  ``url`` option points it anywhere, default the Binance combined
  stream). A background thread drains the socket into a bounded buffer;
  reads are at-least-once (buffer loss on crash ≙ the reference's
  behavior) and the downstream ``dropDuplicatesWithinWatermark`` absorbs
  replays — same recovery story, stronger guarantees at the sink
  (checkpointed exactly-once).

Register + use::

    spark.dataSource.register(BinanceTradesDataSource)
    raw = (spark.readStream.format("binance_trades")
           .option("symbols", "btcusdt,ethusdt").option("synthetic", "true")
           .option("rate", "100").load())
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

DEFAULT_SYMBOLS = "btcusdt,ethusdt"  # reference SYMBOLS default
BASE_EPOCH_MS = 1704067200000  # 2024-01-01T00:00:00Z — synthetic time origin


def combined_stream_url(symbols: list[str]) -> str:
    """Combined-stream URL (shape of src/stream_binance.py:34-42)."""
    streams = "/".join(f"{s.lower()}@trade" for s in symbols)
    return f"wss://stream.binance.com:9443/stream?streams={streams}"


def synthetic_event(i: int, symbols: list[str]) -> str:
    """Deterministic Binance-style trade envelope #i (no RNG — replayable)."""
    sym = symbols[i % len(symbols)].upper()
    price = 100.0 + (i % 1000) * 0.01
    qty = 0.001 + (i % 10) * 0.0001
    ev = {
        "stream": f"{sym.lower()}@trade",
        "data": {
            "s": sym,
            "t": i,
            "p": f"{price:.8f}",
            "q": f"{qty:.8f}",
            "T": BASE_EPOCH_MS + i * 250,
            "m": i % 2 == 0,
        },
    }
    return json.dumps(ev)


class BinanceTradesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "binance_trades"

    def schema(self) -> str:
        return "value string"

    def simpleStreamReader(self, schema):  # noqa: N802 (API name)
        if self.options.get("synthetic", "true").lower() == "true":
            return SyntheticTradesReader(self.options)
        return LiveTradesReader(self.options)


class SyntheticTradesReader(SimpleDataSourceStreamReader):
    """Counter-offset reader over the deterministic generator."""

    def __init__(self, options) -> None:
        self.symbols = options.get("symbols", DEFAULT_SYMBOLS).split(",")
        self.rate = int(options.get("rate", "100"))
        self.limit = int(options.get("limit", "0"))  # 0 = unbounded

    def initialOffset(self) -> dict:  # noqa: N802
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = lo + self.rate
        if self.limit:
            hi = min(hi, self.limit)
        return iter([(synthetic_event(i, self.symbols),) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        return iter([(synthetic_event(i, self.symbols),) for i in range(start["i"], end["i"])])


class LiveTradesReader(SimpleDataSourceStreamReader):
    """Live WebSocket reader over the stdlib RFC 6455 client (sources.ws).

    A daemon thread pumps messages into a bounded deque (drop-oldest on
    overflow — a slow consumer must never grow driver memory unboundedly;
    the reference's buffer has the same at-most-once character). ``read``
    drains whatever arrived since the last batch. On server close or
    socket error the pump RECONNECTS (the reference collector's loop;
    trades missed while disconnected are simply missed — at-least-once —
    and trades the exchange replays on reconnect are absorbed by the
    downstream ``dropDuplicatesWithinWatermark``). ``max_retries`` bounds
    consecutive failed connects (default 5; each retry backs off 1 s);
    any successful connection resets the count. The ``url`` option
    overrides the Binance combined-stream URL, which is what lets a local
    test server drive this exact code path — including the reconnect —
    with no network.
    """

    BUFFER_CAP = 100_000

    def __init__(self, options) -> None:
        self.symbols = options.get("symbols", DEFAULT_SYMBOLS).split(",")
        self.url = options.get("url") or combined_stream_url(self.symbols)
        self.max_retries = int(options.get("max_retries", "5"))
        import collections

        self._buffer: "collections.deque[str]" = collections.deque(
            maxlen=self.BUFFER_CAP
        )
        self._seq = 0
        self._thread = None
        self._error: Exception | None = None

    def _ensure_started(self) -> None:
        if self._thread is not None:
            return
        import threading
        import time

        from .ws import WSClient

        def pump() -> None:
            failures = 0
            while True:
                try:
                    client = WSClient(self.url)
                except Exception as exc:
                    failures += 1
                    if failures > self.max_retries:
                        self._error = exc  # surfaced once the buffer drains
                        return
                    time.sleep(1.0)
                    continue
                got_any = False
                try:
                    while True:
                        msg = client.recv()
                        if msg is None:  # clean server close → reconnect
                            break
                        if isinstance(msg, str):
                            got_any = True
                            self._buffer.append(msg)
                except Exception:
                    pass  # socket error → reconnect
                finally:
                    client.close()
                # a handshake that delivers nothing before closing counts as
                # a failure — otherwise an accept-then-close server would be
                # hammered in a sleepless loop and max_retries never fires
                if got_any:
                    failures = 0
                else:
                    failures += 1
                    if failures > self.max_retries:
                        self._error = ConnectionError(
                            f"websocket at {self.url} closed without data "
                            f"{failures} consecutive times"
                        )
                        return
                time.sleep(0.5)  # always back off between sessions

        self._thread = threading.Thread(target=pump, daemon=True)
        self._thread.start()

    def initialOffset(self) -> dict:  # noqa: N802
        return {"seq": 0}

    def read(self, start: dict):
        self._ensure_started()
        # seed from the engine-supplied offset: after a checkpoint restart a
        # fresh reader instance starts at _seq=0, and counting from there
        # would regress offsets below the checkpointed seq (offsets must be
        # unique and monotone even though the live data itself is
        # at-least-once).
        self._seq = max(self._seq, int(start.get("seq", 0)))
        drained = []
        while self._buffer:
            drained.append(self._buffer.popleft())
        # deliver everything already received BEFORE surfacing a pump
        # error — successfully buffered messages must not be dropped
        if not drained and self._error is not None:
            raise self._error
        self._seq += len(drained)
        return iter([(m,) for m in drained]), {"seq": self._seq}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        # at-least-once: a crashed batch cannot be reconstructed from a live
        # socket; downstream dedup handles replay (reference parity, S7).
        return iter([])
