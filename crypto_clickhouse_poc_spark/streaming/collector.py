"""Collector lifecycle wrapper — start/stop/status over a streaming query.

Mirrors the reference's embeddable collector (``api/collector.py:28-66``):
state machine idle → starting → running → stopping (+error surfaced into
status), and the status payload shape its ``/collector/status`` endpoint
returns (``api/collector.py:30-42``): running flag, state, inserted rows,
last flush time, last error, config echo.

Spark mapping: the asyncio task becomes a StreamingQuery; inserted-row and
flush counters come from a StreamingQueryListener instead of hand-rolled
counters.
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.listener import StreamingQueryListener


class _ProgressListener(StreamingQueryListener):
    def __init__(self) -> None:
        self.inserted_rows = 0
        self.last_flush: Optional[str] = None
        self.last_error: Optional[str] = None
        #: id of the collector's own query — listeners are session-global,
        #: so progress from OTHER concurrent streams must be ignored
        self.query_id: Optional[str] = None
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        with self._lock:
            if self.query_id is None or str(p.id) != self.query_id:
                return
            self.inserted_rows += p.sink.numOutputRows if p.sink.numOutputRows > 0 else 0
            self.last_flush = p.timestamp

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        with self._lock:
            if event.exception:
                self.last_error = str(event.exception)


class Collector:
    """Start-stoppable ingest collector over any start_fn -> StreamingQuery."""

    def __init__(
        self,
        spark: SparkSession,
        start_fn: Callable[[], StreamingQuery],
        symbols: tuple[str, ...] = ("btcusdt", "ethusdt"),
        batch_size: int = 500,
        flush_every_sec: int = 5,
        table: str = "crypto.trades",
    ) -> None:
        self._spark = spark
        self._start_fn = start_fn
        self._query: Optional[StreamingQuery] = None
        self._listener = _ProgressListener()
        self._state = "idle"
        self.symbols = symbols
        self.batch_size = batch_size
        self.flush_every_sec = flush_every_sec
        self.table = table

    def start(self) -> None:
        if self._state == "running":
            raise RuntimeError("collector already running")
        self._state = "starting"
        self._spark.streams.addListener(self._listener)
        try:
            self._query = self._start_fn()
            self._listener.query_id = str(self._query.id)
            self._state = "running"
        except Exception as exc:
            # never leak a session-global listener from a failed start
            self._spark.streams.removeListener(self._listener)
            self._listener.last_error = str(exc)
            self._state = "idle"
            raise

    def stop(self) -> None:
        if self._query is None:
            return
        self._state = "stopping"
        try:
            self._query.stop()
            self._query.awaitTermination(30)
        finally:
            self._spark.streams.removeListener(self._listener)
            self._query = None
            self._state = "idle"

    def process_available(self) -> None:
        """Test helper: block until everything currently available is ingested."""
        if self._query is not None:
            self._query.processAllAvailable()

    @property
    def status(self) -> dict:
        """Status payload (shape of api/collector.py:30-42)."""
        q = self._query
        return {
            "running": self._state == "running" and q is not None and q.isActive,
            "state": self._state,
            "inserted_rows": self._listener.inserted_rows,
            "last_flush": self._listener.last_flush,
            "last_error": self._listener.last_error
            or (str(q.exception()) if q is not None and q.exception() else None),
            "symbols": list(self.symbols),
            "batch_size": self.batch_size,
            "flush_every_sec": self.flush_every_sec,
            "table": self.table,
        }
