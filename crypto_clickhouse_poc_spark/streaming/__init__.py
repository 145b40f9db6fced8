"""Structured Streaming: ingest pipeline, incremental OHLCV bars, lifecycle."""

from . import bars, collector, ingest  # noqa: F401
