"""Structured Streaming: ingest pipeline, incremental OHLCV bars, lifecycle."""

from . import bars, cdfsink, collector, ingest  # noqa: F401
