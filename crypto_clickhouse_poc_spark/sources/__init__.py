"""Streaming sources: deterministic file replay (tests) + Binance WS DataSource."""

from . import replay  # noqa: F401
