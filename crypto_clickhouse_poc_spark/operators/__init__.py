"""Operator registry.

Each operator module exposes two dicts:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` — named
  query functions (the engine's public query surface),
- ``ORACLES: dict[str, str]`` — for each SQL-expressible query, equivalent
  ANSI SQL runnable by DuckDB on the same parquet tables. Queries with no
  oracle entry get the driver's weaker rows-only check (documented per query).

``all_queries()`` / ``all_oracles()`` merge every module for
``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    dedup,
    multimodal,
    quality,
    similarity,
    sqlapi,
    streaming_q,
    temporal,
    text,
    tpch,
    trades,
)

_MODULES = (
    trades,
    tpch,
    text,
    dedup,
    similarity,
    multimodal,
    temporal,
    streaming_q,
    sqlapi,
    quality,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names {overlap} in {mod.__name__}")
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
