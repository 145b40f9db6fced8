"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``crypto_clickhouse_poc_spark``; this module is a thin
adapter over its operator registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crypto_clickhouse_poc_spark import operators


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 1-minute OHLCV bars.

    The reference's headline endpoint (/ohlcv, api/server.py:57-84 in the
    reference tree) re-expressed as a Catalyst plan.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from crypto_clickhouse_poc_spark.operators.trades import ev_ohlcv_1m

    return ev_ohlcv_1m(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return operators.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    return operators.all_oracles()
