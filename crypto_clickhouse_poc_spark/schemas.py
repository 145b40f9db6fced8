"""Explicit schemas (schema-on-write, like the reference's DDL-first model).

Reference: ``sql/V1__create_trades_table.sql:3-16`` (trades),
``sql/V2__create_trades_1m_view.sql:1-14`` (1-minute bars),
``src/migrate.py:49-59`` (migration registry),
``src/stream_binance.py:98-110`` (Binance combined-stream event shape).
"""

from __future__ import annotations

from pyspark.sql import types as Ty

#: crypto.trades — the fact table. UInt8 is_buyer_maker kept as 0/1 int so the
#: reference's `is_buyer_maker = 0` predicates work unchanged (survey §1.3).
TRADES = Ty.StructType(
    [
        Ty.StructField("symbol", Ty.StringType(), False),
        Ty.StructField("trade_id", Ty.LongType(), False),
        Ty.StructField("price", Ty.DoubleType(), False),
        Ty.StructField("qty", Ty.DoubleType(), False),
        Ty.StructField("ts", Ty.TimestampType(), False),
        Ty.StructField("is_buyer_maker", Ty.IntegerType(), False),
        Ty.StructField("ingested_at", Ty.TimestampType(), False),
    ]
)

#: crypto.trades_1m — derived OHLCV bars.
TRADES_1M = Ty.StructType(
    [
        Ty.StructField("minute", Ty.TimestampType(), False),
        Ty.StructField("symbol", Ty.StringType(), False),
        Ty.StructField("open", Ty.DoubleType(), True),
        Ty.StructField("high", Ty.DoubleType(), True),
        Ty.StructField("low", Ty.DoubleType(), True),
        Ty.StructField("close", Ty.DoubleType(), True),
        Ty.StructField("volume", Ty.DoubleType(), True),
        Ty.StructField("trades", Ty.LongType(), True),
    ]
)

#: Binance combined-stream envelope: {"stream": "...", "data": {...}}.
#: p/q are decimal-as-string exactly as Binance sends them (FIXTURES.md A3).
#: The trade-time key ``T`` is deliberately absent: the payload's ``t`` /
#: ``T`` pair cannot coexist in one struct under Spark's case-insensitive
#: column resolution, so ingest.normalize parses ``T`` with its own
#: one-field schema (JSON key matching is case-sensitive, resolution isn't).
TRADE_EVENT = Ty.StructType(
    [
        Ty.StructField("stream", Ty.StringType(), True),
        Ty.StructField(
            "data",
            Ty.StructType(
                [
                    Ty.StructField("s", Ty.StringType(), True),
                    Ty.StructField("t", Ty.LongType(), True),
                    Ty.StructField("p", Ty.StringType(), True),
                    Ty.StructField("q", Ty.StringType(), True),
                    Ty.StructField("m", Ty.BooleanType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: crypto._migrations registry (src/migrate.py:49-59).
MIGRATIONS = Ty.StructType(
    [
        Ty.StructField("version", Ty.IntegerType(), False),
        Ty.StructField("filename", Ty.StringType(), False),
        Ty.StructField("checksum", Ty.StringType(), False),
        Ty.StructField("applied_at", Ty.TimestampType(), False),
    ]
)
