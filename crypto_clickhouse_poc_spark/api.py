"""The reference's five read endpoints as parameterized query functions.

Each function mirrors one FastAPI handler in the reference
(``api/server.py:57-200``) with the same parameters, result columns, and
semantics — over the engine's real ``trades`` table (schema §1.5: symbol,
trade_id, price, qty, ts, is_buyer_maker, ingested_at) — so a user of the
reference can call the same queries with the same arguments. A serving
shell (FastAPI or otherwise) is a trivial wrapper: call, ``collect()``,
ISO-format timestamps (reference F9).

Exact-parity details honored (survey §2.4):
- ``sumIf`` over an empty match-set is 0, not NULL → ``when/otherwise(0)``.
- per-side VWAP is NULL when that side has no volume → ``nullif`` guard.
- open/close are deterministic argmin/argmax by (ts, trade_id) — the
  reference's ``argMin``/``anyLast`` intent with the tie broken.
- ``now()`` is an explicit ``anchor`` parameter (statement-time constant,
  reference F2); pass None for wall-clock.

Every query filters on ts first, so with the production layout
(``plans.layout``: month partitions + sort-on-write) the scan prunes
partitions and row groups before any other work.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _anchored(trades: DataFrame, anchor: datetime | None, amount: str) -> DataFrame:
    base = F.lit(anchor) if anchor is not None else F.current_timestamp()
    return trades.where(F.col("ts") >= base - F.expr(f"INTERVAL {amount}"))


def _tid_key() -> Column:
    return F.struct("ts", "trade_id")


def ohlcv(
    trades: DataFrame, symbol: str, minutes: int = 60, anchor: datetime | None = None
) -> DataFrame:
    """/ohlcv — 1-minute OHLCV bars for one symbol (api/server.py:57-84)."""
    return (
        _anchored(trades.where(F.col("symbol") == symbol), anchor, f"{minutes} MINUTES")
        .groupBy(F.date_trunc("minute", F.col("ts")).alias("minute"))
        .agg(
            F.min_by("price", _tid_key()).alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.max_by("price", _tid_key()).alias("close"),
            F.sum("qty").alias("volume"),
            F.count("*").alias("trades"),
        )
        .orderBy("minute")
    )


def top_symbols(
    trades: DataFrame, minutes: int = 10, limit: int = 10, anchor: datetime | None = None
) -> DataFrame:
    """/top_symbols — volume leaders over a lookback (api/server.py:87-105)."""
    return (
        _anchored(trades, anchor, f"{minutes} MINUTES")
        .groupBy("symbol")
        .agg(F.sum("qty").alias("volume"), F.count("*").alias("trades"))
        .orderBy(F.col("volume").desc())
        .limit(limit)
    )


def live_trades(
    trades: DataFrame,
    symbol: str,
    window_sec: int = 60,
    limit: int = 500,
    anchor: datetime | None = None,
) -> DataFrame:
    """/live_trades — latest-N raw trades (api/server.py:108-132)."""
    return (
        _anchored(trades.where(F.col("symbol") == symbol), anchor, f"{window_sec} SECONDS")
        .select("ts", "symbol", "price", "qty", "is_buyer_maker")
        .orderBy(F.col("ts").desc(), F.col("trade_id").desc())
        .limit(limit)
    )


def _side_aggs() -> list[Column]:
    buy = F.col("is_buyer_maker") == 0  # taker buy (reference api/server.py:146)
    sell = F.col("is_buyer_maker") == 1
    buy_qty = F.when(buy, F.col("qty")).otherwise(F.lit(0.0))
    sell_qty = F.when(sell, F.col("qty")).otherwise(F.lit(0.0))
    buy_pq = F.when(buy, F.col("price") * F.col("qty")).otherwise(F.lit(0.0))
    sell_pq = F.when(sell, F.col("price") * F.col("qty")).otherwise(F.lit(0.0))
    return [
        F.sum(buy_qty).alias("buy_volume"),
        F.sum(sell_qty).alias("sell_volume"),
        # reference column names: avg_buy_price / avg_sell_price
        # (api/server.py:148-149,186-187) — they ARE per-side VWAPs, but the
        # REST contract exposes them under these names
        (F.sum(buy_pq) / F.nullif(F.sum(buy_qty), F.lit(0.0))).alias("avg_buy_price"),
        (F.sum(sell_pq) / F.nullif(F.sum(sell_qty), F.lit(0.0))).alias("avg_sell_price"),
    ]


def live_buy_sell(
    trades: DataFrame, minutes: int = 10, top: int = 5, anchor: datetime | None = None
) -> DataFrame:
    """/live_buy_sell — per-symbol side split + rate, top by total volume
    (api/server.py:135-169; the CTE + lateral-alias query). The lateral
    alias ``total_vol`` orders the result but is projected away, and the
    defaults are the reference's (minutes=10, top=5)."""
    agg = (
        _anchored(trades, anchor, f"{minutes} MINUTES")
        .groupBy("symbol")
        .agg(*_side_aggs(), (F.count("*") / F.lit(float(minutes))).alias("trades_per_min"))
    )
    return (
        agg.withColumn("total_vol", F.col("buy_volume") + F.col("sell_volume"))
        .orderBy(F.col("total_vol").desc())
        .limit(top)
        .select(
            "symbol",
            "buy_volume",
            "sell_volume",
            "avg_buy_price",
            "avg_sell_price",
            "trades_per_min",
        )
    )


def ohlcv_hybrid(
    trades: DataFrame,
    partials: DataFrame,
    symbol: str,
    minutes: int = 60,
    anchor: datetime | None = None,
    finalized_until: datetime | None = None,
) -> DataFrame:
    """/ohlcv fast path: serve history from the partial-bars MV, only the
    fresh tail from raw trades (ClickHouse's MV-serving pattern, survey X5).

    Minutes in ``[next_full_minute(anchor - minutes), finalized_until)`` are
    answered by merging the append-only partial bars
    (``streaming.bars.partial_bars`` rows — decomposable OHLCV partials), so
    the raw scan is restricted to the window edges: the possibly partial
    first minute and everything in or after the cutoff minute. The cutoff is
    truncated to its minute boundary first — a bar is a whole-minute object,
    so a mid-minute ``finalized_until`` (12:05:30) can finalize only minutes
    strictly BEFORE 12:05; minute 12:05 itself must come entirely from raw,
    else its pre-cutoff trades would be served from partials AND its
    post-cutoff trades re-enter via the raw leg — a duplicated, double-
    counted minute row. Matches ``ohlcv`` whenever every trade with
    ``ts < date_trunc('minute', finalized_until)`` has been flushed into
    ``partials`` — any cutoff at least one trigger interval behind the
    collector guarantees that; pass ``finalized_until=None`` to skip the MV
    entirely (plain raw re-aggregation). Open/high/low/close/trades are
    bit-exact (min/max/count are order-insensitive; open/close key on
    (ts, trade_id)); ``volume`` agrees to float round-off only — the partial
    merge sums doubles in a different order, and IEEE addition is not
    associative (the identical property of ClickHouse's partial-aggregate MV
    merge, or of Spark's own per-partition partial sums under a different
    partitioning).

    At 100 TB the partials table is O(minutes × symbols × flushes) — orders
    of magnitude below raw trades — and the raw scan prunes to the last few
    minutes via the ts-sorted layout, so serving cost no longer grows with
    history length.
    """
    from .streaming.bars import reaggregate_bars

    if finalized_until is None:
        return ohlcv(trades, symbol, minutes, anchor)

    lo_expr = (F.lit(anchor) if anchor is not None else F.current_timestamp()) - F.expr(
        f"INTERVAL {minutes} MINUTES"
    )
    # first *full* minute inside the window: trunc(lo) if lo is on a minute
    # boundary, else trunc(lo) + 1 — the minute containing a mid-minute ``lo``
    # must come from raw (its MV bar would include trades before ``lo``)
    lo_min = F.date_trunc("minute", lo_expr)
    full_lo = F.when(lo_min == lo_expr, lo_min).otherwise(
        lo_min + F.expr("INTERVAL 1 MINUTE")
    )
    # truncate, don't trust: only whole minutes are finalizable (see above)
    fin = F.date_trunc("minute", F.lit(finalized_until))

    fast = reaggregate_bars(
        partials.where(
            (F.col("symbol") == symbol)
            & (F.col("minute") >= full_lo)
            & (F.col("minute") < fin)
        )
    ).select("minute", "open", "high", "low", "close", "volume", "trades")

    raw = (
        trades.where(F.col("symbol") == symbol)
        .where(F.col("ts") >= lo_expr)
        .where((F.col("ts") < full_lo) | (F.col("ts") >= fin))
        .groupBy(F.date_trunc("minute", F.col("ts")).alias("minute"))
        .agg(
            F.min_by("price", _tid_key()).alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.max_by("price", _tid_key()).alias("close"),
            F.sum("qty").alias("volume"),
            F.count("*").alias("trades"),
        )
    )
    return fast.unionAll(raw).orderBy("minute")


def hist_buy_sell(
    trades: DataFrame, symbol: str, minutes: int = 60, anchor: datetime | None = None
) -> DataFrame:
    """/hist_buy_sell — per-minute side split for one symbol
    (api/server.py:172-200)."""
    return (
        _anchored(trades.where(F.col("symbol") == symbol), anchor, f"{minutes} MINUTES")
        .groupBy(F.date_trunc("minute", F.col("ts")).alias("minute"))
        .agg(*_side_aggs(), F.count("*").alias("trades"))
        .orderBy("minute")
    )
