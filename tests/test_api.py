"""Endpoint-function tests over the real trades schema: golden values on a
hand-built fixture (SURVEY §5.2), including the reference's edge cases —
NULL VWAP when one side is empty, sumIf-empty = 0, LIMIT caps, anchor
windowing."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark import api

ANCHOR = datetime(2024, 1, 1, 1, 0, 0)


def _utc(s: str) -> datetime:
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


def _trades(spark):
    rows = [
        # minute 00:58 — BTC: two buys (maker=0), one sell
        ("BTCUSDT", 1, 100.0, 2.0, _utc("2024-01-01 00:58:01"), 0),
        ("BTCUSDT", 2, 102.0, 1.0, _utc("2024-01-01 00:58:05"), 0),
        ("BTCUSDT", 3, 101.0, 4.0, _utc("2024-01-01 00:58:30"), 1),
        # minute 00:59 — BTC: buys only (sell side EMPTY → sell_vwap NULL)
        ("BTCUSDT", 4, 105.0, 1.0, _utc("2024-01-01 00:59:10"), 0),
        ("BTCUSDT", 5, 95.0, 3.0, _utc("2024-01-01 00:59:10"), 0),  # same ts, tid breaks tie
        # ETH trades in window
        ("ETHUSDT", 6, 10.0, 50.0, _utc("2024-01-01 00:59:00"), 1),
        # outside the 60-minute lookback — must be excluded
        ("BTCUSDT", 7, 1.0, 999.0, _utc("2023-12-31 23:00:00"), 0),
    ]
    return spark.createDataFrame(
        [(s, t, p, q, ts, m, ts) for (s, t, p, q, ts, m) in rows],
        "symbol string, trade_id long, price double, qty double, ts timestamp,"
        " is_buyer_maker int, ingested_at timestamp",
    )


def test_ohlcv_bars_and_tie_break(spark):
    out = {r["minute"].minute: r for r in api.ohlcv(_trades(spark), "BTCUSDT", 60, ANCHOR).collect()}
    assert set(out) == {58, 59}
    b58 = out[58]
    assert (b58["open"], b58["high"], b58["low"], b58["close"]) == (100.0, 102.0, 100.0, 101.0)
    assert (b58["volume"], b58["trades"]) == (7.0, 3)
    # equal-ts open/close resolved by trade_id: open=tid4, close=tid5
    b59 = out[59]
    assert (b59["open"], b59["close"]) == (105.0, 95.0)


def test_top_symbols_ordering_and_limit(spark):
    out = api.top_symbols(_trades(spark), minutes=60, limit=1, anchor=ANCHOR).collect()
    assert len(out) == 1
    assert out[0]["symbol"] == "ETHUSDT" and out[0]["volume"] == 50.0


def test_live_trades_latest_first_and_window(spark):
    out = api.live_trades(_trades(spark), "BTCUSDT", window_sec=3600, limit=3, anchor=ANCHOR)
    rows = out.collect()
    assert len(rows) == 3
    assert rows[0]["ts"] >= rows[1]["ts"] >= rows[2]["ts"]
    # the 2023 row is outside the window even with a large limit
    allr = api.live_trades(_trades(spark), "BTCUSDT", 3600, 500, ANCHOR).collect()
    assert all(r["ts"].year == 2024 for r in allr)


def test_hist_buy_sell_null_vwap_and_sumif_zero(spark):
    out = {
        r["minute"].minute: r
        for r in api.hist_buy_sell(_trades(spark), "BTCUSDT", 60, ANCHOR).collect()
    }
    # minute 59: no sells → sell_volume 0 (sumIf parity), avg_sell_price NULL
    assert out[59]["sell_volume"] == 0.0
    assert out[59]["avg_sell_price"] is None
    assert out[59]["buy_volume"] == 4.0
    assert abs(out[59]["avg_buy_price"] - (105.0 * 1 + 95.0 * 3) / 4.0) < 1e-12
    # minute 58: both sides present
    assert out[58]["avg_sell_price"] == 101.0


def test_ohlcv_over_partitioned_table_prunes(spark, tmp_path):
    """The production read path end-to-end: month-partitioned sorted write →
    month_pruned read → /ohlcv — partition filters reach the scan and the
    bars match the in-memory computation."""
    from crypto_clickhouse_poc_spark.plans import layout

    path = str(tmp_path / "trades")
    df = _trades(spark)
    layout.write_table(df, path)
    stored = layout.read_table(spark, path)
    lo = _utc("2024-01-01 00:00:00")
    pruned = layout.month_pruned(stored, lo)
    out = api.ohlcv(pruned, "BTCUSDT", 60, ANCHOR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert plan.split("PartitionFilters")[1].split("]")[0].count("p_month") >= 1
    got = {r["minute"].minute: (r["open"], r["close"]) for r in out.collect()}
    want = {
        r["minute"].minute: (r["open"], r["close"])
        for r in api.ohlcv(df, "BTCUSDT", 60, ANCHOR).collect()
    }
    assert got == want and set(got) == {58, 59}


def test_empty_results_are_graceful(spark):
    """Unknown symbol / empty window: every endpoint returns an empty frame
    with the full schema, never an error."""
    t = _trades(spark)
    assert api.ohlcv(t, "NOPE", 60, ANCHOR).count() == 0
    assert api.live_trades(t, "NOPE", 60, 500, ANCHOR).count() == 0
    assert api.hist_buy_sell(t, "NOPE", 60, ANCHOR).count() == 0
    assert api.ohlcv(t, "BTCUSDT", 60, ANCHOR).columns == [
        "minute", "open", "high", "low", "close", "volume", "trades"
    ]


def test_ohlcv_hybrid_mv_fast_path_is_exact(spark):
    """MV-serving fast path (survey X5): history minutes merged from the
    partial-bars MV, window edges from raw — bit-identical to the full raw
    re-aggregation, including a mid-minute window start and a late trade that
    lands as a second partial for an already-flushed minute."""
    from crypto_clickhouse_poc_spark.streaming import bars

    rows = [
        # minute 00:00 — window starts MID-minute (anchor-60m = 00:00:30):
        # tid 1 falls before the window, tid 2 inside → raw-edge minute
        ("BTCUSDT", 1, 90.0, 1.0, _utc("2024-01-01 00:00:10"), 0),
        ("BTCUSDT", 2, 91.0, 2.0, _utc("2024-01-01 00:00:40"), 0),
        # MV-served history minutes
        ("BTCUSDT", 3, 100.0, 2.0, _utc("2024-01-01 00:05:01"), 0),
        ("BTCUSDT", 4, 102.0, 1.0, _utc("2024-01-01 00:05:05"), 1),
        ("BTCUSDT", 5, 101.0, 4.0, _utc("2024-01-01 00:20:30"), 0),
        ("BTCUSDT", 6, 99.0, 1.5, _utc("2024-01-01 00:39:59"), 1),
        # fresh tail (>= finalized_until 00:40) — raw-served
        ("BTCUSDT", 7, 104.0, 1.0, _utc("2024-01-01 00:40:00"), 0),
        ("BTCUSDT", 8, 103.0, 2.0, _utc("2024-01-01 00:59:30"), 1),
        # other symbol must not leak in
        ("ETHUSDT", 9, 10.0, 50.0, _utc("2024-01-01 00:20:00"), 1),
    ]
    trades = spark.createDataFrame(
        [(s, t, p, q, ts, m, ts) for (s, t, p, q, ts, m) in rows],
        "symbol string, trade_id long, price double, qty double, ts timestamp,"
        " is_buyer_maker int, ingested_at timestamp",
    )
    # three flushes; tid 6 (minute 00:39) arrives LATE, after tid 5's minute
    # 00:20 already flushed — it becomes a second partial batch, and minute
    # 00:05 is itself split across two flushes
    batches = [[1, 2, 3], [4, 5, 7], [6, 8, 9]]
    partials = None
    for tids in batches:
        p = bars.partial_bars(trades.where(F.col("trade_id").isin(tids)))
        partials = p if partials is None else partials.unionAll(p)

    anchor = _utc("2024-01-01 01:00:30")
    got = api.ohlcv_hybrid(
        trades, partials, "BTCUSDT", 60, anchor,
        finalized_until=_utc("2024-01-01 00:40:00"),
    ).collect()
    want = api.ohlcv(trades, "BTCUSDT", 60, anchor).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # the raw-edge minute really excludes the pre-window trade
    m0 = got[0]
    assert m0["minute"].minute == 0 and (m0["open"], m0["trades"]) == (91.0, 1)
    # a minute split across flushes merged exactly (00:05: open tid3, close tid4)
    m5 = {r["minute"].minute: r for r in got}[5]
    assert (m5["open"], m5["close"], m5["volume"]) == (100.0, 102.0, 3.0)


def test_ohlcv_hybrid_non_aligned_cutoff_is_exact(spark):
    """A NON-minute-aligned ``finalized_until`` (00:40:30) must not double-
    count the cutoff minute: 00:40's pre-cutoff trade is in partials AND its
    post-cutoff trade is in raw, so the cutoff must be truncated to 00:40 —
    the whole minute served from raw — for hybrid == plain ohlcv."""
    from crypto_clickhouse_poc_spark.streaming import bars

    rows = [
        # MV-served history
        ("BTCUSDT", 1, 100.0, 2.0, _utc("2024-01-01 00:05:01"), 0),
        ("BTCUSDT", 2, 101.0, 4.0, _utc("2024-01-01 00:20:30"), 0),
        # the cutoff minute 00:40 straddles finalized_until = 00:40:30:
        # tid 3 flushed into partials (ts < cutoff), tid 4 after the cutoff
        ("BTCUSDT", 3, 99.0, 1.5, _utc("2024-01-01 00:40:10"), 1),
        ("BTCUSDT", 4, 104.0, 1.0, _utc("2024-01-01 00:40:45"), 0),
        # fresh tail
        ("BTCUSDT", 5, 103.0, 2.0, _utc("2024-01-01 00:59:30"), 1),
    ]
    trades = spark.createDataFrame(
        [(s, t, p, q, ts, m, ts) for (s, t, p, q, ts, m) in rows],
        "symbol string, trade_id long, price double, qty double, ts timestamp,"
        " is_buyer_maker int, ingested_at timestamp",
    )
    # everything with ts < 00:40:30 has been flushed — the legal state the
    # docstring contract names
    partials = bars.partial_bars(trades.where(F.col("trade_id").isin([1, 2])))
    partials = partials.unionAll(
        bars.partial_bars(trades.where(F.col("trade_id") == 3))
    )
    anchor = _utc("2024-01-01 01:00:00")
    got = api.ohlcv_hybrid(
        trades, partials, "BTCUSDT", 60, anchor,
        finalized_until=_utc("2024-01-01 00:40:30"),
    ).collect()
    want = api.ohlcv(trades, "BTCUSDT", 60, anchor).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # one row for the cutoff minute, with BOTH its trades counted once
    by_min = {r["minute"].minute: r for r in got}
    assert len(got) == len(by_min)  # no duplicated minute rows
    m40 = by_min[40]
    assert (m40["open"], m40["close"], m40["trades"], m40["volume"]) == (
        99.0, 104.0, 2, 2.5,
    )


def test_ohlcv_hybrid_without_cutoff_is_plain_ohlcv(spark):
    t = _trades(spark)
    got = api.ohlcv_hybrid(t, None, "BTCUSDT", 60, ANCHOR).collect()
    want = api.ohlcv(t, "BTCUSDT", 60, ANCHOR).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_live_buy_sell_total_vol_ordering(spark):
    out = api.live_buy_sell(_trades(spark), minutes=60, top=2, anchor=ANCHOR).collect()
    # ordered by the lateral alias total_vol, which is projected away
    # (reference contract, api/server.py:156-168)
    assert [r["symbol"] for r in out] == ["ETHUSDT", "BTCUSDT"]
    btc = out[1]
    assert btc["buy_volume"] + btc["sell_volume"] == 11.0
    assert "total_vol" not in out[0].asDict()
    assert abs(btc["trades_per_min"] - 5 / 60.0) < 1e-12
