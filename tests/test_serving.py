"""End-to-end HTTP surface test: every reference route served over Spark,
JSON shape and values checked through a real socket."""

from __future__ import annotations

import json
import urllib.request
from datetime import datetime, timezone

import pytest

from crypto_clickhouse_poc_spark.serving import AnalyticsServer

ANCHOR = datetime(2024, 1, 1, 1, 0, 0)


def _utc(s: str) -> datetime:
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


@pytest.fixture()
def server(spark):
    rows = [
        ("BTCUSDT", 1, 100.0, 2.0, _utc("2024-01-01 00:58:01"), 0),
        ("BTCUSDT", 2, 102.0, 1.0, _utc("2024-01-01 00:58:05"), 0),
        ("BTCUSDT", 3, 101.0, 4.0, _utc("2024-01-01 00:58:30"), 1),
        ("ETHUSDT", 6, 10.0, 50.0, _utc("2024-01-01 00:59:00"), 1),
    ]
    trades = spark.createDataFrame(
        [(s, t, p, q, ts, m, ts) for (s, t, p, q, ts, m) in rows],
        "symbol string, trade_id long, price double, qty double, ts timestamp,"
        " is_buyer_maker int, ingested_at timestamp",
    )
    srv = AnalyticsServer(lambda: trades, anchor=ANCHOR)
    srv.start()
    yield srv
    srv.stop()


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}", timeout=60) as r:
        return r.status, json.loads(r.read())


def test_dashboard_served_at_root(server):
    """GET / returns the bundled dashboard shell (reference web/index.html
    analog) as HTML; its JS drives the same five endpoints."""
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/", timeout=60
    ) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/html")
        body = r.read().decode()
    assert "crypto-spark analytics" in body
    for route in ("/ohlcv", "/top_symbols", "/live_buy_sell", "/hist_buy_sell",
                  "/live_trades", "/collector/status"):
        assert route in body, route


def test_ohlcv_route(server):
    status, body = _get(server, "/ohlcv?symbol=BTCUSDT&minutes=60")
    assert status == 200
    assert len(body) == 1
    bar = body[0]
    assert bar["minute"] == "2024-01-01T00:58:00"  # ISO-formatted (F9)
    assert (bar["open"], bar["high"], bar["low"], bar["close"]) == (100.0, 102.0, 100.0, 101.0)
    assert bar["trades"] == 3


def test_top_symbols_route(server):
    status, body = _get(server, "/top_symbols?minutes=60&limit=2")
    assert status == 200
    assert [b["symbol"] for b in body] == ["ETHUSDT", "BTCUSDT"]


def test_live_trades_route_and_unknown(server):
    status, body = _get(server, "/live_trades?symbol=BTCUSDT&window_sec=3600&limit=2")
    assert status == 200 and len(body) == 2
    assert body[0]["ts"] >= body[1]["ts"]
    try:
        urllib.request.urlopen(f"http://127.0.0.1:{server.port}/nope", timeout=60)
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_collector_control_routes(spark, tmp_path):
    """POST /collector/start|stop and GET /collector/status drive a real
    replay-fed ingest stream; double start surfaces as 409 (reference
    api/server.py:43-44)."""
    from crypto_clickhouse_poc_spark.sources.replay import (
        read_replay_stream,
        trades_to_event_lines,
        write_replay_chunks,
    )
    from crypto_clickhouse_poc_spark.streaming import ingest
    from crypto_clickhouse_poc_spark.streaming.collector import Collector

    rows = [
        {
            "symbol": "BTCUSDT",
            "trade_id": i,
            "price": 100.0 + i,
            "qty": 1.0,
            "ts": _utc(f"2024-01-01 00:00:{i:02d}"),
            "is_buyer_maker": False,
        }
        for i in range(10)
    ]
    replay_dir, dest, ckpt = (str(tmp_path / d) for d in ("replay", "trades", "ckpt"))
    write_replay_chunks(trades_to_event_lines(rows), replay_dir, num_chunks=2)
    col = Collector(
        spark,
        lambda: ingest.start_ingest(
            read_replay_stream(spark, replay_dir), dest, ckpt, trigger_sec=0
        ),
    )
    srv = AnalyticsServer(lambda: spark.read.parquet(dest), collector=col)
    srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/collector/start", method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert json.loads(r.read()) == {"started": True}
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected 409")
        except urllib.error.HTTPError as e:
            assert e.code == 409
        col.process_available()
        _, status = _get(srv, "/collector/status")
        assert status["running"] is True and status["state"] == "running"
        stop = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/collector/stop", method="POST"
        )
        with urllib.request.urlopen(stop, timeout=60) as r:
            assert json.loads(r.read()) == {"stopped": True}
        assert spark.read.parquet(dest).count() == 10
    finally:
        srv.stop()


def test_buy_sell_routes(server):
    status, body = _get(server, "/live_buy_sell?minutes=60&top=10")
    assert status == 200 and len(body) == 2
    status, body = _get(server, "/hist_buy_sell?symbol=BTCUSDT&minutes=60")
    assert status == 200 and len(body) == 1
    assert body[0]["buy_volume"] == 3.0 and body[0]["sell_volume"] == 4.0
