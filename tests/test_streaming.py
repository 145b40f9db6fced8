"""Streaming semantics tests (SURVEY.md §5.3): replay a deterministic fixture
through the real ingest pipeline and assert
(a) normalize round-trip parity (stream result == batch input),
(b) duplicate replay absorbed (ReplacingMergeTree analog),
(c) bars partial-aggregate merge == batch recompute,
(d) collector lifecycle + status surface,
(e) synthetic Binance DataSource drives the same pipeline.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from crypto_clickhouse_poc_spark.sources.replay import (
    read_replay_stream,
    trades_to_event_lines,
    write_replay_chunks,
)
from crypto_clickhouse_poc_spark.streaming import bars, ingest
from crypto_clickhouse_poc_spark.streaming.collector import Collector


def _utc(s: str) -> datetime:
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


def _fixture_rows() -> list[dict]:
    """20 trades, 2 symbols, spanning 3 minutes, with intra-second ties."""
    rows = []
    for i in range(20):
        rows.append(
            {
                "symbol": "BTCUSDT" if i % 2 == 0 else "ETHUSDT",
                "trade_id": 1000 + i,
                "price": 100.0 + i * 0.25,
                "qty": 0.5 + (i % 4) * 0.125,
                "ts": _utc(f"2024-01-01 00:0{i // 8}:{(i * 7) % 60:02d}"),
                "is_buyer_maker": i % 3 == 0,
            }
        )
    return rows


def _collect_trades(spark, path):
    df = spark.read.parquet(path)
    return sorted(
        (r["symbol"], r["trade_id"], r["price"], r["qty"], r["ts"], r["is_buyer_maker"])
        for r in df.collect()
    )


def _expected(rows):
    return sorted(
        (
            r["symbol"],
            r["trade_id"],
            r["price"],
            r["qty"],
            r["ts"].replace(tzinfo=None),
            int(r["is_buyer_maker"]),
        )
        for r in rows
    )


def test_replay_ingest_round_trip(spark, tmp_path):
    rows = _fixture_rows()
    replay_dir, dest, ckpt = (str(tmp_path / d) for d in ("replay", "trades", "ckpt"))
    write_replay_chunks(trades_to_event_lines(rows), replay_dir, num_chunks=4)

    q = ingest.start_ingest(
        read_replay_stream(spark, replay_dir), dest, ckpt, trigger_sec=0
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert _collect_trades(spark, dest) == _expected(rows)
    # partition column written (monthly layout)
    assert (tmp_path / "trades" / "p_month=202401").exists()


def test_ingest_state_store_override(spark, tmp_path):
    """Per-workload state store (session.py): the bounded 10-minute dedup
    window can run on the in-memory provider; results are identical and the
    provider conf is applied at query start."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    rows = _fixture_rows()
    replay_dir, dest, ckpt = (str(tmp_path / d) for d in ("replay", "trades", "ckpt"))
    write_replay_chunks(trades_to_event_lines(rows), replay_dir, num_chunks=4)
    try:
        q = ingest.start_ingest(
            read_replay_stream(spark, replay_dir), dest, ckpt,
            trigger_sec=0, state_store="memory",
        )
        assert spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        ) == ingest.STATE_STORES["memory"]
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert _collect_trades(spark, dest) == _expected(rows)
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_replay_duplicates_absorbed(spark, tmp_path):
    """Reconnect replay: the same chunk delivered twice lands once."""
    rows = _fixture_rows()
    lines = trades_to_event_lines(rows)
    replay_dir, dest, ckpt = (str(tmp_path / d) for d in ("replay", "trades", "ckpt"))
    # duplicate the full stream (second delivery of every event)
    write_replay_chunks(lines + lines, replay_dir, num_chunks=6)

    q = ingest.start_ingest(
        read_replay_stream(spark, replay_dir), dest, ckpt, trigger_sec=0
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert _collect_trades(spark, dest) == _expected(rows)


def test_partial_bars_merge_equals_batch(spark):
    """The MV algebra: per-batch partials re-aggregated == one-shot batch."""
    rows = _fixture_rows()
    df = spark.createDataFrame(
        [
            (r["symbol"], r["trade_id"], r["price"], r["qty"], r["ts"], int(r["is_buyer_maker"]))
            for r in rows
        ],
        "symbol string, trade_id long, price double, qty double, ts timestamp, is_buyer_maker int",
    )
    # three "insert blocks" splitting minute groups across batches
    b1, b2, b3 = df.where("trade_id % 3 = 0"), df.where("trade_id % 3 = 1"), df.where(
        "trade_id % 3 = 2"
    )
    partials = bars.partial_bars(b1).unionAll(bars.partial_bars(b2)).unionAll(
        bars.partial_bars(b3)
    )
    merged = {
        (r["minute"], r["symbol"]): (r["open"], r["high"], r["low"], r["close"],
                                     round(r["volume"], 9), r["trades"])
        for r in bars.reaggregate_bars(partials).collect()
    }
    direct = {
        (r["minute"], r["symbol"]): (r["open"], r["high"], r["low"], r["close"],
                                     round(r["volume"], 9), r["trades"])
        for r in bars.bars_batch(df).collect()
    }
    assert merged == direct
    assert len(direct) == 6  # 3 minutes × 2 symbols


def test_streaming_bars_partials_pipeline(spark, tmp_path):
    """End-to-end: replay → ingest table → partial-bars stream → merge view."""
    rows = _fixture_rows()
    replay_dir = str(tmp_path / "replay")
    bars_dir, ckpt = str(tmp_path / "bars"), str(tmp_path / "ckpt_bars")
    write_replay_chunks(trades_to_event_lines(rows), replay_dir, num_chunks=5)

    trades_stream = ingest.normalize(read_replay_stream(spark, replay_dir))
    q = bars.start_bars_partials(trades_stream, bars_dir, ckpt, trigger_sec=0)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    partials = spark.read.parquet(bars_dir)
    # multiple micro-batches → at least one (minute,symbol) group has partials
    assert partials.count() >= 6
    batch_df = spark.createDataFrame(
        [(r["symbol"], r["trade_id"], r["price"], r["qty"], r["ts"]) for r in rows],
        "symbol string, trade_id long, price double, qty double, ts timestamp",
    )
    merged = {
        (r["minute"], r["symbol"]): (r["open"], r["high"], r["low"], r["close"],
                                     round(r["volume"], 9), r["trades"])
        for r in bars.reaggregate_bars(partials).collect()
    }
    direct = {
        (r["minute"], r["symbol"]): (r["open"], r["high"], r["low"], r["close"],
                                     round(r["volume"], 9), r["trades"])
        for r in bars.bars_batch(batch_df).collect()
    }
    assert merged == direct


def test_collector_lifecycle(spark, tmp_path):
    rows = _fixture_rows()
    replay_dir, dest, ckpt = (str(tmp_path / d) for d in ("replay", "trades", "ckpt"))
    write_replay_chunks(trades_to_event_lines(rows), replay_dir, num_chunks=2)

    col = Collector(
        spark,
        lambda: ingest.start_ingest(
            read_replay_stream(spark, replay_dir), dest, ckpt, trigger_sec=0
        ),
    )
    assert col.status["state"] == "idle" and not col.status["running"]
    col.start()
    assert col.status["running"] and col.status["state"] == "running"
    with pytest.raises(RuntimeError):
        col.start()  # double-start rejected (reference 409, api/server.py:43-44)
    col.process_available()
    col.stop()
    st = col.status
    assert st["state"] == "idle" and not st["running"] and st["last_error"] is None
    assert spark.read.parquet(dest).count() == len(rows)


def test_watermarked_final_bars(spark, tmp_path):
    """The emit-final variant (survey T4 divergence): bars whose window
    closed before the watermark are emitted once, in append mode, and equal
    the batch recompute; the stream tail (watermark not yet past it) is
    withheld rather than emitted partial."""
    rows = _fixture_rows()
    replay_dir = str(tmp_path / "replay")
    bars_dir, ckpt = str(tmp_path / "bars_final"), str(tmp_path / "ckpt_final")
    # time-ordered chunks so the watermark advances monotonically
    ordered = sorted(rows, key=lambda r: (r["ts"], r["trade_id"]))
    write_replay_chunks(trades_to_event_lines(ordered), replay_dir, num_chunks=5)
    # append-mode emits a window only in a batch AFTER the watermark passes
    # its close — two later straggler batches advance the watermark past
    # every original minute (the stragglers' own minute stays open/withheld)
    stragglers = [
        {"symbol": "BTCUSDT", "trade_id": 9991 + k, "price": 1.0, "qty": 1.0,
         "ts": _utc(f"2024-01-01 00:10:{k:02d}"), "is_buyer_maker": False}
        for k in range(2)
    ]
    import os
    from pathlib import Path
    for k, line in enumerate(trades_to_event_lines(stragglers)):
        (Path(replay_dir) / f"chunk-{5 + k:05d}.jsonl").write_text(line + "\n")
    # the file source admits files in mtime order; make it the chunk order
    # (same-millisecond writes would otherwise replay in arbitrary order)
    for k, p in enumerate(sorted(Path(replay_dir).glob("chunk-*.jsonl"))):
        os.utime(p, (1_700_000_000 + k, 1_700_000_000 + k))

    trades_stream = ingest.normalize(read_replay_stream(spark, replay_dir))
    q = bars.start_bars_final(trades_stream, bars_dir, ckpt, watermark="1 minute")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    emitted = {
        (r["minute"], r["symbol"]): (r["open"], r["high"], r["low"], r["close"],
                                     round(r["volume"], 9), r["trades"])
        for r in spark.read.parquet(bars_dir).collect()
    }
    batch_df = spark.createDataFrame(
        [(r["symbol"], r["trade_id"], r["price"], r["qty"], r["ts"]) for r in rows],
        "symbol string, trade_id long, price double, qty double, ts timestamp",
    )
    direct = {
        (r["minute"], r["symbol"]): (r["open"], r["high"], r["low"], r["close"],
                                     round(r["volume"], 9), r["trades"])
        for r in bars.bars_batch(batch_df).collect()
    }
    # every original bar emitted exactly once, equal to the batch recompute
    assert emitted == direct
    # the stragglers' own (still-open) window is withheld, not emitted partial
    assert all(m.minute != 10 for m, _ in emitted)


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Event-time-bounded stream-stream join == the batch range join on the
    same data (inner join, both sides watermarked)."""
    import pyspark.sql.functions as F

    from crypto_clickhouse_poc_spark.streaming.joins import start_click_purchase_join
    from crypto_clickhouse_poc_spark.tables import load
    from tests.conftest import SF_SMOKE as _SF

    ev = load(spark, _SF, "events").select(
        "user_id", "ts", "event_id", F.col("value").alias("price"), "event_type"
    )
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    ev.where("event_type = 'click'").drop("event_type").write.parquet(cdir)
    ev.where("event_type = 'purchase'").drop("event_type").write.parquet(pdir)
    schema = "user_id long, ts timestamp, event_id long, price double"
    cs = spark.readStream.schema(schema).parquet(cdir)
    ps = spark.readStream.schema(schema).parquet(pdir)
    out, ckpt = str(tmp_path / "joined"), str(tmp_path / "ckpt_join")
    q = start_click_purchase_join(cs, ps, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    c = ev.where("event_type = 'click'").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"),
        F.col("price").alias("click_price"))
    p = ev.where("event_type = 'purchase'")
    want = sorted(
        tuple(r)
        for r in p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("click_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("click_ts") <= F.col("ts")),
        ).select("user_id", "ts", "event_id", "click_ts", "click_price").collect()
    )
    assert len(got) > 0
    assert got == want


def test_ingest_checkpoint_recovery(spark, tmp_path):
    """Kill the ingest stream, deliver more data, restart from the same
    checkpoint: every row lands exactly once (no loss, no duplicates)."""
    rows = _fixture_rows()
    lines = trades_to_event_lines(rows)
    replay_dir, dest, ckpt = (str(tmp_path / d) for d in ("replay", "trades", "ckpt"))
    # first delivery: first half only
    write_replay_chunks(lines[:10], replay_dir, num_chunks=2)
    q = ingest.start_ingest(read_replay_stream(spark, replay_dir), dest, ckpt, trigger_sec=0)
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # "crash"
    assert spark.read.parquet(dest).count() == 10

    # second delivery arrives while down (incl. a REPLAY of rows 5-9 — the
    # reconnect-duplicate scenario) then the query restarts from checkpoint
    import os
    from pathlib import Path
    for k, chunk in enumerate((lines[5:15], lines[15:])):
        p = Path(replay_dir) / f"chunk-{90 + k:05d}.jsonl"
        p.write_text("\n".join(chunk) + "\n")
        os.utime(p, (1_700_000_900 + k, 1_700_000_900 + k))
    q2 = ingest.start_ingest(read_replay_stream(spark, replay_dir), dest, ckpt, trigger_sec=0)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    assert _collect_trades(spark, dest) == _expected(rows)


def test_stateful_sessionization_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: closed sessions emitted by the
    stream equal the batch-computed sessions (each user's final session
    stays open in-stream, so compare against batch minus last-per-user)."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from crypto_clickhouse_poc_spark.streaming.sessions import sessionize_stream
    from crypto_clickhouse_poc_spark.tables import load
    from tests.conftest import SF_SMOKE as _SF

    ev = load(spark, _SF, "events").select(
        "user_id", F.date_trunc("second", "ts").alias("ts")
    )
    # 4 time-ordered parquet chunks (ascending mtime) → one micro-batch
    # each, so sessions genuinely span state across batches
    import os

    src = tmp_path / "src"
    src.mkdir()
    pdf = ev.orderBy("ts").toPandas()
    per = (len(pdf) + 3) // 4
    for k in range(4):
        p = src / f"chunk-{k:05d}.parquet"
        pdf.iloc[k * per : (k + 1) * per].to_parquet(
            p, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        os.utime(p, (1_700_000_000 + k, 1_700_000_000 + k))
    src = str(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out, ckpt = str(tmp_path / "sessions"), str(tmp_path / "ckpt_sess")
    q = (
        sessionize_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["dur_sec"])
        for r in spark.read.parquet(out).collect()
    )

    # batch expectation: lag/cumsum sessions, minus each user's last session
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = (
        ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            (F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))).alias("dur_sec"),
        )
    )
    last_per_user = sess.groupBy("user_id").agg(F.max("sess_id").alias("last_id"))
    closed = sess.join(
        last_per_user,
        (sess.user_id == last_per_user.user_id) & (sess.sess_id == last_per_user.last_id),
        "left_anti",
    )
    want = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["dur_sec"])
        for r in closed.collect()
    )
    assert len(got) > 0
    assert got == want


def test_synthetic_binance_source(spark, tmp_path):
    """The DataSource-API source feeds the same normalize → sink pipeline."""
    from crypto_clickhouse_poc_spark.sources.binance import BinanceTradesDataSource

    spark.dataSource.register(BinanceTradesDataSource)
    raw = (
        spark.readStream.format("binance_trades")
        .option("symbols", "btcusdt,ethusdt")
        .option("rate", "50")
        .option("limit", "100")
        .load()
    )
    dest, ckpt = str(tmp_path / "trades"), str(tmp_path / "ckpt")
    q = ingest.start_ingest(raw, dest, ckpt, trigger_sec=0, dedup=False)
    try:
        # limit=100 → two 50-event batches then empty batches
        q.processAllAvailable()
    finally:
        q.stop()
    df = spark.read.parquet(dest)
    assert df.count() == 100
    assert set(r["symbol"] for r in df.select("symbol").distinct().collect()) == {
        "BTCUSDT",
        "ETHUSDT",
    }
    assert df.where("price IS NULL OR ts IS NULL").count() == 0


@pytest.mark.parametrize("api", ["applyInPandasWithState", "transformWithState"])
def test_stateful_ewma_anomalies_match_batch(spark, tmp_path, api):
    """Stateful EWMA anomaly flags (both state APIs — the
    applyInPandasWithState operator and its transformWithStateInPandas
    twin): the streamed result over 3 time-ordered micro-batches equals
    the driver-side batch fold (state carries exactly across batch
    boundaries), and the planted price spikes are flagged."""
    import os
    import random

    import pandas as pd

    from crypto_clickhouse_poc_spark.streaming.anomaly import (
        batch_anomalies,
        flag_price_anomalies,
        flag_price_anomalies_tws,
    )

    if api == "transformWithState":
        # the plan CONSTRUCTION must work regardless; only the runner needs
        # protobuf, so build the streaming plan and check its schema first
        (tmp_path / "probe_src").mkdir()
        probe = spark.readStream.schema(
            "symbol string, trade_id long, ts timestamp, price double"
        ).parquet(str(tmp_path / "probe_src"))
        built = flag_price_anomalies_tws(probe)
        assert built.columns == ["symbol", "trade_id", "ts", "price", "ewma", "zscore"]
        try:
            from google.protobuf import descriptor  # noqa: F401
        except ImportError:
            pytest.skip(
                "transformWithState's Python runner needs the protobuf "
                "package (not importable in this container)"
            )
    flag = (
        flag_price_anomalies
        if api == "applyInPandasWithState"
        else flag_price_anomalies_tws
    )

    rng = random.Random(11)
    rows, tid, spikes = [], 0, set()
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    from datetime import timedelta

    for sym in ("BTCUSDT", "ETHUSDT"):
        p = 100.0
        for i in range(300):
            tid += 1
            p += rng.uniform(-0.05, 0.05)
            price = p
            if i in (150, 220):  # planted spikes, well past warmup
                price = p * 1.5
                spikes.add(tid)
            rows.append((sym, tid, base + timedelta(seconds=i), round(price, 6)))

    src = tmp_path / "anom_src"
    src.mkdir()
    ordered = sorted(rows, key=lambda r: (r[2], r[1]))
    per = (len(ordered) + 2) // 3
    for k in range(3):
        pdf = pd.DataFrame(
            ordered[k * per : (k + 1) * per],
            columns=["symbol", "trade_id", "ts", "price"],
        )
        path = src / f"chunk-{k:05d}.parquet"
        pdf.to_parquet(path, coerce_timestamps="us", allow_truncated_timestamps=True)
        os.utime(path, (1_700_000_000 + k, 1_700_000_000 + k))

    stream = (
        spark.readStream.schema("symbol string, trade_id long, ts timestamp, price double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out, ckpt = str(tmp_path / "anom_out"), str(tmp_path / "anom_ckpt")
    q = (
        flag(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r["symbol"], r["trade_id"], round(r["zscore"], 9))
        for r in spark.read.parquet(out).collect()
    )
    want = sorted((s, t, round(z, 9)) for s, t, _, _, _, z in batch_anomalies(rows))
    assert got == want
    flagged_ids = {t for _, t, _ in got}
    assert spikes <= flagged_ids  # every planted spike caught
    assert len(got) < len(rows) // 10  # and flags are rare, not noise


def test_builtin_session_window_stream_matches_batch_and_tracker(spark, tmp_path):
    """F.session_window sessionizer: (a) streamed-in-4-chunks result equals
    the batch aggregation of the same function (cross-batch session
    merging inside the engine), (b) sessions are the SAME sessions the
    applyInPandasWithState tracker produces, modulo the documented
    end-bound convention (builtin end = tracker end + gap)."""
    import os

    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from crypto_clickhouse_poc_spark.streaming.sessions import (
        SESSION_GAP_SEC,
        sessionize_builtin,
    )
    from crypto_clickhouse_poc_spark.tables import load
    from tests.conftest import SF_SMOKE as _SF

    ev = load(spark, _SF, "events").select(
        "user_id", F.date_trunc("second", "ts").alias("ts")
    )
    src = tmp_path / "src_bsw"
    src.mkdir()
    pdf = ev.orderBy("ts").toPandas()
    per = (len(pdf) + 3) // 4
    for k in range(4):
        p = src / f"chunk-{k:05d}.parquet"
        pdf.iloc[k * per : (k + 1) * per].to_parquet(
            p, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        os.utime(p, (1_700_000_000 + k, 1_700_000_000 + k))
    stream = spark.readStream.schema("user_id long, ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    q = (
        sessionize_builtin(stream)
        .writeStream.format("memory")
        .queryName("bsw_sessions")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end_excl"], r["n_events"])
        for r in spark.sql("SELECT * FROM bsw_sessions").collect()
    )

    want = sorted(
        (r["user_id"], r["session_start"], r["session_end_excl"], r["n_events"])
        for r in sessionize_builtin(ev).collect()
    )
    assert len(got) > 0
    assert got == want

    # tracker equivalence (batch lag/cumsum construction = the tracker's
    # sessions, all of them): start and count identical, builtin end bound
    # = last event + gap
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = (
        ev.withColumn(
            "new_sess", F.when(gap.isNull() | (gap > SESSION_GAP_SEC), 1).otherwise(0)
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + F.expr(f"INTERVAL {SESSION_GAP_SEC} SECONDS")).alias(
                "session_end_excl"
            ),
            F.count("*").alias("n_events"),
        )
    )
    tracker_want = sorted(
        (r["user_id"], r["session_start"], r["session_end_excl"], r["n_events"])
        for r in sess.collect()
    )
    assert got == tracker_want


def test_ingest_observed_metrics_match_sink(spark, tmp_path):
    """Named observations on the ingest query: summed per-batch
    'ingest_in' equals the raw payload count, 'ingest_out' equals the
    rows landed in the sink (with a replayed-duplicate chunk, in > out —
    the observable drop IS the dedup), and max_event_ts equals the true
    max. Metrics ride StreamingQueryProgress.observedMetrics — no extra
    scan, no sink round-trip."""
    rows = _fixture_rows()
    replay_dir, dest, ckpt = (str(tmp_path / d) for d in ("replay_m", "trades_m", "ckpt_m"))
    lines = trades_to_event_lines(rows)
    # duplicate the first 5 payloads (reconnect replay) → in - out = 5
    write_replay_chunks(lines + lines[:5], replay_dir, num_chunks=4)

    q = ingest.start_ingest(
        read_replay_stream(spark, replay_dir), dest, ckpt, trigger_sec=0
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got_in = got_out = 0
    max_ts = None
    for p in q.recentProgress:
        om = p["observedMetrics"] if isinstance(p, dict) else p.observedMetrics
        if "ingest_in" in om:
            got_in += om["ingest_in"]["rows"]
        if "ingest_out" in om:
            got_out += om["ingest_out"]["rows"]
            t = om["ingest_out"]["max_event_ts"]
            if t is not None and (max_ts is None or t > max_ts):
                max_ts = t
    sunk = len(_collect_trades(spark, dest))
    assert got_in == len(lines) + 5
    assert got_out == sunk == len(rows)
    assert max_ts is not None
    # progress JSON serializes observed timestamps as strings
    want_ts = max(r["ts"] for r in rows).replace(tzinfo=None)
    assert str(max_ts) == want_ts.strftime("%Y-%m-%d %H:%M:%S")
