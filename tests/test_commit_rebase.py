"""Conflict-rebase gates (snapshots._commit on_conflict="rebase_appends"):
a rewrite op (optimize/compact/delete/compact_rollup) that loses its race
to a PURE APPEND re-attempts with the winner as parent, carrying the
appended files forward verbatim — instead of raising CommitConflict. Any
non-append interleave still conflicts. The production shape this exists
for: a 5 s-cadence streaming sink must never starve maintenance."""

from __future__ import annotations

import threading
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans import logmv as M
from crypto_clickhouse_poc_spark.plans import snapshots as S

SCHEMA = "ts timestamp, symbol string, trade_id long, price double, ingested_at long"


def _batch(spark, ids, month=1):
    rows = [(datetime(2024, month, 1), "BTC", i, float(i), 0) for i in ids]
    return spark.createDataFrame(rows, SCHEMA)


def _ids(spark, path):
    return sorted(r.trade_id for r in S.read_snapshot(spark, path).collect())


def _interleave(monkeypatch, spark, path, make_df):
    """Arrange ONE interleaved commit to land between a rewrite op's
    snapshot read and its commit: piggyback on the op's own _write_txn
    (which runs strictly after the read, strictly before the commit)."""
    real = S._write_txn
    state = {"fired": False}

    def sneaky(df, p, ts_col, **kw):
        entries = real(df, p, ts_col, **kw)
        if not state["fired"]:
            state["fired"] = True
            S.append(make_df(), path)  # the racing pure append
        return entries

    monkeypatch.setattr(S, "_write_txn", sneaky)
    return state


def test_optimize_rebases_over_interleaved_append(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    S.append(_batch(spark, range(10)), path)
    S.append(_batch(spark, range(10, 20)), path)
    state = _interleave(
        monkeypatch, spark, path, lambda: _batch(spark, range(100, 105))
    )
    v = S.optimize_small_files(spark, path, min_rows=10_000)
    assert state["fired"]
    # no CommitConflict; the commit landed ON TOP of the append
    assert v == S.latest_version(path)
    assert S._version_body(path, v)["op"] == "optimize"
    assert S._version_body(path, v - 1)["op"] == "append"
    # nothing lost: optimize's survivors AND the racing append's rows
    assert _ids(spark, path) == sorted(list(range(20)) + list(range(100, 105)))


def test_compact_rebases_and_append_rows_are_not_deduped_away(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t")
    S.append(_batch(spark, range(10)), path)
    S.append(_batch(spark, range(10)), path)  # duplicates for the dedup
    state = _interleave(
        monkeypatch, spark, path, lambda: _batch(spark, [500])
    )
    v = S.compact_snapshot(spark, path)
    assert state["fired"] and v == S.latest_version(path)
    assert _ids(spark, path) == sorted(list(range(10)) + [500])


def test_delete_where_rebases_and_positions_stay_valid(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t")
    S.append(_batch(spark, range(10)), path)
    real = S._write_dv_entries
    state = {"fired": False}

    def sneaky(df, p, prefix, extra=None):
        entries = real(df, p, prefix, extra)
        if not state["fired"]:
            state["fired"] = True
            S.append(_batch(spark, [200, 201]), path)
        return entries

    monkeypatch.setattr(S, "_write_dv_entries", sneaky)
    S.delete_where(spark, path, "trade_id in (3, 4)")
    assert state["fired"]
    # delete applied to the snapshot it read; the racing append intact
    assert _ids(spark, path) == sorted(
        [i for i in range(10) if i not in (3, 4)] + [200, 201]
    )


def test_non_append_interleave_still_conflicts(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    S.append(_batch(spark, range(10)), path)
    S.append(_batch(spark, range(10, 20)), path)
    real = S._write_txn
    state = {"fired": False}

    def sneaky(df, p, ts_col, **kw):
        entries = real(df, p, ts_col, **kw)
        if not state["fired"]:
            state["fired"] = True
            # the interleaver is a DELETE — it changes visible rows, so
            # the rewrite's output is stale and must not land
            S.delete_where(spark, path, "trade_id = 1")
        return entries

    monkeypatch.setattr(S, "_write_txn", sneaky)
    with pytest.raises(S.CommitConflict):
        S.optimize_small_files(spark, path, min_rows=10_000)
    monkeypatch.undo()
    assert 1 not in _ids(spark, path)  # the delete won; rerun is clean
    v = S.optimize_small_files(spark, path, min_rows=10_000)
    assert S._version_body(path, v)["op"] == "optimize"


def test_compact_rollup_rebases_over_interleaved_refresh(
    spark, tmp_path, monkeypatch
):
    base, mv = str(tmp_path / "base"), str(tmp_path / "mv")
    ts0 = datetime(2024, 3, 1, 9, 0)
    trades = spark.createDataFrame(
        [(ts0, "BTC", i, 100.0 + i, 1.0, 0) for i in range(20)],
        "ts timestamp, symbol string, trade_id long, price double, qty double,"
        " ingested_at long",
    )
    S.append(trades.where("trade_id < 10"), base)
    M.refresh_rollup(spark, base, mv)
    S.append(trades.where("trade_id >= 10"), base)
    real = S._write_txn
    state = {"fired": False}

    def sneaky(df, p, ts_col, **kw):
        entries = real(df, p, ts_col, **kw)
        if not state["fired"]:
            state["fired"] = True
            M.refresh_rollup(spark, base, mv)  # racing refresh appends
        return entries

    monkeypatch.setattr(S, "_write_txn", sneaky)
    v = M.compact_rollup(spark, mv)
    monkeypatch.undo()
    assert state["fired"] and v == S.latest_version(mv)
    # the carried partials + watermark both survived the rebase
    assert S.last_txn(mv, "logmv") == S.latest_version(base)
    from crypto_clickhouse_poc_spark.streaming.bars import bars_batch

    assert sorted(map(tuple, M.read_rollup(spark, mv).collect())) == sorted(
        map(tuple, bars_batch(S.read_snapshot(spark, base)).collect())
    )
    assert M.refresh_rollup(spark, base, mv) is None  # steady state intact


def test_thread_stress_appends_never_starve_optimize(spark, tmp_path):
    """The production shape: an appender thread committing continuously
    while the maintenance loop runs OPTIMIZE — every optimize must land
    (zero CommitConflict) and no appended row may be lost."""
    path = str(tmp_path / "t")
    S.append(_batch(spark, range(10)), path)
    stop = threading.Event()
    appended: list[int] = []
    errs: list[Exception] = []

    def appender():
        k = 1000
        while not stop.is_set():
            try:
                S.append(_batch(spark, [k, k + 1]), path)
                appended.extend([k, k + 1])
                k += 2
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)
                return

    t = threading.Thread(target=appender)
    t.start()
    try:
        done = 0
        while done < 4:
            v = S.optimize_small_files(spark, path, min_rows=10_000)
            assert S._version_body(path, v)["op"] in ("optimize", "append")
            done += 1
    finally:
        stop.set()
        t.join(timeout=120)
    assert not errs, errs
    assert _ids(spark, path) == sorted(list(range(10)) + appended)
