"""MV-partials compaction gates (round-8): every sketch MV seat appends one
summary per flush forever; compaction collapses them through the seat's own
merge algebra. The gates check the three promises:

- reader invariance: compacted reads equal uncompacted reads EXACTLY for
  bars/KMV/quantiles, and bit-identically for Misra-Gries too (the MG merge
  is an uncompressed pointwise sum, so pre-summing adds no error — D sums),
- crash-window healing: a crash between the two swap renames is healed at
  startup (and by compact_partials itself) via the shared layout protocol,
- bounded file count: the partials dir drops to n_files part-files.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.sources.replay import (
    read_replay_stream,
    trades_to_event_lines,
    write_replay_chunks,
)
from crypto_clickhouse_poc_spark.streaming import bars, compaction, ingest
from crypto_clickhouse_poc_spark.streaming import quantiles as Q
from crypto_clickhouse_poc_spark.streaming import topk as TK
from crypto_clickhouse_poc_spark.tables import load
from tests.conftest import SF_SMOKE
from tests.test_streaming import _fixture_rows


def _part_files(path: str) -> list[str]:
    return [p.name for p in Path(path).glob("part-*")]


def _bars_read(spark, path):
    return sorted(
        (
            r["minute"],
            r["symbol"],
            r["open"],
            r["high"],
            r["low"],
            r["close"],
            round(r["volume"], 9),
            r["trades"],
        )
        for r in bars.reaggregate_bars(spark.read.parquet(path)).collect()
    )


def test_bars_compaction_over_replayed_stream(spark, tmp_path):
    """End-to-end: replayed stream appends flush partials; compaction
    collapses them to one file; the reader result is unchanged; later
    appends still merge against the compacted row."""
    rows = _fixture_rows()
    replay_dir = str(tmp_path / "replay")
    bars_dir, ckpt = str(tmp_path / "bars"), str(tmp_path / "ckpt")
    write_replay_chunks(trades_to_event_lines(rows), replay_dir, num_chunks=5)
    q = bars.start_bars_partials(
        ingest.normalize(read_replay_stream(spark, replay_dir)), bars_dir, ckpt,
        trigger_sec=0,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    before = _bars_read(spark, bars_dir)
    n_before = len(_part_files(bars_dir))
    assert n_before > 1  # multiple flushes actually appended

    compaction.compact_partials(spark, bars_dir, "bars")
    assert _bars_read(spark, bars_dir) == before
    assert len(_part_files(bars_dir)) == 1

    # a post-compaction flush merges against the compacted partials: total
    # equals the batch recompute over ALL trades (old + late)
    late = spark.createDataFrame(
        [("BTCUSDT", 9999, 140.0, 1.0, rows[0]["ts"], 0)],
        "symbol string, trade_id long, price double, qty double, ts timestamp,"
        " is_buyer_maker int",
    )
    bars.partial_bars(late).write.mode("append").parquet(bars_dir)
    all_rows = spark.createDataFrame(
        [
            (r["symbol"], r["trade_id"], r["price"], r["qty"], r["ts"],
             int(r["is_buyer_maker"]))
            for r in rows
        ],
        "symbol string, trade_id long, price double, qty double, ts timestamp,"
        " is_buyer_maker int",
    ).unionAll(late)
    want = sorted(
        (r["minute"], r["symbol"], r["open"], r["high"], r["low"], r["close"],
         round(r["volume"], 9), r["trades"])
        for r in bars.bars_batch(all_rows).collect()
    )
    assert _bars_read(spark, bars_dir) == want


def _flush_split(e, i):
    return e.where(F.col("event_id") % 3 == i)


def test_quantile_compaction_reader_invariant(spark, tmp_path):
    e = load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "hist")
    for i in range(3):
        Q.hist_partials(_flush_split(e, i), value_col="value", key="event_type")\
            .write.mode("append").parquet(path)
    before = sorted(map(tuple, Q.merge_quantiles(spark.read.parquet(path)).collect()))
    compaction.compact_partials(spark, path, "quantiles")
    after = sorted(map(tuple, Q.merge_quantiles(spark.read.parquet(path)).collect()))
    assert after == before
    assert len(_part_files(path)) == 1


def test_kmv_compaction_reader_invariant(spark, tmp_path):
    from crypto_clickhouse_poc_spark.operators.trades import kmv_frac, kmv_topk

    e = load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "kmv")
    for i in range(3):
        p = kmv_topk(
            _flush_split(e, i)
            .select("event_type", "user_id")
            .distinct()
            .withColumn("frac", kmv_frac(F.col("user_id")))
        ).select("event_type", "frac")
        p.write.mode("append").parquet(path)

    def read(path):
        # the read-time merge from kmv_partials_replay: k smallest of union
        from crypto_clickhouse_poc_spark.operators.trades import (
            KMV_K,
            kmv_estimate,
        )
        from pyspark.sql.window import Window

        parts = spark.read.parquet(path)
        w = Window.partitionBy("event_type").orderBy("frac")
        merged = (
            parts.distinct()
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= KMV_K)
        )
        return sorted(
            map(
                tuple,
                merged.groupBy("event_type")
                .agg(F.count("*").alias("k_eff"), F.max("frac").alias("h_k"))
                .select(
                    "event_type",
                    F.round(
                        kmv_estimate(F.col("k_eff"), F.col("h_k")), 2
                    ).alias("n_kmv"),
                )
                .collect(),
            )
        )

    before = read(path)
    compaction.compact_partials(spark, path, "kmv")
    assert read(path) == before
    assert len(_part_files(path)) == 1


def test_mg_compaction_is_bit_identical_and_d_sums(spark, tmp_path):
    e = load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "mg")
    for i in range(3):
        TK.mg_flush_partial(
            _flush_split(e, i).select(F.col("event_type")), "event_type", k=3
        ).write.mode("append").parquet(path)
    parts = spark.read.parquet(path)
    d_before = parts.where(F.col("key").isNull()).agg(F.sum("d")).collect()[0][0]
    before = sorted(
        map(tuple, TK.merge_heavy_hitters(parts).collect())
    )
    compaction.compact_partials(spark, path, "mg")
    compacted = spark.read.parquet(path)
    after = sorted(map(tuple, TK.merge_heavy_hitters(compacted).collect()))
    assert after == before  # bit-identical, not just same-interval
    # exactly one bookkeeping row, carrying the SUMMED D
    book = compacted.where(F.col("key").isNull()).collect()
    assert len(book) == 1 and book[0]["d"] == d_before
    assert len(_part_files(path)) == 1


def test_compaction_crash_window_heals(spark, tmp_path):
    """A crash between swap_in's two renames leaves the live path absent;
    both leftover states heal to a readable table with invariant results —
    and compact_partials itself heals before compacting."""
    e = load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "hist")
    for i in range(3):
        Q.hist_partials(_flush_split(e, i), value_col="value", key="event_type")\
            .write.mode("append").parquet(path)
    want = sorted(map(tuple, Q.merge_quantiles(spark.read.parquet(path)).collect()))

    # state A: crash after tmp fully written, live renamed aside
    compaction.merge_quantiles_to_partial(spark.read.parquet(path)).coalesce(1)\
        .write.mode("overwrite").parquet(path + ".compact.tmp")
    Path(path).rename(path + ".compact.old")
    from crypto_clickhouse_poc_spark.plans.layout import recover_compaction

    assert recover_compaction(path) == "promoted_tmp"
    got = sorted(map(tuple, Q.merge_quantiles(spark.read.parquet(path)).collect()))
    assert got == want

    # state B: crash before tmp finished (no _SUCCESS) → restore the old copy
    shutil.copytree(path, str(tmp_path / "save"))
    Path(path).rename(path + ".compact.old")
    tmp = Path(path + ".compact.tmp")
    tmp.mkdir()
    (tmp / "part-00000-incomplete.parquet").write_bytes(b"not a parquet file")
    assert recover_compaction(path) == "restored_old"
    got = sorted(map(tuple, Q.merge_quantiles(spark.read.parquet(path)).collect()))
    assert got == want

    # compact_partials on a crashed-state dir heals, then compacts
    Path(path).rename(path + ".compact.old")
    compaction.compact_partials(spark, path, "quantiles")
    got = sorted(map(tuple, Q.merge_quantiles(spark.read.parquet(path)).collect()))
    assert got == want


def test_maybe_compact_policy_bounds_file_count(spark, tmp_path):
    """The maintenance-loop entry: under threshold it is a no-op (no
    rewrite), over threshold it compacts — so interleaved
    flush/maybe_compact keeps the dir bounded for the stream's life."""
    e = load(spark, SF_SMOKE, "events")
    path = str(tmp_path / "hist")
    want = None
    for round_ in range(3):
        for i in range(3):
            Q.hist_partials(_flush_split(e, i), value_col="value",
                            key="event_type").write.mode("append").parquet(path)
        if want is None:
            want = sorted(
                map(tuple, Q.merge_quantiles(spark.read.parquet(path)).collect())
            )
        # threshold high: no-op, files keep accumulating
        assert compaction.maybe_compact(spark, path, "quantiles", max_files=99) is False
        # threshold low: compacts back to one file
        assert compaction.maybe_compact(spark, path, "quantiles", max_files=2) is True
        assert len(_part_files(path)) == 1
    got = sorted(map(tuple, Q.merge_quantiles(spark.read.parquet(path)).collect()))
    # 3 rounds of identical flushes => every count is 3x the single round's
    key_cols = {r[0] for r in got}
    assert key_cols == {r[0] for r in want}
