"""Streaming Bloom membership seat gates: merged filter bit-identical to
a one-shot build, no false negatives on ingested rows, compaction
invariance via the shared "bloom" family."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.sources.replay import (
    read_replay_stream,
    trades_to_event_lines,
    write_replay_chunks,
)
from crypto_clickhouse_poc_spark.streaming import bloomseat as BS
from crypto_clickhouse_poc_spark.streaming.compaction import maybe_compact
from crypto_clickhouse_poc_spark.streaming.ingest import normalize
from tests.test_streaming import _fixture_rows


def _run_seat(spark, tmp_path):
    rows = _fixture_rows()
    replay_dir, dest, ckpt = (str(tmp_path / d) for d in ("replay", "bloom", "ckpt"))
    write_replay_chunks(trades_to_event_lines(rows), replay_dir, num_chunks=4)
    q = BS.start_bloom_partials(
        read_replay_stream(spark, replay_dir), dest, ckpt, trigger_sec=0
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batch = normalize(
        spark.read.text(replay_dir).select(F.col("value").cast("string"))
    )
    return rows, dest, batch


def test_merged_filter_equals_one_shot_build(spark, tmp_path):
    _, dest, batch = _run_seat(spark, tmp_path)
    merged = sorted(map(tuple, BS.merged_filter(spark, dest).collect()))
    oneshot = sorted(
        map(
            tuple,
            __import__(
                "crypto_clickhouse_poc_spark.operators.bloom", fromlist=["bloom_build"]
            ).bloom_build(BS.trade_key(batch), text_col=BS.KEY_COL).collect(),
        )
    )
    assert merged == oneshot  # OR-merge == one-shot, bit for bit


def test_no_false_negatives_and_fresh_rows_mostly_novel(spark, tmp_path):
    _, dest, batch = _run_seat(spark, tmp_path)
    filt = BS.merged_filter(spark, dest)
    seen = BS.seen_status(batch, filt)
    assert all(r.status == "maybe_dup" for r in seen.collect())  # no FNs
    fresh = batch.withColumn("trade_id", F.col("trade_id") + 100000)
    fresh_status = [r.status for r in BS.seen_status(fresh, filt).collect()]
    assert fresh_status.count("novel") >= len(fresh_status) * 0.9


def test_compaction_keeps_the_filter_invariant(spark, tmp_path):
    _, dest, _ = _run_seat(spark, tmp_path)
    before = sorted(map(tuple, BS.merged_filter(spark, dest).collect()))
    n_before = len(list(Path(dest).glob("part-*")))
    assert maybe_compact(spark, dest, "bloom", max_files=0)
    assert len(list(Path(dest).glob("part-*"))) < max(n_before, 2)
    assert sorted(map(tuple, BS.merged_filter(spark, dest).collect())) == before
