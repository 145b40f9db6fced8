"""Streaming CMS seat gates: streamed flush partials sum-merge to the
EXACT one-shot sketch; a redelivered batch is a watermark no-op (the
SUM algebra, unlike Bloom's idempotent OR, would double-count without
exactly-once); point estimates through the merged sketch keep the
one-sided guarantee against true per-key counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.operators import cms
from crypto_clickhouse_poc_spark.plans import snapshots as S
from crypto_clickhouse_poc_spark.sources.replay import (
    read_replay_stream,
    trades_to_event_lines,
    write_replay_chunks,
)
from crypto_clickhouse_poc_spark.streaming import cmsseat as CS
from crypto_clickhouse_poc_spark.streaming.ingest import normalize
from tests.test_streaming import _fixture_rows


def _run_seat(spark, tmp_path):
    rows = _fixture_rows()
    replay_dir, dest, ckpt = (str(tmp_path / d) for d in ("replay", "cms", "ckpt"))
    write_replay_chunks(trades_to_event_lines(rows), replay_dir, num_chunks=4)
    q = CS.start_cms_partials(
        read_replay_stream(spark, replay_dir), dest, ckpt, trigger_sec=0
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batch = normalize(
        spark.read.text(replay_dir).select(F.col("value").cast("string"))
    )
    return dest, batch


def test_streamed_partials_sum_to_one_shot_sketch(spark, tmp_path):
    dest, batch = _run_seat(spark, tmp_path)
    merged = sorted(map(tuple, CS.merged_cells(spark, dest).collect()))
    oneshot = sorted(
        map(
            tuple,
            cms._cms_cells(batch.select(F.col("symbol").alias("token"))).collect(),
        )
    )
    assert merged == oneshot and merged


def test_redelivered_batch_is_a_watermark_noop(spark, tmp_path):
    dest, batch = _run_seat(spark, tmp_path)
    before = sorted(map(tuple, CS.merged_cells(spark, dest).collect()))
    committed = S.last_txn(dest, CS.CMS_APP)
    # at-least-once delivery: the sink's flush runs AGAIN for an
    # already-committed batch id — the snapshot watermark must swallow it
    cells = CS._minute_cells(batch, F.col("symbol"))
    S.append(cells, dest, ts_col="minute", txn_app=CS.CMS_APP, txn_id=committed)
    assert S.last_txn(dest, CS.CMS_APP) == committed
    assert sorted(map(tuple, CS.merged_cells(spark, dest).collect())) == before


def test_point_estimates_stay_one_sided_through_the_stream(spark, tmp_path):
    dest, batch = _run_seat(spark, tmp_path)
    truth = (
        batch.select(F.col("symbol").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    est = cms.cms_point_estimates(CS.merged_cells(spark, dest), truth)
    rows = est.collect()
    assert rows and all(r.cms_est >= r.freq for r in rows)


def test_compact_rollup_bounds_cms_partials_read_invisibly(spark, tmp_path):
    """The generic MV compaction with the CMS sum algebra: flush
    partials collapse to one row per (minute, d, bucket), reads are
    identical, and the seat's exactly-once watermark survives."""
    from crypto_clickhouse_poc_spark.plans import logmv as M

    dest, _ = _run_seat(spark, tmp_path)
    before = sorted(map(tuple, CS.merged_cells(spark, dest).collect()))
    n_before = S.read_snapshot(spark, dest, ts_col="minute").count()
    committed = S.last_txn(dest, CS.CMS_APP)
    M.compact_rollup(
        spark,
        dest,
        merge_fn=lambda df: df.groupBy("minute", "d", "bucket").agg(
            F.sum("cnt").alias("cnt")
        ),
    )
    assert sorted(map(tuple, CS.merged_cells(spark, dest).collect())) == before
    assert S.read_snapshot(spark, dest, ts_col="minute").count() <= n_before
    assert S.last_txn(dest, CS.CMS_APP) == committed  # watermark carried


def test_per_minute_cells_partition_the_global_sketch(spark, tmp_path):
    dest, _ = _run_seat(spark, tmp_path)
    by_min = CS.merged_cells(spark, dest, by_minute=True)
    refolded = sorted(
        map(
            tuple,
            by_min.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt")).collect(),
        )
    )
    assert refolded == sorted(map(tuple, CS.merged_cells(spark, dest).collect()))
