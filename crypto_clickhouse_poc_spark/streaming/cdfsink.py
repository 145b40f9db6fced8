"""Retraction-aware streaming rollup over the change feed (r14 — the
consumer half of ``snapstream``'s ``readChangeFeed`` mode).

``start_cdf_sum_rollup`` maintains an INVERTIBLE aggregation (sums and
counts per group) of a snapshot table that stays EXACT across every
change the feed can represent — overwrite backfills, upserts, equality
and position deletes — with no dedup key and no idempotent-by-content
sink. Each micro-batch folds its change rows into SIGNED per-group
partials (insert = +measure, delete = −measure) and APPENDS them to the
rollup's own snapshot table under the (appId, batchId) idempotent-writer
watermark, so a replayed batch is a metadata no-op (exactly-once without
a state store — the same contract ``snapsink`` uses). Reads merge the
partials with one sum per measure and drop groups whose row count nets
to zero (fully-retracted groups disappear, no ghost rows).

Scale shape: the fold is one map-side-combined groupBy per micro-batch
over O(change rows); the rollup table is append-only partials whose
read-time merge cost is bounded by the partial-compaction pattern
(``compact_rollup``-style) — at 100 TB base scale the rollup's size is
O(groups), never O(base). Contrast with ``plans/logmv``: logmv recomputes
NON-invertible algebras (bars min/max) by group-scoped swaps; this sink
never recomputes anything because signed sums invert — the two cover the
two halves of the incremental-view-maintenance design space.

Reference parity: the reference's always-on collector + 1m rollup
(api/collector.py, sql/V2__create_trades_1m_view.sql) re-expressed as an
exactly-once retraction-aware pipeline the hosted engine cannot give.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..plans import snapshots as S
from ..plans.snapshots import CDC_TYPE

CDF_APP = "cdf-sum-rollup"
_N = "_n"  # signed row count per group; <= 0 means fully retracted


def start_cdf_sum_rollup(
    spark: SparkSession,
    base_path: str,
    mv_path: str,
    checkpoint_path: str,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    time_col: str | None = None,
    trigger_sec: int = 0,
    app: str = CDF_APP,
) -> StreamingQuery:
    """Launch the signed-fold rollup: ``base_path``'s change feed →
    per-group signed sums appended to ``mv_path`` exactly once per
    micro-batch. ``group_cols[0]`` (or ``time_col``) must be the rollup's
    time-bucket column — it drives the partials' month layout."""
    from ..sources.snapstream import SnapshotCommitsDataSource

    spark.dataSource.register(SnapshotCommitsDataSource)
    ts_col = time_col or group_cols[0]
    sign = F.when(F.col(CDC_TYPE) == "insert", F.lit(1)).otherwise(F.lit(-1))

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        delta = (
            batch.withColumn(_N, sign)
            .groupBy(*group_cols)
            .agg(
                *[F.sum(F.col(c) * F.col(_N)).alias(c) for c in sum_cols],
                F.sum(_N).alias(_N),
            )
        )
        # one partial-append per micro-batch; (app, batchId) makes the
        # at-least-once foreachBatch delivery exactly-once on the log
        S.append(delta, mv_path, ts_col=ts_col, txn_app=app, txn_id=batch_id)

    feed = (
        spark.readStream.format("snapshot_commits")
        .option("path", base_path)
        .option("readChangeFeed", "true")
        .load()
    )
    return (
        feed.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_sec} seconds")
        .outputMode("append")
        .start()
    )


def read_cdf_rollup(
    spark: SparkSession,
    mv_path: str,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Merge the signed partials: one sum per measure per group; groups
    whose net row count reached zero are gone (full retraction)."""
    return (
        S.read_snapshot(spark, mv_path)
        .groupBy(*group_cols)
        .agg(
            *[F.sum(c).alias(c) for c in sum_cols],
            F.sum(_N).alias(_N),
        )
        .where(F.col(_N) > 0)
    )
