"""Streaming Count-Min MV seat: per-flush, per-minute CMS partials
committed through the snapshot log.

The Bloom seat (`streaming/bloomseat.py`) can append its partials to a
plain dir because OR-merge is IDEMPOTENT — a replayed flush changes
nothing. CMS merge is a SUM, so a replayed flush would double-count:
this seat is the repo's demonstration of why non-idempotent sketch
algebras need an exactly-once sink, and it gets one for free from the
snapshot log's (appId, batchId) watermark (`plans/snapshots.append`) —
at-least-once foreachBatch delivery, exactly-once cells.

Shape: each flush partial-aggregates its batch to
(minute, d, bucket, cnt) — a time-windowed CMS, the monitoring shape
("how many rows for key K in minute M?" under CONSTANT state per
minute, independent of key cardinality). The read-time merge is one
hash aggregate summing cells; per-key point estimates reuse
``operators.cms.cms_point_estimates``. Row volume per flush is capped
at minutes x D x W regardless of batch size — map-side combine does
the heavy lifting, exactly like the batch sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.cms import _fanout
from ..plans import snapshots as S
from .ingest import FLUSH_EVERY_SEC, normalize

CMS_APP = "cms-partials"


def _minute_cells(df: DataFrame, token: Column) -> DataFrame:
    """(minute, d, bucket, cnt) partials for one batch — the windowed
    twin of ``operators.cms._cms_cells``, built on the SAME shared grid
    fan-out so streaming and batch sketches can never desynchronize."""
    pair = F.explode(_fanout(token))
    return (
        df.select(F.date_trunc("minute", F.col("ts")).alias("minute"), pair.alias("p"))
        .select("minute", "p.d", "p.bucket")
        .groupBy("minute", "d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def start_cms_partials(
    raw_stream: DataFrame,
    table_path: str,
    checkpoint_path: str,
    token_col: str = "symbol",
    trigger_sec: int = FLUSH_EVERY_SEC,
    app: str = CMS_APP,
) -> StreamingQuery:
    """Launch the seat: normalize → per-minute CMS partial → snapshot
    commit stamped (app, batch_id). A redelivered batch is detected by
    the watermark and skipped — the SUM algebra never sees it."""

    def flush(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cells = _minute_cells(batch_df, F.col(token_col))
        S.append(cells, table_path, ts_col="minute", txn_app=app, txn_id=batch_id)

    return (
        normalize(raw_stream)
        .writeStream.foreachBatch(flush)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_sec} seconds")
        .outputMode("append")
        .start()
    )


def merged_cells(
    spark: SparkSession, table_path: str, by_minute: bool = False
) -> DataFrame:
    """The live sketch: one hash aggregate summing flush partials —
    global (d, bucket, cnt) by default, per-minute when asked."""
    keys = ["minute", "d", "bucket"] if by_minute else ["d", "bucket"]
    return (
        S.read_snapshot(spark, table_path, ts_col="minute")
        .groupBy(*keys)
        .agg(F.sum("cnt").alias("cnt"))
    )
