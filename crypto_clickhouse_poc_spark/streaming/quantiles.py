"""Mergeable quantile partials: the MV pattern applied to distributions.

The bars MV maintains OHLCV incrementally because its partials merge
exactly (survey T2); KMV does the same for distinct counts. This module
closes the remaining aggregate family — quantiles — with a fixed-width
histogram sketch whose merge is EXACT (integer bucket counts add), so a
streamed/flushed maintenance of p50/p90/p99 equals the one-shot batch
computation bit-for-bit and sits under the full value-hash oracle gate,
unlike ``approx_percentile`` (whose GK sketch is merge-order-dependent).

Accuracy is a layout constant: the estimate is the upper edge of the
bucket containing the target rank, so error ≤ ``WIDTH`` absolutely. At
100 TB each flush emits O(types × occupied buckets) rows — bounded state,
no history rescan; the read-time merge is one hash aggregate on
(type, bucket) plus a window over ≤ O(buckets) rows per type.

Bucketing is ``floor(x / WIDTH)`` — IEEE division + floor, identical in
Spark and DuckDB, so the oracle reproduces the sketch exactly (a log-scale
bucket would risk 1-ulp ``log`` divergence across engines at boundaries).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

#: histogram bucket width in price units (absolute error bound of the
#: quantile estimate). A deployment picks this per metric domain.
WIDTH = 5.0

QS = (0.5, 0.9, 0.99)


def bucket_of(col: Column) -> Column:
    return F.floor(col / F.lit(WIDTH)).cast("long")


def hist_partials(df: DataFrame, value_col: str = "price", key: str = "symbol") -> DataFrame:
    """Per-flush histogram partial: (key, bucket, cnt). O(keys × buckets)
    rows regardless of batch size — the mergeable unit a sink appends."""
    return (
        df.groupBy(F.col(key).alias("key"), bucket_of(F.col(value_col)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_quantiles(partials: DataFrame, qs: Sequence[float] = QS) -> DataFrame:
    """Merge appended partials and extract quantile estimates per key.

    Merge = sum counts per (key, bucket) — associative/commutative, so any
    flush interleaving yields the same histogram. Estimate for quantile q:
    the upper edge of the first bucket whose cumulative count reaches
    ``ceil(q·n)`` (the lower-quantile rank). The cumulative window runs
    over ≤ O(buckets) rows per key — never over raw data.
    """
    h = partials.groupBy("key", "bucket").agg(F.sum("cnt").alias("cnt"))
    w = Window.partitionBy("key").orderBy("bucket")
    c = h.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("key"))
    )
    aggs = [F.max("n").alias("n")]
    for q in qs:
        rank = F.ceil(F.lit(q) * F.col("n"))
        hit = F.when(F.col("cum") >= rank, F.col("bucket"))
        aggs.append(
            ((F.min(hit) + 1) * F.lit(WIDTH)).alias(f"p{int(q * 100)}_est")
        )
    return c.groupBy("key").agg(*aggs)


def start_hist_partials(
    trades_stream: DataFrame,
    dest_path: str,
    checkpoint_path: str,
    value_col: str = "price",
    key: str = "symbol",
    trigger_sec: int = 5,
) -> StreamingQuery:
    """Maintain the quantile MV under Structured Streaming: each micro-batch
    appends its histogram partial (same ``foreachBatch`` shape as the bars
    MV). Readers call :func:`merge_quantiles` over the partials table —
    serving cost is O(keys × buckets), independent of history length."""

    def emit(batch: DataFrame, batch_id: int) -> None:
        hist_partials(batch, value_col=value_col, key=key).write.mode(
            "append"
        ).parquet(dest_path)

    return (
        trades_stream.writeStream.foreachBatch(emit)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_sec} seconds")
        .start()
    )
