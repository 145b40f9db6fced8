"""Stream-stream joins: event-time-bounded enrichment between two live streams.

The pattern the reference's domain eventually needs (e.g., trades ⋈ quotes,
order-events ⋈ fill-events): join two unbounded streams on a key plus an
event-time range, with watermarks bounding how much join state either side
must retain. Spark executes this as a symmetric stateful hash join — each
side buffers rows until the other side's watermark passes the range bound,
then evicts. State size is O(key-rate × window), independent of stream
length: the property that makes the join viable on an unbounded feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def click_purchase_join(clicks: DataFrame, purchases: DataFrame, window: str = "1 HOUR") -> DataFrame:
    """Per purchase, prior clicks by the same user within ``window``.

    Both inputs are *streaming* DataFrames with columns
    (user_id, ts, event_id, price). Watermarks let Spark evict click state
    once no purchase can still match it (and vice versa).
    """
    c = (
        clicks.withWatermark("ts", "10 minutes")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("price").alias("click_price"),
        )
    )
    p = purchases.withWatermark("ts", "10 minutes")
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("click_ts") <= F.col("ts")),
        "inner",
    ).select("user_id", "ts", "event_id", "click_ts", "click_price")


def start_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    dest_path: str,
    checkpoint_path: str,
    window: str = "1 HOUR",
) -> StreamingQuery:
    joined = click_purchase_join(clicks, purchases, window)
    return (
        joined.writeStream.format("parquet")
        .option("path", dest_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )
