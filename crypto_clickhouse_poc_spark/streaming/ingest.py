"""Streaming ingest: Binance-style JSON events → normalized trades table.

The reference dataflow (``src/stream_binance.py:94-119``): WebSocket JSON →
json.loads → field coercion → buffer → bulk insert every 500 rows / 5 s,
with at-most-once delivery and ReplacingMergeTree absorbing reconnect
duplicates. The Spark shape replaces every piece with a stronger built-in:

- decode/coerce      → ``from_json`` + typed select (S2/S3, JVM-side)
- buffer+flush       → micro-batch trigger (``processingTime='5 seconds'`` ≙
                       FLUSH_EVERY_SEC; batch size is Spark-managed)
- at-most-once       → checkpointed exactly-once to the file sink
- reconnect dedup    → ``dropDuplicatesWithinWatermark`` on the sort key
                       (belt-and-braces on top of exactly-once)
- DEFAULT now()      → ``ingested_at = current_timestamp()`` stamped in-plan
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schemas import TRADE_EVENT

FLUSH_EVERY_SEC = 5  # reference FLUSH_EVERY_SEC (src/stream_binance.py:22)
DEDUP_WATERMARK = "10 minutes"

# Per-workload state-store providers (session default: rocksdb, session.py).
# "rocksdb" spills state to local disk and changelog-checkpoints per-batch
# deltas — the only shape that survives unbounded dedup state at 100 TB.
# "memory" (Spark's HDFS-backed provider) keeps the full state map in executor
# memory and snapshots it per commit — faster constants for SMALL bounded
# state (a short-watermark dedup, a bounded windowed agg).
STATE_STORES = {
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "memory": (
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    ),
}


def set_state_store(spark: SparkSession, kind: str) -> None:
    """Select the state-store provider for queries started AFTER this call.

    The provider class is captured into each streaming query's conf at
    ``.start()``, so this is a per-query knob despite being a session conf.
    It must stay fixed for the life of a checkpoint: restarting an existing
    checkpoint under a different provider is rejected by Spark (the on-disk
    state formats differ) — choose per workload, not per restart.
    """
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", STATE_STORES[kind]
    )


def normalize(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Binance combined-stream JSON → typed trade rows (reference field map).

    ``s→symbol, t→trade_id, p→price(str→double), q→qty(str→double),
    T→ts(epoch-ms→timestamp, truncated to seconds for DateTime parity),
    m→is_buyer_maker(bool→0/1)`` — ``src/stream_binance.py:103-110``.
    """
    # Binance's payload has keys `t` (trade id) and `T` (trade time), which a
    # single struct can't expose under Spark's default case-insensitive column
    # resolution. JSON *key* matching is case-sensitive, so the trade time is
    # parsed with its own one-field schema and the rest with TRADE_EVENT.
    v = F.col(value_col).cast("string")
    ev = raw.select(
        F.from_json(v, TRADE_EVENT).alias("ev"),
        F.from_json(v, "STRUCT<data: STRUCT<T: BIGINT>>").alias("evt"),
    )
    return ev.select(
        F.col("ev.data.s").alias("symbol"),
        F.col("ev.data.t").cast("long").alias("trade_id"),
        F.col("ev.data.p").cast("double").alias("price"),
        F.col("ev.data.q").cast("double").alias("qty"),
        F.date_trunc("second", F.timestamp_millis(F.col("evt.data.T"))).alias("ts"),
        F.when(F.col("ev.data.m"), F.lit(1)).otherwise(F.lit(0)).alias("is_buyer_maker"),
    ).where(F.col("symbol").isNotNull() & F.col("trade_id").isNotNull())


def with_ingest_metadata(trades: DataFrame) -> DataFrame:
    """Stamp ingested_at (reference DEFAULT now()) and the partition month."""
    return trades.withColumn("ingested_at", F.current_timestamp()).withColumn(
        "p_month", F.date_format(F.col("ts"), "yyyyMM")
    )


def deduped(trades: DataFrame) -> DataFrame:
    """Drop reconnect duplicates on the sort key within the event-time
    watermark (streaming analog of ReplacingMergeTree, survey §1.4a)."""
    return trades.withWatermark("ts", DEDUP_WATERMARK).dropDuplicatesWithinWatermark(
        ["ts", "symbol", "trade_id"]
    )


def start_ingest(
    raw_stream: DataFrame,
    dest_path: str,
    checkpoint_path: str,
    trigger_sec: int = FLUSH_EVERY_SEC,
    dedup: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Launch the ingest query: normalize → dedup → 5 s micro-batch append.

    ``raw_stream`` is any streaming DataFrame with a JSON payload column
    named ``value`` (file replay source in tests, Binance WS DataSource or
    Kafka in production — sources are interchangeable by construction).
    ``state_store`` optionally overrides the session's provider for this
    query's dedup state (see :func:`set_state_store`): the reference
    collector's 10-minute reconnect-dedup window is small bounded state, so
    a deployment that only runs ingest can pick ``"memory"``.

    ``dedup=False`` is the EXACTLY-ONCE-SOURCE fast path: it removes the
    stateful ``dropDuplicatesWithinWatermark``, whose per-batch state-store
    commits dominate small micro-batches (~2× ingest rate; A/B in
    PERF.md). Safety condition — the source must never emit the same row
    twice on its own: replayable checkpointed offsets (Kafka, files),
    where re-delivery happens only on failure recovery and is already made
    exactly-once by the checkpoint + file-sink manifest. Keep the default
    ``dedup=True`` for sources that themselves resend rows — e.g. a
    WebSocket that replays the last trades on reconnect — because those
    duplicates arrive as NEW offsets the sink transaction log cannot
    collapse.
    """
    if state_store is not None:
        set_state_store(raw_stream.sparkSession, state_store)
    # Named observations ride the micro-batch for free (computed inside the
    # existing passes, no extra scan) and surface per-batch in
    # StreamingQueryProgress.observedMetrics — the production feedback loop
    # for lag/drop monitoring. "ingest_in" counts raw payloads, "ingest_out"
    # what survived parse+dedup; in − out = malformed + reconnect-duplicate
    # rows, and max_event_ts vs wall-clock is the ingestion lag.
    raw_stream = raw_stream.observe("ingest_in", F.count(F.lit(1)).alias("rows"))
    trades = normalize(raw_stream)
    if dedup:
        trades = deduped(trades)
    out = with_ingest_metadata(trades).observe(
        "ingest_out",
        F.count(F.lit(1)).alias("rows"),
        F.max("ts").alias("max_event_ts"),
    )
    return (
        out.writeStream.format("parquet")
        .option("path", dest_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("p_month")
        .trigger(processingTime=f"{trigger_sec} seconds")
        .outputMode("append")
        .start()
    )
