"""Streaming Bloom membership MV seat: per-flush (word, bits) partials
over the trade sort key — the ingest-dedup probe `operators/bloom.py`
documents, given its streaming half.

Use case: "have we already ingested this row?" without touching the
trades table. Each 5 s flush appends its batch's ≤ BLOOM_WORDS-row Bloom
partial; the read-time merge is ONE `bit_or` hash aggregate over
flushes×words rows (OR is associative, commutative AND idempotent — so
replayed flushes are harmless, flush order is irrelevant, and the merged
filter is bit-identical to a one-shot build over all rows: this seat is
fully deterministic, unlike the MG/HLL summaries). A reconnecting
collector probes the merged filter (k hashes + a ≤ BLOOM_WORDS broadcast
join; the corpus is never read) and only rows answered `novel` are
guaranteed-new — `maybe_dup` rows fall back to the exact dedup path.

Compaction: the `"bloom"` family in `streaming/compaction.py` collapses
N flush partials into one via the same algebra; `maybe_compact` bounds
the partials dir for the stream's lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.bloom import bloom_build, bloom_probe
from .ingest import FLUSH_EVERY_SEC, normalize

KEY_COL = "__bloom_key"


def trade_key(df: DataFrame) -> DataFrame:
    """The membership key is the full sort key (ts, symbol, trade_id) —
    the same identity ReplacingMergeTree dedups on."""
    return df.withColumn(
        KEY_COL,
        F.concat_ws(
            "|", F.col("ts").cast("string"), F.col("symbol"), F.col("trade_id")
        ),
    )


def start_bloom_partials(
    raw_stream: DataFrame,
    partials_path: str,
    checkpoint_path: str,
    trigger_sec: int = FLUSH_EVERY_SEC,
) -> StreamingQuery:
    """Per-flush Bloom partial: k salted-md5 positions per row, one
    map-side-partial `bit_or` aggregate, ≤ BLOOM_WORDS rows appended."""

    def flush(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        part = bloom_build(trade_key(batch_df), text_col=KEY_COL)
        part.write.mode("append").parquet(partials_path)

    return (
        normalize(raw_stream)
        .writeStream.foreachBatch(flush)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_sec} seconds")
        .outputMode("append")
        .start()
    )


def merged_filter(spark: SparkSession, partials_path: str) -> DataFrame:
    """The live filter: one `bit_or` hash agg over flushes×words rows."""
    return (
        spark.read.parquet(partials_path)
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )


def seen_status(trades: DataFrame, filt: DataFrame) -> DataFrame:
    """Per-row (ts, symbol, trade_id, status) verdicts for a candidate
    frame: `novel` rows are guaranteed-new (no false negatives);
    `maybe_dup` rows go to the exact dedup path.

    The probe's grouping id is the FULL sort key itself — trade_id alone
    is only unique per symbol, and grouping on it would merge different
    rows' required bits and could report an already-ingested row `novel`
    (the r8 second-review finding: a false negative through the reporting
    key, not the filter)."""
    keyed = trade_key(trades)
    verdicts = bloom_probe(
        keyed.select(F.col(KEY_COL).alias("doc_id"), F.col(KEY_COL)),
        filt,
        text_col=KEY_COL,
    )
    return (
        keyed.select("ts", "symbol", "trade_id", F.col(KEY_COL).alias("doc_id"))
        .join(verdicts, "doc_id")
        .select("ts", "symbol", "trade_id", "status")
    )
