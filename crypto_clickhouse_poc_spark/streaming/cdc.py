"""Streaming CDC apply: dimension updates arriving as a stream, SCD2-merged
into a parquet dimension table per micro-batch.

The production seat of ``operators.warehouse.scd2_merge``: a CDC feed
(Debezium topic, change files, a replicated WAL) lands as a stream of
(key, attrs) rows; each micro-batch is merged into the dimension with
type-2 versioning. With no transactional table format in this environment
(no Delta MERGE), the apply is the plain-parquet pattern:

  read current dim → scd2_merge(dim, batch) → write to a temp dir →
  rename-swap (same rename-aside protocol as ``plans.layout.compact``,
  same documented crash window + ``recover_compaction`` healing).

Scale notes: the rewrite is proportional to the DIMENSION, not the stream
— dimensions are the small side of a warehouse (the 100 TB lives in
facts), and SCD2-versioned dims are bounded by entity count × change
rate. A deployment with a genuinely huge dimension graduates to a
transactional format (Delta/Iceberg MERGE) — the merge ALGEBRA
(``scd2_merge``) is unchanged, only the sink swaps. Batch effective
timestamps come from a deterministic ``batch_ts(batch_id)`` callable so
replays version identically (never wall-clock).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.warehouse import scd2_merge


def default_batch_ts(batch_id: int) -> str:
    """Deterministic per-batch effective_from: T1 + batch_id days —
    REAL calendar arithmetic, not string templating (a fabricated
    '2024-02-30' would cast to a NULL timestamp and silently corrupt the
    SCD2 intervals once a stream passes ~29 batches)."""
    from datetime import datetime, timedelta

    t = datetime(2024, 2, 1) + timedelta(days=batch_id)
    return t.strftime("%Y-%m-%d %H:%M:%S")


def apply_scd2_batch(dim_path: str, batch: DataFrame, batch_ts: str) -> None:
    """One CDC apply: merge ``batch`` into the dim at ``dim_path`` and
    swap the result in via rename-aside — the SAME leftover names and
    protocol as ``plans.layout.compact``, so ``layout.read_table``'s
    auto-heal (``recover_compaction``) covers a crash in this swap's
    window too (read path below uses it for exactly that reason)."""
    from ..plans import layout

    dest = Path(dim_path)
    dim = layout.read_table(batch.sparkSession, str(dest))
    merged = scd2_merge(dim, batch, batch_ts)
    tmp = str(dest) + ".compact.tmp"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    old = Path(str(dest) + ".compact.old")
    import shutil

    # a crash AFTER the swap but before cleanup leaves a stale non-empty
    # .compact.old; without this guard the rename below raises ENOTEMPTY
    # on every later batch (compact() carries the same guard, layout.py)
    shutil.rmtree(old, ignore_errors=True)
    dest.rename(old)
    try:
        Path(tmp).rename(dest)
    except OSError:  # pragma: no cover - crash-window mirror of compact()
        old.rename(dest)
        raise
    shutil.rmtree(old, ignore_errors=True)


def start_scd2_apply(
    updates: DataFrame,
    dim_path: str,
    checkpoint_path: str,
    batch_ts: Callable[[int], str] = default_batch_ts,
) -> StreamingQuery:
    """Launch the CDC-apply query: each micro-batch of (key, name,
    acctbal) updates is SCD2-merged into the parquet dimension.

    ``foreachBatch`` gives at-least-once batch delivery; the merge itself
    is idempotent for re-delivered batches (change-detecting: re-applying
    the same values adds no versions — property-tested), so the sink is
    effectively exactly-once for CDC streams that re-deliver on recovery.
    """
    return (
        updates.writeStream.foreachBatch(
            lambda df, bid: apply_scd2_batch(dim_path, df, batch_ts(bid))
        )
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .start()
    )
