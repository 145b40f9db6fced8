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


def collapse_batch(batch: DataFrame, seq_col: str | None) -> DataFrame:
    """Reduce a CDC micro-batch to ONE row per key — ``scd2_merge``'s
    contract (two changes for one key in one batch would otherwise open
    two is_current=1 versions and corrupt the dimension from then on).

    With ``seq_col`` (a Debezium offset / LSN / file sequence) the LAST
    change per key wins — ``max_by`` on the sequence. Without one there
    is no defensible "latest", so duplicate keys FAIL LOUDLY instead of
    silently picking a row.
    """
    from pyspark.sql import functions as F

    if seq_col is not None:
        return batch.groupBy("key").agg(
            F.max_by("name", F.col(seq_col)).alias("name"),
            F.max_by("acctbal", F.col(seq_col)).alias("acctbal"),
        )
    dups = batch.groupBy("key").count().where("count > 1").limit(1).collect()
    if dups:
        raise ValueError(
            f"CDC batch has multiple rows for key {dups[0]['key']} and no "
            "seq_col to order them; pass seq_col= to start_scd2_apply"
        )
    return batch


# Target on-disk size per output file for the rewritten dimension —
# the usual parquet sweet spot (big enough for efficient scans, small
# enough that one task's write isn't a straggler).
DIM_TARGET_FILE_BYTES = 128 * 1024 * 1024


def _dim_file_count(dim_path: Path) -> int:
    """Output-file count for the rewritten dim, from the CURRENT dim's
    on-disk bytes (a filesystem stat, no Spark job; the merged result is
    the same dimension ± one batch of versions, so current size is an
    accurate predictor). Fixture-sized dims get 1 file — the common
    case; a genuinely large dim degrades to parallel writes instead of
    one straggler task."""
    try:
        size = sum(
            f.stat().st_size for f in dim_path.glob("*.parquet") if f.is_file()
        )
    except OSError:
        size = 0
    return max(1, -(-size // DIM_TARGET_FILE_BYTES))


def apply_scd2_batch(
    dim_path: str,
    batch: DataFrame,
    batch_ts: str,
    seq_col: str | None = None,
    n_files: int | None = None,
) -> None:
    """One CDC apply: merge ``batch`` into the dim at ``dim_path`` and
    swap the result in via ``plans.layout.swap_in`` — the SAME protocol
    and leftover names as ``compact()``, so ``layout.read_table``'s
    auto-heal (``recover_compaction``) covers a crash in this swap's
    window too (the read below goes through it for exactly that reason).

    ``n_files`` sets the rewritten dimension's output-file count;
    default is a size-based heuristic (current dim bytes /
    ``DIM_TARGET_FILE_BYTES``) so small dims stay single-file while a
    large dim writes in parallel."""
    import shutil

    from ..plans import layout

    dest = Path(dim_path)
    dim = layout.read_table(batch.sparkSession, str(dest))
    if n_files is None:
        n_files = _dim_file_count(dest)
    merged = scd2_merge(dim, collapse_batch(batch, seq_col), batch_ts)
    tmp = str(dest) + ".compact.tmp"
    try:
        merged.repartition(n_files).write.mode("overwrite").parquet(tmp)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    layout.swap_in(str(dest), tmp)


def scd2_apply_snapshot(
    dim_path: str,
    batch: DataFrame,
    batch_ts: str,
    seq_col: str | None = None,
) -> int:
    """The transactional SCD2 apply the module docstring deferred to "a
    transactional table format": the snapshot log now IS one, so this seat
    applies a CDC batch through ``plans.snapshots.merge_into`` instead of
    the full-dim rename-swap — closing ROADMAP #5 without Delta/Iceberg.

    The classic MERGE-INTO SCD2 staging (the Databricks pattern) adapted
    to a key-matched merge: the source unions three row kinds, keyed by
    the composite (key, effective_from) so each targets exactly ONE
    version row —

    - CLOSE rows: each changed key's current version, re-keyed by its own
      stored effective_from, carrying its OLD attributes (a no-op update)
      plus effective_to = batch_ts, is_current = 0;
    - OPEN rows: the changed keys' new versions at (key, batch_ts) — no
      target row has that effective_from, so they INSERT;
    - FIRST rows: keys with no dim row at all, also inserting at batch_ts.

    Change detection is the same null-safe any-attribute predicate as
    ``operators.warehouse.scd2_merge`` (equivalence is pytest-gated batch
    by batch), so re-applying a delivered-twice batch stages an empty
    source and the merge no-ops — at-least-once foreachBatch delivery
    stays effectively exactly-once.

    Scale shape vs ``apply_scd2_batch``: the rename-swap rewrites the
    WHOLE dimension every batch; this rewrites only the files holding the
    changed keys' current versions (merge_into's copy-on-write), appends
    the new versions, and history files are never touched again — the
    per-batch write cost is O(changed keys), not O(dimension), and every
    batch is a time-travelable version with no crash window. A same-day
    re-change of a key (old effective_from == batch_ts) would collide the
    close and open rows on the merge key and fails loudly via
    merge_into's duplicate-source-key contract.
    """
    from pyspark.sql import functions as F

    from ..plans import snapshots as S

    spark = batch.sparkSession
    dim = S.read_snapshot(spark, dim_path).drop("p_month")
    upd = collapse_batch(batch, seq_col)
    cur = dim.where(F.col("is_current") == 1)
    changed = (
        cur.alias("d")
        .join(upd.alias("u"), "key")
        .where(
            ~F.col("d.acctbal").eqNullSafe(F.col("u.acctbal"))
            | ~F.col("d.name").eqNullSafe(F.col("u.name"))
        )
    )
    ts = F.lit(batch_ts).cast("timestamp")
    open_end = F.lit(_SCD2_OPEN()).cast("timestamp")
    close_rows = changed.select(
        "key",
        F.col("d.effective_from").alias("effective_from"),
        F.col("d.name").alias("name"),
        F.col("d.acctbal").alias("acctbal"),
        ts.alias("effective_to"),
        F.lit(0).alias("is_current"),
    )
    open_rows = changed.select(
        "key",
        ts.alias("effective_from"),
        F.col("u.name").alias("name"),
        F.col("u.acctbal").alias("acctbal"),
        open_end.alias("effective_to"),
        F.lit(1).alias("is_current"),
    )
    first_rows = upd.join(dim.select("key"), "key", "left_anti").select(
        "key",
        ts.alias("effective_from"),
        "name",
        "acctbal",
        open_end.alias("effective_to"),
        F.lit(1).alias("is_current"),
    )
    source = close_rows.unionByName(open_rows).unionByName(first_rows)
    # merge_into_retry: the only commits that can legally interleave with
    # a CDC apply are row-preserving maintenance (compact/vacuum-era
    # rewrites — Structured Streaming serializes the CDC batches
    # themselves), so re-running the merge against the winner's head with
    # the SAME staged source is correct; the staging values don't depend
    # on file layout.
    return S.merge_into_retry(
        spark,
        dim_path,
        source,
        keys=["key", "effective_from"],
        ts_col="effective_from",
    )


def _SCD2_OPEN() -> str:
    from ..operators.warehouse import SCD2_OPEN

    return SCD2_OPEN


def start_scd2_apply_snapshot(
    updates: DataFrame,
    dim_path: str,
    checkpoint_path: str,
    batch_ts: Callable[[int], str] = default_batch_ts,
    seq_col: str | None = None,
) -> StreamingQuery:
    """Streaming seat of :func:`scd2_apply_snapshot` — same contract as
    :func:`start_scd2_apply`, but each micro-batch lands as one snapshot
    commit (op "merge") on the dimension's transaction log."""
    return (
        updates.writeStream.foreachBatch(
            lambda df, bid: scd2_apply_snapshot(
                dim_path, df, batch_ts(bid), seq_col
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .start()
    )


def start_scd2_apply(
    updates: DataFrame,
    dim_path: str,
    checkpoint_path: str,
    batch_ts: Callable[[int], str] = default_batch_ts,
    seq_col: str | None = None,
    n_files: int | None = None,
) -> StreamingQuery:
    """Launch the CDC-apply query: each micro-batch of (key, name,
    acctbal) updates is SCD2-merged into the parquet dimension.

    ``seq_col`` names an ordering column (Debezium offset / LSN) used to
    collapse multiple changes for one key within a batch to the LAST one;
    without it, duplicate keys in a batch fail loudly (see
    ``collapse_batch``). ``foreachBatch`` gives at-least-once batch
    delivery; the merge itself is idempotent for re-delivered batches
    (change-detecting: re-applying the same values adds no versions —
    property-tested), so the sink is effectively exactly-once for CDC
    streams that re-deliver on recovery.
    """
    return (
        updates.writeStream.foreachBatch(
            lambda df, bid: apply_scd2_batch(
                dim_path, df, batch_ts(bid), seq_col, n_files
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .start()
    )
