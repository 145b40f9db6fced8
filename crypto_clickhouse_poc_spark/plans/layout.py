"""Physical table layout: the Spark equivalent of the reference's engine clauses.

Reference DDL (``sql/V1__create_trades_table.sql:13-20``) encodes four
physical behaviors; each maps to a layout decision here (survey §4):

- ``PARTITION BY toYYYYMM(ts)``          → parquet partition column ``p_month``
  (``date_format(ts,'yyyyMM')``) + a query-rewrite helper that adds the
  p_month predicate for any ts range → partition pruning.
- ``ORDER BY (ts, symbol, trade_id)``    → ``sortWithinPartitions`` on write
  → parquet row-group min/max stats give granule-skipping-equivalent scans.
- ``ENGINE = ReplacingMergeTree(ingested_at)`` → ``dedup_view`` (read-time,
  row_number over the sort key keeping max ingested_at) + ``compact``
  (the background-merge analog that materializes the dedup).
- ``TTL ts + INTERVAL 90 DAY DELETE``    → ``apply_retention`` (partition
  drop — O(#partitions), never a data rewrite).

At 100 TB: monthly partitions keep partition counts sane (~120 over 10
years); within a partition, files are sorted by ts so every lookback query
reads a suffix of row groups. Writes are append-only; compaction rewrites
one partition at a time.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PARTITION_COL = "p_month"


def with_partition_col(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Derive the monthly partition column (reference toYYYYMM)."""
    return df.withColumn(PARTITION_COL, F.date_format(F.col(ts_col), "yyyyMM"))


def write_table(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str] = ("ts", "symbol", "trade_id"),
    ts_col: str = "ts",
    mode: str = "append",
) -> None:
    """Write with the trades layout: month-partitioned, sorted within files."""
    (
        with_partition_col(df, ts_col)
        .repartition(F.col(PARTITION_COL))
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .partitionBy(PARTITION_COL)
        .parquet(path)
    )


def read_table(spark: SparkSession, path: str) -> DataFrame:
    # auto-heal a table caught in compact()'s rename window: if the live
    # path is gone but compaction leftovers exist, recovery is always the
    # right move (and a no-op stat check on the healthy path)
    if not Path(path).exists() and (
        Path(path.rstrip("/") + ".compact.old").exists()
        or Path(path.rstrip("/") + ".compact.tmp").exists()
    ):
        recover_compaction(path)
    return spark.read.parquet(path)


def month_pruned(df: DataFrame, ts_lo, ts_hi=None) -> DataFrame:
    """Add the partition predicate for a ts range (the X1 rewrite helper).

    Catalyst prunes on ``p_month`` (a partition column); the ts predicate
    then prunes row groups within surviving partitions.
    """
    out = df.where(F.col(PARTITION_COL) >= F.date_format(F.lit(ts_lo), "yyyyMM")).where(
        F.col("ts") >= F.lit(ts_lo)
    )
    if ts_hi is not None:
        out = out.where(F.col(PARTITION_COL) <= F.date_format(F.lit(ts_hi), "yyyyMM")).where(
            F.col("ts") <= F.lit(ts_hi)
        )
    return out


def dedup_view(
    df: DataFrame,
    keys: Sequence[str] = ("ts", "symbol", "trade_id"),
    version_col: str = "ingested_at",
) -> DataFrame:
    """Read-time ReplacingMergeTree semantics: latest version per sort key.

    Window argmax (row_number=1 over version desc) — one shuffle on the key.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    )


def compact(
    spark: SparkSession,
    path: str,
    keys: Sequence[str] = ("ts", "symbol", "trade_id"),
    version_col: str = "ingested_at",
    sort_cols: Sequence[str] = ("ts", "symbol", "trade_id"),
) -> None:
    """Background-merge analog: rewrite the table with duplicates collapsed
    and files re-sorted (also fixes small-file accumulation from streaming).

    Local-mode implementation rewrites the whole table via a temp dir; a
    cluster deployment runs this per-partition (only partitions with new
    files since last compaction).

    Crash window: between the two renames below the table path IS briefly
    absent — a hard crash there leaves the data intact in ``.compact.old``
    (and the finished rewrite in ``.compact.tmp``) but nothing at the live
    path. Run :func:`recover_compaction` at startup to heal that state;
    readers holding an already-resolved file listing across the swap must
    retry on FileNotFound, as with any non-transactional parquet layout
    (a table format with a metadata pointer — e.g. open-source
    Delta/Iceberg — removes this window entirely; out of scope here).
    """
    df = dedup_view(spark.read.parquet(path), keys, version_col)
    tmp = path.rstrip("/") + ".compact.tmp"
    try:
        (
            df.repartition(F.col(PARTITION_COL))
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .partitionBy(PARTITION_COL)
            .parquet(tmp)
        )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    swap_in(path, tmp)


def swap_in(path: str, tmp: str) -> None:
    """Rename-aside swap: promote the fully-written ``tmp`` dir to ``path``.

    NOT atomic end-to-end: after dest.rename(old) and before
    tmp.rename(dest) the live path is briefly absent; an in-process
    failure rolls back below, a hard crash is healed by
    :func:`recover_compaction` from the .compact.old/.compact.tmp
    leftovers. The ONE copy of this protocol — compact() and the CDC
    SCD2 sink both swap through here so the guards (stale-old cleanup,
    BaseException rollback) and the leftover-naming contract stay in
    sync.
    """
    dest = Path(path)
    old = Path(path.rstrip("/") + ".compact.old")
    shutil.rmtree(old, ignore_errors=True)
    dest.rename(old)
    try:
        Path(tmp).rename(dest)
    except BaseException:
        old.rename(dest)  # roll back: old copy goes live again
        raise
    shutil.rmtree(old)


def recover_compaction(path: str) -> str | None:
    """Heal a table that crashed mid-:func:`compact` swap. Idempotent; call
    at startup before serving the table.

    - live path present → compaction completed (or never ran): drop any
      leftover ``.compact.old`` / ``.compact.tmp`` and return None.
    - live path absent, ``.compact.tmp`` complete → promote the finished
      rewrite (the crash was between the two renames, after a full write);
      returns "promoted_tmp".
    - live path absent, only ``.compact.old`` → restore the pre-compaction
      copy; returns "restored_old".
    """
    dest = Path(path)
    old = Path(path.rstrip("/") + ".compact.old")
    tmp = Path(path.rstrip("/") + ".compact.tmp")
    if dest.exists():
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        return None
    # _SUCCESS marks a completed Spark write — a partial tmp is never promoted.
    # Renames tolerate a concurrent healer (two readers can both observe the
    # live path absent): the rename loser's OSError is success as long as the
    # live path exists by then — mirrors trades._layout_table's rename-loser
    # handling.
    if tmp.exists() and (tmp / "_SUCCESS").exists():
        try:
            tmp.rename(dest)
        except OSError:
            if not dest.exists():
                raise
        shutil.rmtree(old, ignore_errors=True)
        return "promoted_tmp"
    if old.exists():
        try:
            old.rename(dest)
        except OSError:
            if not dest.exists():
                raise
        shutil.rmtree(tmp, ignore_errors=True)
        return "restored_old"
    if dest.exists():  # a concurrent healer finished while we were looking
        return None
    raise FileNotFoundError(f"no table and no compaction leftovers at {path}")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: pre-shuffled storage for co-located joins.

    Both fact tables bucketed on the join key with the same bucket count →
    Catalyst plans the join with NO Exchange on either side (each task reads
    matching bucket files). This is the zero-shuffle orders ⋈ lineitem
    layout the module docstring promises; at 100 TB it converts the
    biggest recurring shuffle in the workload into a pure scan.
    (``bucketBy`` requires ``saveAsTable`` — bucket metadata lives in the
    catalog, not in parquet.)
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def apply_retention(path: str, cutoff_month: str) -> list[str]:
    """TTL analog: drop whole month partitions older than ``cutoff_month``
    (yyyyMM string). Returns dropped partition names. O(#partitions) —
    never touches surviving data.
    """
    dropped = []
    for p in sorted(Path(path).glob(f"{PARTITION_COL}=*")):
        month = p.name.split("=", 1)[1]
        if month < cutoff_month:
            shutil.rmtree(p)
            dropped.append(p.name)
    return dropped
