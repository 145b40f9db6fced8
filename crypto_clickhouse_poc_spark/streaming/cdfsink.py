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
read-time merge cost is bounded by compaction — :func:`merge_cdf_fn` is
the closed signed-sum merge (registered as the ``cdf`` family in
``streaming/compaction.COMPACTOR_FACTORIES`` and wired into
``plans/maintain.maintenance_tick`` via ``CdfMVSpec``), applied through
``plans/logmv.compact_rollup`` because the rollup is a SNAPSHOT table
(commit-protocol rewrite, rebase-safe under a concurrent stream append).
At 100 TB base scale the rollup's size is O(groups), never O(base), and
compaction keeps reads O(groups) instead of O(flushes).
Contrast with ``plans/logmv``: logmv recomputes
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


def _start_signed_fold(
    spark: SparkSession,
    base_path: str,
    mv_path: str,
    checkpoint_path: str,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    ts_col: str,
    trigger_sec: int,
    app: str,
    enrich=None,
) -> StreamingQuery:
    """The ONE fold/feed body both sinks run (r16 — the two previously
    copy-pasted ~60 lines differing only in the broadcast-join line, so
    a fix applied to one would silently miss the other). ``enrich`` is
    the per-batch change-row transform (None for the plain sink; the
    guarded broadcast dim join for the enriched one)."""
    from ..sources.snapstream import SnapshotCommitsDataSource

    spark.dataSource.register(SnapshotCommitsDataSource)
    sign = F.when(F.col(CDC_TYPE) == "insert", F.lit(1)).otherwise(F.lit(-1))
    recorded = {"props": False}  # once per stream lifetime

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        rows = batch if enrich is None else enrich(batch)
        delta = (
            rows.withColumn(_N, sign)
            .groupBy(*group_cols)
            .agg(
                *[F.sum(F.col(c) * F.col(_N)).alias(c) for c in sum_cols],
                F.sum(_N).alias(_N),
            )
        )
        # one partial-append per micro-batch; (app, batchId) makes the
        # at-least-once foreachBatch delivery exactly-once on the log
        S.append(delta, mv_path, ts_col=ts_col, txn_app=app, txn_id=batch_id)
        if not recorded["props"]:
            # self-describing rollup (r15): record the group/measure
            # split as table properties, so the maintenance compaction
            # seat (plans/maintain.CdfMVSpec) needs no out-of-band
            # config — the split IS part of the table's contract (a
            # wrong one would merge incorrectly, see merge_cdf_fn).
            # On the FIRST NON-EMPTY batch, not batch 0 (an empty
            # bootstrap would otherwise skip it forever — review r15);
            # skipped when already present, so a restart costs one
            # body read, not a commit.
            import json as _json

            if "cdf.group_cols" not in S.table_properties(mv_path):
                S.set_table_properties(
                    mv_path,
                    {
                        "cdf.group_cols": _json.dumps(list(group_cols)),
                        "cdf.sum_cols": _json.dumps(list(sum_cols)),
                        "cdf.time_col": ts_col,
                    },
                )
            recorded["props"] = True

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
    return _start_signed_fold(
        spark, base_path, mv_path, checkpoint_path, group_cols, sum_cols,
        time_col or group_cols[0], trigger_sec, app,
    )


def start_cdf_enriched_sum_rollup(
    spark: SparkSession,
    base_path: str,
    dim: DataFrame,
    mv_path: str,
    checkpoint_path: str,
    join_key: str,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    time_col: str | None = None,
    trigger_sec: int = 0,
    app: str = CDF_APP + "-enriched",
) -> StreamingQuery:
    """The ENRICHED signed fold (r15): each micro-batch's change rows
    join a BROADCAST STATIC dimension on ``join_key`` before folding,
    so the rollup groups by dim attributes (sector rollups from a
    symbol-keyed feed) while staying exact across every change the feed
    represents — a delete joins the same dim row its insert did, so the
    retraction lands in the same group and cancels.

    ``dim`` must be STATIC for the stream's lifetime (materialize it
    with ``localCheckpoint()``; the per-batch join broadcasts it): the
    signed algebra is only exact when enrichment is a pure function of
    the join key. A dimension that UPDATES mid-stream re-maps keys
    between an insert and its retraction and the fold silently drifts —
    that regime is ``plans/joinmv``'s (key-scoped swaps from BOTH
    tables' logs). Inner join: feed rows without a dim match drop, on
    both the insert and the delete leg, symmetrically.

    Scale shape: one broadcast hash join + one map-side-combined
    groupBy per micro-batch over O(change rows); everything else
    (exactly-once watermark, compaction seat, self-describing
    properties, read merge) is inherited from the plain sink.

    The static-dim contract is ENFORCED at runtime (r16 — the r15
    docstring scoped soundness correctly but nothing detected a
    violation, so a caller passing a live-updating dim got silent
    drift): the dim's fingerprint (row count + order-independent
    content hash) is taken at stream start and re-checked before every
    fold; a mutated dim KILLS the stream with a clear error instead of
    drifting. The re-check is one aggregate over the (small,
    broadcastable by contract) dim per micro-batch."""
    fp0 = _dim_fingerprint(dim)

    def enrich(batch: DataFrame) -> DataFrame:
        fp = _dim_fingerprint(dim)
        if fp != fp0:
            raise ValueError(
                f"static-dim contract violated: the dimension changed "
                f"mid-stream (fingerprint {fp0} at start, {fp} now) — "
                "the signed fold is only exact when enrichment is a "
                "pure function of the join key; materialize the dim "
                "(localCheckpoint) for the stream's lifetime, or use "
                "plans/joinmv for a live-updating dimension"
            )
        return batch.join(F.broadcast(dim), join_key, "inner")

    return _start_signed_fold(
        spark, base_path, mv_path, checkpoint_path, group_cols, sum_cols,
        time_col or group_cols[0], trigger_sec, app, enrich=enrich,
    )


def _dim_fingerprint(dim: DataFrame) -> tuple:
    """(row count, order-independent content hash) of the dimension —
    cheap belt for the static-dim guard. Sum-of-row-hashes in
    decimal(38,0) so duplicate rows still register (XOR would cancel
    pairs) and the sum cannot overflow."""
    row = dim.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*dim.columns).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (row.n, row.h)


def merge_cdf_fn(group_cols: Sequence[str], sum_cols: Sequence[str] | None = None):
    """The rollup's CLOSED compaction merge: N signed partials per group
    → one, same schema — reads through :func:`read_cdf_rollup` are
    bit-identical before/after because the read itself is the same sum.
    ``sum_cols`` defaults to every non-group, non-``_n`` column.

    The merge MUST know the group/measure split — a split-blind variant
    (group by every non-``_n`` column) is provably wrong: deletes carry
    NEGATED measures, so ``(g, +x, +1)`` and ``(g, +x, -1)`` can
    legitimately co-occur (a batch with 3 inserts and 4 deletes netting
    +x, −1) and collapsing them by value would halve the group's measure
    sum. Hence the factory shape, and why ``COMPACTORS`` has no fixed
    ``cdf`` entry (see ``streaming/compaction.COMPACTOR_FACTORIES``).

    Fully-retracted groups are DROPPED only when provably invisible to
    every present and future read: net ``_n == 0`` AND every measure sum
    is 0 (or null — null sums add nothing). A group with ``_n == 0`` but
    a float residue in a measure (cross-batch addition-order epsilon) is
    kept — it is already invisible to readers (``_n > 0`` filter) and
    keeping it preserves exact sums if the group is later re-inserted."""

    def merge(partials: DataFrame) -> DataFrame:
        # a snapshot read may expose the engine's internal columns
        # (partition month / txn) — they are rewritten by the compact's
        # own writer, never merged
        partials = partials.drop(S.TXN_COL, S.PARTITION_COL)
        gset = set(group_cols)
        sums = (
            list(sum_cols)
            if sum_cols is not None
            else [c for c in partials.columns if c not in gset and c != _N]
        )
        # fail with a DIAGNOSABLE error, not an AnalysisException
        # mid-maintenance-tick (r16 ADVICE): a spec whose split does not
        # cover the rollup's columns would otherwise abort the tick with
        # an unresolved-column error naming no seat
        missing = [
            c for c in [*group_cols, *sums, _N] if c not in partials.columns
        ]
        unclaimed = [
            c for c in partials.columns
            if c not in gset and c not in sums and c != _N
        ]
        if missing or unclaimed:
            raise ValueError(
                f"cdf merge spec does not match the rollup's columns: "
                f"groups {list(group_cols)} + measures {sums} + {_N!r} vs "
                f"partials {partials.columns} (absent from partials: "
                f"{missing}; unclaimed by the spec: {unclaimed}) — fix "
                "the CdfMVSpec's group_cols/sum_cols, or omit sum_cols "
                "to default to every non-group column"
            )
        merged = partials.groupBy(*group_cols).agg(
            *[F.sum(c).alias(c) for c in sums],
            F.sum(_N).alias(_N),
        )
        dead = F.coalesce(F.col(_N) == 0, F.lit(False))
        for c in sums:
            dead = dead & (F.col(c).isNull() | (F.col(c) == 0))
        return merged.where(~dead).select(*partials.columns)

    return merge


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
