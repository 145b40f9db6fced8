"""Log-driven incremental materialized-view maintenance.

The lakehouse counterpart of the socket-fed MV in ``streaming/bars.py``
(reference parity anchor: the reference's ClickHouse incremental MV,
``clickhouse/schema.sql`` AggregatingMergeTree + TO-table MV — here
re-expressed over the repo's own snapshot log instead of a hosted
engine): a rollup table is kept current by consuming the BASE table's
transaction log, not by re-scanning the base. Each refresh

1. reads the idempotent-writer watermark the MV's own manifest carries
   (``last_txn`` — the Delta (appId, batchId) protocol, O(1) from the
   head) to learn the last base version it folded in,
2. pulls exactly the delta with :func:`plans.snapshots.read_changes`
   (O(new files) — storage is never listed, old data never re-read),
3. partial-aggregates the delta (map-side combine shapes the shuffle to
   ~|groups touched by the delta|, not delta rows) and APPENDS the
   partials to the MV snapshot table, stamping ``txn=(app, base_head)``
   in the same atomic commit — consuming the delta and recording that it
   was consumed are one transaction, so a crashed/replayed refresh is
   detected by the watermark and skipped (exactly-once, no sidecar
   checkpoint files).

Reads merge partials at query time (the proven mergeable-partials
algebra of ``streaming/bars.reaggregate_bars``); :func:`compact_rollup`
folds accumulated partials into one row per group — the partial algebra
is CLOSED under merge, so compaction is semantics-free and the MV's
read cost stays bounded by |groups|, not refresh count.

When the base range contains a NON-append op (compaction, retention,
rollback — visibility rewrites where "files added" stops meaning "rows
added"), ``read_changes`` refuses and :func:`refresh_rollup` falls back
to :func:`rebuild_rollup`: one full recompute committed atomically with
the new watermark — the same degradation contract Delta CDF consumers
implement.

Scale notes (100 TB): steady-state refresh cost is O(delta), the rollup
table is |minutes x symbols| (bounded, tiny next to the fact table), and
the only shuffle is the partial-agg's group-key exchange over the
delta's combined partials. The rebuild path is the only O(base) op and
fires exactly when an O(base) rewrite already happened to the base.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..streaming.bars import partial_bars, reaggregate_bars
from . import snapshots as S

# Struct merge keys (open_key/close_key) carried by the partials: the
# deterministic (ts, trade_id) total order that makes open/close exact
# under any refresh batching (streaming/bars.py's partials contract).
_MERGE_COLS = ("open_key", "close_key")


def _merge_partials(partials: DataFrame) -> DataFrame:
    """partial x partial -> partial (closed): fold many partial rows per
    (minute, symbol) into one, KEEPING the merge keys so the result can
    be merged again by later refreshes."""
    from pyspark.sql import functions as F

    return partials.groupBy("minute", "symbol").agg(
        F.min_by("open", F.col("open_key")).alias("open"),
        F.min_by(F.col("open_key"), F.col("open_key")).alias("open_key"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", F.col("close_key")).alias("close"),
        F.max_by(F.col("close_key"), F.col("close_key")).alias("close_key"),
        F.sum("volume").alias("volume"),
        F.sum("trades").alias("trades"),
    )


def refresh_rollup(
    spark: SparkSession,
    base_path: str,
    mv_path: str,
    partial_fn: Callable[[DataFrame], DataFrame] = partial_bars,
    app: str = "logmv",
) -> int | None:
    """Fold the base table's new commits into the rollup MV.

    Returns the MV version committed, or ``None`` when the MV is already
    at the base head (the polling steady state). Safe to call from a
    crashed/replayed scheduler: the watermark check inside ``append``
    makes a duplicate refresh a detected no-op. Safe under CONCURRENT
    refreshers too: the commit re-validates the watermark against the
    winning head, so the loser raises
    :class:`plans.snapshots.CommitConflict` (its orphan txn dir is
    vacuum's to sweep) instead of double-counting the delta.
    """
    head = S.latest_version(base_path)
    if head is None:
        raise FileNotFoundError(f"no snapshots at {base_path}")
    consumed = S.last_txn(mv_path, app)
    since = -1 if consumed is None else consumed
    if head <= since:
        return None
    try:
        delta = S.read_changes(spark, base_path, since, head)
    except ValueError:
        # non-append op in the range: incremental read undefined -> one
        # atomic full rebuild, watermark moved in the same commit
        return rebuild_rollup(spark, base_path, mv_path, partial_fn, app)
    # txn_expect=consumed is the exact compare-and-set: this delta is
    # (consumed, head], so it may land ONLY onto the watermark it was
    # computed from — a concurrent refresher that consumed from a
    # different head would otherwise slip past the monotone check with a
    # higher id and fold the overlapping range twice
    return S.append(
        partial_fn(delta),
        mv_path,
        ts_col="minute",
        txn_app=app,
        txn_id=head,
        txn_expect=consumed,
    )


def rebuild_rollup(
    spark: SparkSession,
    base_path: str,
    mv_path: str,
    partial_fn: Callable[[DataFrame], DataFrame] = partial_bars,
    app: str = "logmv",
) -> int:
    """Full recompute committed as ONE manifest swap: the new partials
    replace every prior MV file, deletes are cleared (the rewrite read
    through them), and the watermark jumps to the base head — readers of
    older MV versions keep their files (time travel intact), vacuum
    sweeps them after retention. ``txn_expect="force"`` because a
    total-replacement commit cannot double-count whatever the watermark
    was (including the forced-rebuild-of-a-current-MV case, where the
    re-stamped head EQUALS the watermark); the base read is PINNED to
    the captured head so a base append landing mid-rebuild is left for
    the next refresh instead of being folded in beyond the watermark."""
    head = S.latest_version(base_path)
    if head is None:
        raise FileNotFoundError(f"no snapshots at {base_path}")
    partials = partial_fn(S.read_snapshot(spark, base_path, version=head))
    entries = S._write_txn(partials, mv_path, ts_col="minute")
    return S._commit(
        mv_path,
        lambda _hf: entries,
        "rebuild",
        txn=(app, head),
        txn_expect="force",
        dvs_fn=lambda _d: [],
        eq_dvs_fn=lambda _e, _v: [],
    )


def read_rollup(
    spark: SparkSession,
    mv_path: str,
    version: int | None = None,
    final_fn: Callable[[DataFrame], DataFrame] = reaggregate_bars,
) -> DataFrame:
    """The MV's query surface: merge partials at read time. Equals
    ``bars_batch`` over the base snapshot the watermark points at.
    An MV maintained with a custom ``partial_fn`` must supply the
    matching ``final_fn`` (the three algebra callables — partial, merge,
    final — travel together; mixing families corrupts silently)."""
    return final_fn(S.read_snapshot(spark, mv_path, version=version))


def compact_rollup(
    spark: SparkSession,
    mv_path: str,
    merge_fn: Callable[[DataFrame], DataFrame] = _merge_partials,
) -> int:
    """Fold accumulated partial rows into one partial per group with
    ``merge_fn`` (default: the bars partial x partial algebra — an MV
    with a custom ``partial_fn`` must supply its own closed merge).
    Reads before and after are IDENTICAL (gated in tests); only the
    partial-row count changes, so a weekly compact bounds read-time
    merge work regardless of refresh cadence. Any deletion vectors on
    the MV are materialized by the rewrite (the read applies them), so
    their entries are cleared like compact_snapshot does. Conflicts with
    an interleaved refresh surface as
    :class:`plans.snapshots.CommitConflict` — re-run after it."""
    read_v = S.latest_version(mv_path)
    if read_v is None:
        raise FileNotFoundError(f"no snapshots at {mv_path}")
    merged = merge_fn(S.read_snapshot(spark, mv_path, version=read_v))
    entries = S._write_txn(merged, mv_path, ts_col="minute")
    return S._commit(
        mv_path,
        lambda _hf: entries,
        "compact",
        expected_parent=read_v,
        dvs_fn=lambda _d: [],
        eq_dvs_fn=lambda _e, _v: [],
    )
