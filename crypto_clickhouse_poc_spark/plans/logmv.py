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

When the base range contains a NON-append op, the refresh dispatches on
what the ops MEAN (r10, the Delta-CDF-consumer contract):
writer-flagged layout-only commits (``data_change=False`` — bin-packing
optimize, an MV's algebra-preserving partial compaction) change no
logical rows, so the CDC feed
(:func:`plans.snapshots.read_changes_cdc`) carries just the appended
data and ANY algebra advances the watermark; deleting ops (position-DV
delete, equality delete, retention, merge) emit retraction rows that an
INVERTIBLE algebra (:func:`partial_sums` — sum/count form a group under
addition; CMS cells share the property) absorbs as negative partials in
the same watermarked commit. Non-invertible algebras facing deletes,
and genuine visibility rewrites — the DEDUPING ``compact_snapshot``
(its dedup_view can drop stale duplicate-key rows from the raw row
set), rollback, rebuild — fall back to :func:`rebuild_rollup`: one full
recompute committed atomically with the new watermark.

Scale notes (100 TB): steady-state refresh cost is O(delta), the rollup
table is |minutes x symbols| (bounded, tiny next to the fact table), and
the only shuffle is the partial-agg's group-key exchange over the
delta's combined partials. The rebuild path is the only O(base) op and
fires exactly when an O(base) rewrite already happened to the base.
"""

from __future__ import annotations

import datetime as _dt
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.bars import partial_bars, reaggregate_bars
from . import snapshots as S

_warned_scope_key: set[str] = set()


def _warn_scope_key_once(base_path: str, cols: list[str]) -> None:
    """One warning per base table per process: the manifest carries key
    stats for a group column but the refresh was not told to use them."""
    if base_path in _warned_scope_key:
        return
    _warned_scope_key.add(base_path)
    import warnings

    warnings.warn(
        f"base table {base_path!r} is key-clustered (manifest has "
        f"[min,max] stats for group column(s) {cols}) but the scoped "
        "refresh was not passed scope_key_col — it will scan the "
        "affected groups' full time-slice width. Pass "
        f"scope_key_col={cols[0]!r} if partial_fn passes that column "
        "through unchanged to enable file-level pruning.",
        stacklevel=3,
    )

# fall back to rebuild when a delete touches more groups than this: the
# affected-key set is driver-collected (for the scope bounds and the
# eq-delete key file) and broadcast into the scoped semi-joins, and past
# this size a pruned re-aggregation stops being meaningfully cheaper than
# one full recompute anyway
MAX_SCOPED_GROUPS = 65_536

# how much base-row time one group time value spans (a "minute" group
# folds rows with ts in [minute, minute + 1min)): the scoped recompute
# prunes the base scan to [min group, max group + bucket), then the
# group semi-join makes the row set exact — the bucket only has to be an
# UPPER bound on the span for pruning to stay a pure optimization
_MINUTE = _dt.timedelta(minutes=1)

# Struct merge keys (open_key/close_key) carried by the partials: the
# deterministic (ts, trade_id) total order that makes open/close exact
# under any refresh batching (streaming/bars.py's partials contract).
_MERGE_COLS = ("open_key", "close_key")


def _merge_partials(partials: DataFrame) -> DataFrame:
    """partial x partial -> partial (closed): fold many partial rows per
    (minute, symbol) into one, KEEPING the merge keys so the result can
    be merged again by later refreshes."""
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


# --- The multi-resolution cascade (r10): the 1m→1h rollup maintained from
# the 1m MV's OWN transaction log. The bars partial algebra is CLOSED under
# merge and hour groups are unions of minute groups, so the hour partials of
# a DELTA of minute partials merge exactly — the cascade is just
# refresh_rollup with the 1m MV as base and this partial_fn; end-to-end the
# multires view (ev_ohlcv_multires's semantics) becomes incremental at every
# level instead of batch-recomputed. A compact_rollup on the 1m MV is a
# layout op (CDC no-change), so the cascade's watermark rides through it;
# only a 1m rebuild forces an (already O(|1m groups|), not O(trades))
# cascade rebuild.


def _hour_merge_aggs() -> list:
    return [
        F.min_by("open", F.col("open_key")).alias("open"),
        F.min_by(F.col("open_key"), F.col("open_key")).alias("open_key"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", F.col("close_key")).alias("close"),
        F.max_by(F.col("close_key"), F.col("close_key")).alias("close_key"),
        F.sum("volume").alias("volume"),
        F.sum("trades").alias("trades"),
    ]


def hour_partials(minute_partials: DataFrame) -> DataFrame:
    """1m partial rows -> 1h partial rows (merge keys kept: closed, so
    later cascade refreshes and compacts keep merging exactly)."""
    return minute_partials.groupBy(
        F.date_trunc("hour", F.col("minute")).alias("hour"), "symbol"
    ).agg(*_hour_merge_aggs())


def merge_hour_partials(partials: DataFrame) -> DataFrame:
    """Closed partial x partial merge for ``compact_rollup`` of the 1h MV."""
    return partials.groupBy("hour", "symbol").agg(*_hour_merge_aggs())


def reaggregate_hours(partials: DataFrame) -> DataFrame:
    """Read-time merge of 1h partials -> final hour bars (equals the batch
    hour-truncated OHLCV over the raw trades — gated in tests)."""
    return partials.groupBy("hour", "symbol").agg(
        F.min_by("open", F.col("open_key")).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", F.col("close_key")).alias("close"),
        F.sum("volume").alias("volume"),
        F.sum("trades").alias("trades"),
    )


def refresh_cascade(
    spark: SparkSession, mv_1m_path: str, mv_1h_path: str, app: str = "logmv-1h"
) -> int | None:
    """One cascade tick: fold the 1m MV's new partial rows into the 1h
    rollup — O(new 1m partials), never a re-read of the 1m MV (let alone
    the trades base). Exactly-once end to end: the 1h watermark is the 1m
    MV VERSION consumed, committed atomically with the hour partials,
    same as every other rollup. A scoped refresh on the 1m MV (an
    erasure swapping minute partials via ``upsert``) CASCADES scoped:
    the 1m log's upsert is a CDC-covered deleting op, so this refresh
    recomputes only the affected HOUR groups from the 1m head — the
    scope knobs below are the hour algebra's (base rows are minute
    partials, one hour group spans an hour of them)."""
    return refresh_rollup(
        spark,
        mv_1m_path,
        mv_1h_path,
        partial_fn=hour_partials,
        app=app,
        ts_col="hour",
        group_cols=("hour", "symbol"),
        scope_ts_col="minute",
        scope_bucket=_dt.timedelta(hours=1),
    )


# --- The invertible (retractable) algebra family: sum/count partials form
# a GROUP under addition (negate = multiply by -1), so a delete on the base
# is absorbed by appending negative partials — the abelian-group condition
# streaming engines state for retractable aggregates; the same property CMS
# cells have (operators/cms.py) and min/max/open/close do NOT.


def partial_sums(batch: DataFrame) -> DataFrame:
    """Per-(minute, symbol) volume/trade-count partials — the invertible
    counterpart of ``partial_bars`` (same trades input schema)."""
    return batch.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("minute"), "symbol"
    ).agg(F.sum("qty").alias("volume"), F.count("*").alias("trades"))


def negate_sums(partials: DataFrame) -> DataFrame:
    """partial -> inverse partial: appending ``negate_sums(partial_sums(
    deleted_rows))`` exactly cancels those rows' prior contribution."""
    return partials.withColumn("volume", -F.col("volume")).withColumn(
        "trades", -F.col("trades")
    )


def merge_sums(partials: DataFrame) -> DataFrame:
    """Closed partial x partial merge for :func:`compact_rollup`. Groups
    whose counts net to zero were fully retracted — their zero rows are
    dropped (absent group ≡ zero partials; a future insert re-creates it)."""
    return (
        partials.groupBy("minute", "symbol")
        .agg(F.sum("volume").alias("volume"), F.sum("trades").alias("trades"))
        .where(F.col("trades") != 0)
    )


def final_sums(partials: DataFrame) -> DataFrame:
    """Read-time merge for the sums MV: groups that net to zero rows are
    fully deleted and must not surface as zero-valued bars."""
    return (
        partials.groupBy("minute", "symbol")
        .agg(F.sum("volume").alias("volume"), F.sum("trades").alias("trades"))
        .where(F.col("trades") > 0)
    )


def refresh_rollup(
    spark: SparkSession,
    base_path: str,
    mv_path: str,
    partial_fn: Callable[[DataFrame], DataFrame] = partial_bars,
    app: str = "logmv",
    negate_fn: Callable[[DataFrame], DataFrame] | None = None,
    ts_col: str = "minute",
    group_cols: Sequence[str] | None = None,
    scope_ts_col: str = "ts",
    scope_bucket: _dt.timedelta = _MINUTE,
    max_scoped_groups: int = MAX_SCOPED_GROUPS,
    scope_key_col: str | None = None,
    max_scoped_frac: float = 0.5,
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

    Range dispatch (r10/r12 — Delta-CDF-consumer semantics):

    - uninitialized MV → :func:`rebuild_rollup` immediately (one snapshot
      read of current visibility; replaying full history through CDC
      computes the same state for strictly more work — and the dispatch
      itself must not pay an O(history) metadata scan first, r11 ADVICE);
    - all appends → the O(delta) fast path (:func:`snapshots.read_changes`,
      zero manifest splices beyond the range ends);
    - writer-flagged layout-only commits on top (``data_change=False``:
      optimize, MV partial compaction) → the CDC feed, whose insert rows
      are exactly the appended data: ANY algebra consumes it, the
      watermark advances, NO rebuild (previously every layout op on the
      base forced one);
    - deleting ops in range (delete / eq_delete / retention / merge /
      upsert) AND ``negate_fn`` given → CDC with RETRACTIONS: the MV
      appends ``partial_fn(inserts) ∪ negate_fn(partial_fn(deletes))``
      in one watermarked commit. Requires an INVERTIBLE partial algebra
      (sum/count/CMS-cell — :func:`partial_sums`/:func:`negate_sums`);
    - deleting ops WITHOUT ``negate_fn`` (min/max/open/close partials
      cannot retract) → the GROUP-SCOPED path (r12): the CDC delete rows
      name exactly which ``group_cols`` groups changed, so re-aggregate
      ONLY those groups from the pinned base head (scan pruned to the
      groups' time span via footer stats, then an exact group semi-join)
      and swap their stale partials in ONE atomic
      :func:`snapshots.upsert_by_keys` commit — erasure on a bars MV
      costs O(deleted groups' rows), not O(base). Falls back to
      :func:`rebuild_rollup` past ``max_scoped_groups`` (the key set is
      driver-collected and broadcast; beyond that a pruned re-aggregation
      stops beating one recompute). The merge leg rides the row-precise
      CDC diff (``precise_merge=True``), so a ``merge_into`` that
      logically changed k rows scopes to those rows' groups — a
      layout-only rewrite scopes to zero and degenerates to an append;
    - genuine visibility rewrites (deduping compact / rollback /
      rebuild) → one atomic :func:`rebuild_rollup`.

    Scoped-path knobs (ignored elsewhere): ``group_cols`` is the partial
    algebra's grouping key and its FIRST element must be the MV's
    time-bucket column (timestamp/date dtype — enforced at refresh time):
    the scoped path prunes the pinned-head scan on min/max of
    ``group_cols[0]``. Default ``(ts_col, "symbol")`` — the bars family.
    ``scope_ts_col`` is the BASE rows' time column; ``scope_bucket`` an
    upper bound on one group time value's span in base time (1 minute for
    minute bars; pass 1 hour when cascading from a minute-grained MV).
    ``scope_key_col`` (r13, opt-in) names a group column that passes
    through ``partial_fn`` UNCHANGED from the base column of the SAME
    name (true for "symbol" in the bars family; NOT true for derived
    keys like upper(symbol) — declaring one of those would misprune):
    the pinned-head scan then also prunes at the FILE level on the
    affected groups' key values via the manifest stats a
    ``cluster_cols`` write records — on a key-clustered base, an
    erasure touching one symbol reads that symbol's files only, not the
    full width of the time slice."""
    head = S.latest_version(base_path)
    if head is None:
        raise FileNotFoundError(f"no snapshots at {base_path}")
    consumed = S.last_txn(mv_path, app)
    since = -1 if consumed is None else consumed
    if head <= since:
        return None
    if consumed is None:
        # an UNINITIALIZED MV over a base with history: one snapshot read
        # of current visibility IS the cheap path — hoisted ABOVE the
        # changed_meta scan so first materialization pays zero per-version
        # metadata reads over a long history (r11 ADVICE)
        return rebuild_rollup(
            spark, base_path, mv_path, partial_fn, app, ts_col=ts_col
        )
    meta = S.changed_meta(base_path, since, head)
    # data_change=False commits (optimize, MV partial compaction) are
    # writer-declared layout-only — invisible to every dispatch decision
    ops = {op for op, dc in meta if dc}
    deleting = ops & set(S._CDC_DELETING)
    if all(op == "append" for op, _ in meta):
        # pure-append range (no layout commits at all): the cheapest path
        # — zero per-version manifest loads beyond the two range ends
        delta = S.read_changes(spark, base_path, since, head)
        parts = partial_fn(delta)
    elif not ops <= set(S._CDC_COVERED):
        # visibility rewrite in range -> one full recompute, watermark
        # moved in the same commit
        return rebuild_rollup(
            spark, base_path, mv_path, partial_fn, app, ts_col=ts_col
        )
    elif deleting and negate_fn is None:
        return _refresh_scoped(
            spark,
            base_path,
            mv_path,
            partial_fn,
            app,
            ts_col,
            head,
            consumed,
            group_cols=tuple(group_cols or (ts_col, "symbol")),
            scope_ts_col=scope_ts_col,
            scope_bucket=scope_bucket,
            max_scoped_groups=max_scoped_groups,
            scope_key_col=scope_key_col,
            max_scoped_frac=max_scoped_frac,
            # r13: ranges containing a partition OVERWRITE derive the
            # affected groups from the FILE-level CDC — the row-precise
            # multiset diff is a WIDE full-row shuffle over the whole
            # rewritten month (probe: 4.6x at 10x base, worse than
            # rebuild), while the imprecise delete rows cost one NARROW
            # map-side-combined pass and only widen the scope to the
            # overwritten months' groups, which is exactly the
            # file-level truth of a backfill. Merge ranges keep the
            # precise diff: their rewritten files hold mostly unrelated
            # rows, so precision is what keeps the scope small.
            precise="overwrite" not in ops,
        )
    else:
        cdc = S.read_changes_cdc(spark, base_path, since, head)
        ins = cdc.where(F.col(S.CDC_TYPE) == "insert").drop(
            S.CDC_TYPE, S.CDC_VERSION
        )
        parts = partial_fn(ins)
        if deleting:
            dels = cdc.where(F.col(S.CDC_TYPE) == "delete").drop(
                S.CDC_TYPE, S.CDC_VERSION
            )
            parts = parts.unionByName(negate_fn(partial_fn(dels)))
    # txn_expect=consumed is the exact compare-and-set: this delta is
    # (consumed, head], so it may land ONLY onto the watermark it was
    # computed from — a concurrent refresher that consumed from a
    # different head would otherwise slip past the monotone check with a
    # higher id and fold the overlapping range twice
    return S.append(
        parts,
        mv_path,
        ts_col=ts_col,
        txn_app=app,
        txn_id=head,
        txn_expect=consumed,
    )


def _collect_utc(v):
    """A ``collect()``-ed TimestampType value (OS-local naive) as the
    UTC-naive instant ``read_snapshot``'s ts_range bounds expect — the
    exact inverse of PySpark's ``fromtimestamp`` conversion. Identity on
    a UTC driver; non-timestamp group time values pass through."""
    if isinstance(v, _dt.datetime) and v.tzinfo is None:
        return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return v


def _refresh_scoped(
    spark: SparkSession,
    base_path: str,
    mv_path: str,
    partial_fn: Callable[[DataFrame], DataFrame],
    app: str,
    ts_col: str,
    head: int,
    consumed: int,
    group_cols: tuple,
    scope_ts_col: str,
    scope_bucket: _dt.timedelta,
    max_scoped_groups: int,
    scope_key_col: str | None = None,
    max_scoped_frac: float = 0.5,
    precise: bool = True,
) -> int:
    """The non-invertible delete leg: recompute ONLY the groups the CDC
    delete rows name, swap their partials atomically (see
    :func:`refresh_rollup`'s dispatch docs). The merge leg is read
    row-precise so an unchanged row carried through a rewrite scopes
    nothing; ``precise=False`` (overwrite ranges) takes the file-level
    delete rows instead — a SUPERSET of the truly-changed groups, which
    only widens the (exact) recompute, never the answer."""
    if not precise:
        # r17 dispatch shortcut for overwrite ranges, driver-side and
        # before any Spark job: the file-level CDC's delete rows are ALL
        # rows of the removed files, so the manifest's per-file row
        # counts bound the fraction of the base a "scoped" recompute
        # would re-aggregate. When the rewrite replaced >= the fraction
        # threshold of the live rows, the len(groups) fallback below
        # would fire anyway — after paying the CDC delete pass and a
        # bounded group collect (a whole-table backfill paid ~1.5 s of
        # discarded work at fixture scale). Rows stand proxy for groups
        # (time-bucketed groups scale with rows); dispatch is a pure
        # cost choice — both paths are exact. Files without row stats
        # disable the shortcut (conservative: proceed to the exact
        # group-count check).
        head_m = S.manifest(base_path, head)
        head_paths = {f["path"] for f in head_m["files"]}
        removed = [
            f
            for f in S.manifest(base_path, consumed)["files"]
            if f["path"] not in head_paths
        ]
        if removed and all(
            "rows" in f for f in removed + head_m["files"]
        ):
            base_rows = sum(f["rows"] for f in head_m["files"])
            if sum(f["rows"] for f in removed) > max_scoped_frac * max(
                base_rows, 1
            ):
                return rebuild_rollup(
                    spark, base_path, mv_path, partial_fn, app, ts_col=ts_col
                )
    cdc = S.read_changes_cdc(
        spark, base_path, consumed, head, precise_merge=precise
    )
    ins = cdc.where(F.col(S.CDC_TYPE) == "insert").drop(
        S.CDC_TYPE, S.CDC_VERSION
    )
    dels = cdc.where(F.col(S.CDC_TYPE) == "delete").drop(
        S.CDC_TYPE, S.CDC_VERSION
    )
    # the affected-group set: partial_fn is the one thing that knows how
    # base rows map to group keys, so aggregate the delete rows and keep
    # the keys. Driver-collected (bounded by max_scoped_groups) so the
    # CDC pipeline runs ONCE and the semi-joins below get a local frame.
    gdf = partial_fn(dels).select(*group_cols).distinct()
    rows = gdf.limit(max_scoped_groups + 1).collect()
    if len(rows) > max_scoped_groups:
        # too many groups for a scoped swap to beat one recompute
        return rebuild_rollup(
            spark, base_path, mv_path, partial_fn, app, ts_col=ts_col
        )
    # fraction fallback (r13): when the erasure touches most of the MV's
    # groups, the "scoped" swap degenerates — it re-aggregates nearly the
    # whole base AND leaves a composite-key eq-delete entry taxing every
    # subsequent read until compaction, while a rebuild is ONE clean
    # scan-and-swap with zero merge-on-read debt (the Delta/Iceberg
    # rewrite-vs-DV cost call). MV manifest row count is a free driver-
    # side upper proxy for the group count (partials ≥ groups: duplicate
    # partials only loosen the threshold, never force a rebuild early).
    mv_head = S.latest_version(mv_path)
    mv_ents = (
        S.manifest(mv_path, mv_head)["files"] if mv_head is not None else []
    )
    # proxy invariant: manifest rows >= live rows, so the threshold can
    # only be HARDER to cross (defers a rebuild, never forces one early).
    # A stats-less entry must therefore not read as 0 rows (r16 ADVICE —
    # that under-counts, the wrong direction); it disables the fallback
    # instead (mv_rows=0 skips the check below), the conservative defer.
    mv_rows = (
        sum(f["rows"] for f in mv_ents)
        if mv_ents and all("rows" in f for f in mv_ents)
        else 0
    )
    if mv_rows and len(rows) > max_scoped_frac * mv_rows:
        return rebuild_rollup(
            spark, base_path, mv_path, partial_fn, app, ts_col=ts_col
        )
    if not rows:
        # every delete netted out (a row-precise merge that only moved
        # rows between files): the range degenerates to its inserts
        return S.append(
            partial_fn(ins),
            mv_path,
            ts_col=ts_col,
            txn_app=app,
            txn_id=head,
            txn_expect=consumed,
        )
    # group_cols[0] MUST be the MV's time-bucket column: the prune range
    # below is min/max of rows[*][0]. A misordered tuple (e.g.
    # ("symbol", "minute")) would feed a string into ts_range — worst
    # case an ISO-shaped value silently mispruning. Fail loud instead:
    # pruning must stay a pure optimization.
    if not isinstance(rows[0][0], (_dt.datetime, _dt.date)):
        raise TypeError(
            f"group_cols[0] ({group_cols[0]!r}) must be the MV's "
            "time-bucket column (timestamp/date) — the scoped refresh "
            "prunes the pinned-head scan on min/max of that column; got "
            f"a {type(rows[0][0]).__name__} value {rows[0][0]!r}. Put "
            "the time bucket first in group_cols."
        )
    groups = spark.createDataFrame(rows, schema=gdf.schema)
    # pinned-head base scan pruned to the groups' time span (footer-stat
    # pruning; the semi-join makes the row set exact — pruning is an
    # optimization, never a semantics change), re-aggregated and narrowed
    # to exactly the affected groups. collect() renders TimestampType as
    # OS-local naive datetimes while read_snapshot's ts_range treats
    # naive bounds as UTC — normalize through the local offset so the
    # prune can't shift on a non-UTC driver (the r8 ADVICE error class)
    t_lo = _collect_utc(min(r[0] for r in rows))
    t_hi = (
        _collect_utc(max(r[0] for r in rows))
        + scope_bucket
        - _dt.timedelta(microseconds=1)
    )
    # opt-in FILE-level key prune: when scope_key_col passes through
    # partial_fn unchanged from the same-named base column, the pinned
    # head only needs files whose key range can hold an affected group's
    # key. Advisory — the group semi-join below keeps the row set exact —
    # and it bites only on a cluster_cols-written base (unclustered files
    # carry no string key stats and are never pruned).
    extra_prune = None
    if scope_key_col is not None and scope_key_col in group_cols:
        ki = list(group_cols).index(scope_key_col)
        key_vals = sorted({r[ki] for r in rows})
        # era-aware (r15): a column-mapped base's per-file stats are
        # keyed by the written name — probe each file under its era's
        _ren = S._version_body(base_path, head).get("renames")
        extra_prune = lambda fs: S.prune_files_by_values(  # noqa: E731
            fs, scope_key_col, key_vals, renames=_ren
        )
    elif scope_key_col is None and base_path not in _warned_scope_key:
        # discoverability (r13 verdict wrong #4): the caller clustered
        # the base (its manifest carries key [min,max] stats for a group
        # column) but didn't opt into the key prune — the scoped refresh
        # will scan the groups' full time-slice width. Say so ONCE; never
        # prune un-opted (logmv can't prove partial_fn passes the column
        # through unchanged, which is the opt-in's contract). The
        # once-per-table set is checked FIRST so steady state never pays
        # the O(files) stats sweep below.
        stats_cols = set().union(
            set(),
            *(f.get("cols", {}).keys() for f in S.manifest(base_path, head)["files"]),
        )
        hinted = [c for c in group_cols[1:] if c in stats_cols]
        if hinted:
            _warn_scope_key_once(base_path, hinted)
        else:
            _warned_scope_key.add(base_path)  # unclustered: never re-sweep
    base = S.read_snapshot(
        spark,
        base_path,
        version=head,
        ts_range=(t_lo, t_hi),
        ts_col=scope_ts_col,
        extra_prune=extra_prune,
    )
    scoped = partial_fn(base).join(
        F.broadcast(groups), list(group_cols), "left_semi"
    )
    # inserts landing OUTSIDE the affected groups are plain new partials
    # (inserts INSIDE them are already part of the head scan above)
    fresh = partial_fn(ins).join(
        F.broadcast(groups), list(group_cols), "left_anti"
    )
    # one atomic commit: append the replacement + fresh partials and
    # equality-delete every PRIOR partial row of the affected groups
    # (keys=groups, a superset of the replacement rows' keys: a fully
    # erased group has no replacement but its stale partials still die);
    # sequencing exempts the rows appended here. Exact watermark CAS as
    # everywhere else.
    return S.upsert_by_keys(
        scoped.unionByName(fresh),
        mv_path,
        cols=group_cols,
        keys=[tuple(r) for r in rows],
        ts_col=ts_col,
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
    ts_col: str = "minute",
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
    entries = S._write_txn(partials, mv_path, ts_col=ts_col)
    return S._commit(
        mv_path,
        lambda _hf: entries,
        "rebuild",
        txn=(app, head),
        txn_expect="force",
        dvs_fn=lambda _d: [],
        eq_dvs_fn=lambda _e, _v: [],
        write_schema=S._frame_schema(partials),
        schema_mode="replace",
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
    ts_col: str = "minute",
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
    entries = S._write_txn(merged, mv_path, ts_col=ts_col)
    return S._commit(
        mv_path,
        lambda _hf: entries,
        "compact",
        expected_parent=read_v,
        dvs_fn=lambda _d: [],
        eq_dvs_fn=lambda _e, _v: [],
        write_schema=S._frame_schema(merged),
        schema_mode="replace",
        # an interleaved REFRESH is a pure append of new partials — the
        # merge algebra is closed, so carrying those rows forward is the
        # same as refreshing after the compact; without this a frequent
        # refresher starves compaction forever (r10 rebase rule)
        on_conflict="rebase_appends",
        # algebra-preserving BY THE MV CONTRACT: every reader of an MV
        # table merges partials (read_rollup / a cascade's hour_partials),
        # and merge_fn is closed under that merge — so unlike the deduping
        # compact_snapshot, this rewrite is layout-only to its consumers
        data_change=False,
    )
