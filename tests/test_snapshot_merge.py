"""Copy-on-write MERGE INTO gates (plans/snapshots.merge_into).

Like the rest of the snapshot log, merge is a write operation with no SQL
oracle; the gates pin the Delta-subset semantics (update / insert / CDC
tombstone delete), the copy-on-write file economics (untouched files are
carried BY REFERENCE, never rewritten), version isolation (time travel
across the merge boundary), conflict detection, and the up-front source
contracts (unique, non-null keys)."""

from __future__ import annotations

from datetime import datetime

import pytest

from crypto_clickhouse_poc_spark.plans import snapshots as S

SCHEMA = "ts timestamp, symbol string, trade_id long, price double, ingested_at long"


def _batch(spark, month: int, ids, version: int = 0, price=None):
    rows = [
        (
            datetime(2024, month, 1 + (i % 27)),
            "BTC",
            i,
            float(100 + i) if price is None else float(price),
            version,
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def table(tmp_path, spark):
    path = str(tmp_path / "merge_table")
    S.append(_batch(spark, 1, range(10)), path)  # v0: Jan, ids 0-9
    S.append(_batch(spark, 2, range(10, 16)), path)  # v1: Feb, ids 10-15
    return path


def _rows(df):
    return {r.trade_id: r.price for r in df.collect()}


KEYS = ["symbol", "trade_id"]


def test_merge_updates_inserts_and_time_travels(spark, table):
    src = _batch(spark, 1, [3, 7], price=999.0).union(
        _batch(spark, 3, [100], price=555.0)
    )
    v = S.merge_into(spark, table, src, KEYS)
    assert S.history(table)[-1]["op"] == "merge"
    head = _rows(S.read_snapshot(spark, table))
    assert head[3] == 999.0 and head[7] == 999.0  # updated
    assert head[100] == 555.0  # inserted
    assert head[4] == 104.0 and head[12] == 112.0  # untouched rows intact
    assert len(head) == 17
    # the merge is a NEW version — the old snapshot still reads old values
    old = _rows(S.read_snapshot(spark, table, version=v - 1))
    assert old[3] == 103.0 and 100 not in old


def test_merge_rewrites_only_touched_files(spark, table):
    before = {f["path"] for f in S.manifest(table, 1)["files"]}
    feb_files = {f["path"] for f in S.manifest(table, 1)["files"] if f["p_month"] == "202402"}
    v = S.merge_into(spark, table, _batch(spark, 1, [3], price=999.0), KEYS)
    after = {f["path"] for f in S.manifest(table, v)["files"]}
    # every Feb file (no key 3 anywhere near it) is carried by reference
    assert feb_files <= after
    # something WAS rewritten (the Jan file holding key 3 is gone, a new
    # txn dir's file replaced it)
    assert after != before and after - before


def test_merge_delete_col_applies_cdc_tombstones(spark, table):
    # CDC batch: delete id 5, update id 6, insert id 200; a tombstone for
    # a key that never existed (id 999) must be a no-op
    src = (
        _batch(spark, 1, [5]).withColumn("_deleted", F_lit(True))
        .union(_batch(spark, 1, [6], price=777.0).withColumn("_deleted", F_lit(False)))
        .union(_batch(spark, 3, [200], price=888.0).withColumn("_deleted", F_lit(False)))
        .union(_batch(spark, 1, [999]).withColumn("_deleted", F_lit(True)))
    )
    S.merge_into(spark, table, src, KEYS, delete_col="_deleted")
    head = _rows(S.read_snapshot(spark, table))
    assert 5 not in head and 999 not in head
    assert head[6] == 777.0 and head[200] == 888.0
    assert len(head) == 16  # 16 - deleted + inserted


def test_merge_insert_false_is_pure_update(spark, table):
    src = _batch(spark, 1, [3], price=999.0).union(
        _batch(spark, 3, [100], price=555.0)
    )
    S.merge_into(spark, table, src, KEYS, insert=False)
    head = _rows(S.read_snapshot(spark, table))
    assert head[3] == 999.0 and 100 not in head and len(head) == 16


def test_merge_updates_every_copy_of_a_duplicate_target_key(spark, table):
    # pre-compaction tables legitimately hold duplicate keys — Delta
    # semantics: every matched copy is updated
    S.append(_batch(spark, 1, [4], version=9), table)  # id 4 now has 2 rows
    S.merge_into(spark, table, _batch(spark, 1, [4], price=999.0), KEYS)
    rows = S.read_snapshot(spark, table).where("trade_id = 4").collect()
    assert len(rows) == 2 and all(r.price == 999.0 for r in rows)


def test_merge_update_cols_limits_the_update(spark, table):
    src = _batch(spark, 1, [3], version=42, price=999.0)
    S.merge_into(spark, table, src, KEYS, update_cols=["ingested_at"], insert=False)
    row = S.read_snapshot(spark, table).where("trade_id = 3").collect()[0]
    assert row.ingested_at == 42 and row.price == 103.0  # price NOT updated


def test_merge_source_contracts(spark, table):
    dup = _batch(spark, 1, [3]).union(_batch(spark, 1, [3]))
    with pytest.raises(ValueError, match="duplicate"):
        S.merge_into(spark, table, dup, KEYS)
    nulled = _batch(spark, 1, [3]).withColumn("trade_id", F_lit(None).cast("long"))
    with pytest.raises(ValueError, match="NULL merge key"):
        S.merge_into(spark, table, nulled, KEYS)
    with pytest.raises(ValueError, match="missing"):
        S.merge_into(spark, table, _batch(spark, 1, [3]).drop("price"), KEYS)
    # insert=False relaxes the all-columns requirement
    S.merge_into(
        spark, table,
        _batch(spark, 1, [3], version=42).drop("price"),
        KEYS, update_cols=["ingested_at"], insert=False,
    )
    with pytest.raises(ValueError, match="delete_col"):
        S.merge_into(spark, table, _batch(spark, 1, [3]), KEYS, delete_col="nope")
    with pytest.raises(ValueError, match="update_cols"):
        S.merge_into(spark, table, _batch(spark, 1, [3]), KEYS, update_cols=["typo"])


def test_merge_into_an_emptied_head_is_a_pure_insert(spark, table):
    # retention that drops every file → merge must not scan zero paths
    S.drop_months(table, "999912")
    v = S.merge_into(spark, table, _batch(spark, 1, [1, 2]), KEYS)
    assert _rows(S.read_snapshot(spark, table)) == {1: 101.0, 2: 102.0}
    assert S.manifest(table, v)["op"] == "merge"


def test_merge_conflict_is_detected_not_silently_lost(spark, table, monkeypatch):
    # an append lands between merge's snapshot read and its commit — the
    # rewrite dedups/merges the state it READ, so committing over the
    # interleaver would drop its rows: CommitConflict, like compact
    orig = S._write_txn

    def interleave(df, path, ts_col, **kw):
        out = orig(df, path, ts_col, **kw)
        if not getattr(interleave, "fired", False):
            interleave.fired = True
            S.append(_batch(df.sparkSession, 3, [300]), table)
        return out

    monkeypatch.setattr(S, "_write_txn", interleave)
    with pytest.raises(S.CommitConflict):
        S.merge_into(spark, table, _batch(spark, 1, [3], price=9.0), KEYS)
    # the interleaver's row is intact at the head
    assert 300 in _rows(S.read_snapshot(spark, table))


def test_merge_with_no_matches_and_no_inserts_is_a_noop(spark, table):
    head = S.latest_version(table)
    v = S.merge_into(
        spark, table, _batch(spark, 3, [500]), KEYS, insert=False
    )
    assert v == head and S.latest_version(table) == head


def test_merge_pure_insert_touches_zero_existing_files(spark, table):
    before = {f["path"] for f in S.manifest(table, 1)["files"]}
    v = S.merge_into(spark, table, _batch(spark, 3, [300, 301]), KEYS)
    after = {f["path"] for f in S.manifest(table, v)["files"]}
    assert before <= after  # every pre-existing file carried by reference
    assert sorted(_rows(S.read_snapshot(spark, table))) == list(range(16)) + [300, 301]


def F_lit(v):
    from pyspark.sql import functions as F

    return F.lit(v)


def test_manifest_key_stats_prune_merge_candidates(spark, table):
    from crypto_clickhouse_poc_spark.plans.snapshots import _merge_candidates

    files = S.manifest(table, 1)["files"]
    # every data file carries numeric key ranges in the manifest
    assert all("cols" in f and "trade_id" in f["cols"] for f in files)
    # source keys 3..7 overlap only the Jan file(s) (ids 0-9); the Feb
    # files (ids 10-15) are pruned WITHOUT any scan
    cand = _merge_candidates(files, ["symbol", "trade_id"], {
        "symbol": ("BTC", "BTC"), "trade_id": (3, 7),
    })
    assert cand and all(f["p_month"] == "202401" for f in cand)
    # empty source prunes everything; statless files are conservatively kept
    assert _merge_candidates(files, ["trade_id"], {"trade_id": None}) == []
    bare = [{"path": "x", "p_month": "202401"}]
    assert _merge_candidates(bare, ["trade_id"], {"trade_id": (0, 1)}) == bare
    # and the end-to-end merge over the pruned candidate set is correct
    v = S.merge_into(spark, table, _batch(spark, 1, [3, 7], price=999.0), KEYS)
    head = _rows(S.read_snapshot(spark, table))
    assert head[3] == 999.0 and head[7] == 999.0 and len(head) == 16
    feb = {f["path"] for f in S.manifest(table, 1)["files"] if f["p_month"] == "202402"}
    assert feb <= {f["path"] for f in S.manifest(table, v)["files"]}


def test_merge_into_retry_survives_one_lost_race(spark, table, monkeypatch):
    # same interleaver as the conflict test, but through the retry
    # wrapper: attempt 1 loses to the mid-flight append, attempt 2
    # re-runs against the new head — both the interleaver's row and the
    # merge survive
    orig = S._write_txn

    def interleave(df, path, ts_col, **kw):
        out = orig(df, path, ts_col, **kw)
        if not getattr(interleave, "fired", False):
            interleave.fired = True
            S.append(_batch(df.sparkSession, 3, [300]), table)
        return out

    monkeypatch.setattr(S, "_write_txn", interleave)
    S.merge_into_retry(spark, table, _batch(spark, 1, [3], price=9.0), KEYS)
    head = _rows(S.read_snapshot(spark, table))
    assert head[3] == 9.0 and head[300] == 400.0 and len(head) == 17


def test_merge_timestamp_key_pruning_is_driver_tz_independent(spark, tmp_path):
    """Manifest key-range pruning on a TIMESTAMP merge key must compare
    UTC against UTC: collecting the source bounds as Python datetimes
    renders them through the driver OS timezone, and under TZ=America/
    New_York a 17:00-UTC key collected as 12:00 made _merge_candidates
    prune the very file holding the match — the merge then silently
    INSERTED a duplicate instead of updating (r8 ADVICE, high). The
    bounds are now collected as tz-independent unix_micros."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    path = str(tmp_path / "tz_merge")
    # one file whose ts stats are a single 17:00-UTC instant (narrow
    # enough that a 5-hour driver-tz shift makes the ranges disjoint)
    rows = [
        (datetime(2024, 1, 1, 17, 0, 0), "BTC", i, float(100 + i), 0)
        for i in range(5)
    ]
    S.append(spark.createDataFrame(rows, SCHEMA), path)  # written under UTC
    # engine-built source: key instants never cross the Python boundary
    src = (
        S.read_snapshot(spark, path)
        .where(F.col("trade_id") == 3)
        .withColumn("price", F.lit(999.0))
    )
    old = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    _time.tzset()
    try:
        S.merge_into(spark, path, src, ["ts", "trade_id"])
    finally:
        if old is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old
        _time.tzset()
    head = S.read_snapshot(spark, path).collect()
    assert len(head) == 5, f"duplicate insert: {sorted(r.trade_id for r in head)}"
    got3 = [r.price for r in head if r.trade_id == 3]
    assert got3 == [999.0], f"match was pruned away and re-inserted: {got3}"
