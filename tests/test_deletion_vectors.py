"""Merge-on-read DELETE gates (plans/snapshots.delete_where + deletion
vectors).

The DV contract: a delete rewrites ZERO data files (the manifest's file
list is byte-identical before and after), readers of the new version
anti-join the recorded (file, row-position) pairs, prior versions still
serve the rows, compaction/merge materialize the deletes, rollback
restores the DV state, and vacuum sweeps DV files exactly when
unreferenced."""

from __future__ import annotations

from datetime import datetime

import pytest

from crypto_clickhouse_poc_spark.plans import snapshots as S

SCHEMA = "ts timestamp, symbol string, trade_id long, price double, ingested_at long"


def _batch(spark, month: int, ids, version: int = 0):
    rows = [
        (datetime(2024, month, 1 + (i % 27)), "BTC", i, float(100 + i), version)
        for i in ids
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def table(tmp_path, spark):
    path = str(tmp_path / "dv_table")
    S.append(_batch(spark, 1, range(10)), path)  # v0: Jan, ids 0-9
    S.append(_batch(spark, 2, range(10, 16)), path)  # v1: Feb, ids 10-15
    return path


def _ids(df):
    return sorted(r.trade_id for r in df.collect())


def test_delete_rewrites_zero_files_and_time_travels(spark, table):
    before = S.manifest(table, 1)["files"]
    v = S.delete_where(spark, table, "trade_id IN (3, 12)")
    m = S.manifest(table, v)
    assert m["op"] == "delete"
    assert m["files"] == before  # NOT ONE data file rewritten
    assert len(m["dvs"]) >= 1 and sum(e["rows"] for e in m["dvs"]) == 2
    assert _ids(S.read_snapshot(spark, table)) == [i for i in range(16) if i not in (3, 12)]
    # the pre-delete version still reads the rows
    assert _ids(S.read_snapshot(spark, table, version=v - 1)) == list(range(16))


def test_deletes_stack_and_are_idempotent(spark, table):
    S.delete_where(spark, table, "trade_id = 3")
    v2 = S.delete_where(spark, table, "trade_id IN (3, 4)")  # 3 already gone
    m = S.manifest(table, v2)
    assert sum(e["rows"] for e in m["dvs"]) == 2  # 3 counted once, not twice
    assert _ids(S.read_snapshot(spark, table)) == [i for i in range(16) if i not in (3, 4)]


def test_delete_matching_nothing_is_a_noop(spark, table):
    head = S.latest_version(table)
    assert S.delete_where(spark, table, "trade_id = 999") == head
    assert S.latest_version(table) == head
    assert S.manifest(table, head)["dvs"] == []


def test_compact_materializes_deletes_and_clears_dvs(spark, table):
    S.delete_where(spark, table, "trade_id = 5")
    v = S.compact_snapshot(spark, table)
    m = S.manifest(table, v)
    assert m["dvs"] == []
    assert _ids(S.read_snapshot(spark, table)) == [i for i in range(16) if i != 5]
    # pre-compact version still applies its DV
    assert _ids(S.read_snapshot(spark, table, version=v - 1)) == [
        i for i in range(16) if i != 5
    ]


def test_merge_respects_and_materializes_touched_file_deletes(spark, table):
    # delete id 3 (Jan), then merge a source matching id 3's key — the
    # deleted row must NOT resurrect as an update; it re-enters as an
    # INSERT (fresh row), exactly Delta's DV+merge semantics
    S.delete_where(spark, table, "trade_id = 3")
    v = S.merge_into(
        spark, table, _batch(spark, 1, [3], version=7), ["symbol", "trade_id"]
    )
    head = {r.trade_id: r.ingested_at for r in S.read_snapshot(spark, table).collect()}
    assert head[3] == 7 and len(head) == 16
    # untouched-file DVs are carried forward by the merge commit
    S.delete_where(spark, table, "trade_id = 12")
    v2 = S.merge_into(
        spark, table, _batch(spark, 1, [4], version=8), ["symbol", "trade_id"]
    )
    assert 12 not in _ids(S.read_snapshot(spark, table))
    assert sum(e["rows"] for e in S.manifest(table, v2)["dvs"]) >= 1


def test_rollback_restores_dv_state_both_ways(spark, table):
    pre = S.latest_version(table)
    v_del = S.delete_where(spark, table, "trade_id = 7")
    S.rollback(table, pre)
    assert _ids(S.read_snapshot(spark, table)) == list(range(16))  # row back
    S.rollback(table, v_del)
    assert 7 not in _ids(S.read_snapshot(spark, table))  # delete back


def test_vacuum_sweeps_unreferenced_dv_files(spark, table):
    from pathlib import Path

    S.delete_where(spark, table, "trade_id = 3")
    assert any((Path(table) / S.DV_DIR).rglob("*.parquet"))
    # head still references the DV: vacuum must keep it
    S.vacuum(table, retain_versions=1)
    assert any((Path(table) / S.DV_DIR).rglob("*.parquet"))
    assert 3 not in _ids(S.read_snapshot(spark, table))
    # compact clears the reference; vacuum to the head sweeps the DV file
    S.compact_snapshot(spark, table)
    S.vacuum(table, retain_versions=1)
    assert not any((Path(table) / S.DV_DIR).rglob("*.parquet"))
    assert 3 not in _ids(S.read_snapshot(spark, table))


def test_delete_conflict_with_interleaved_commit(spark, table):
    # a commit between delete's read and its commit invalidates the row
    # positions the DV points at → CommitConflict, like compact
    import json
    from pathlib import Path

    log = Path(table) / S.LOG_DIR
    racer = json.loads((log / "v1.json").read_text())
    racer["version"], racer["parent"] = 2, 1
    (log / "v2.json").write_text(json.dumps(racer))
    # delete reads head v2 but we race it by pre-claiming v3 mid-flight:
    # simplest deterministic form — pin expected_parent by hand
    with pytest.raises(S.CommitConflict):
        S._commit(table, lambda hf: hf, "delete", expected_parent=1, dvs_fn=lambda d: d)


def test_read_changes_refuses_ranges_containing_deletes(spark, table):
    since = S.latest_version(table)
    S.delete_where(spark, table, "trade_id = 3")
    with pytest.raises(ValueError, match="non-append"):
        S.read_changes(spark, table, since_version=since)


def test_maybe_compact_triggers_on_dv_debt(spark, table):
    # file count healthy, but accumulated DV rows exceed the threshold —
    # the policy must materialize the merge-on-read debt
    S.delete_where(spark, table, "trade_id IN (1, 2, 3)")
    assert (
        S.maybe_compact_snapshot(spark, table, max_live_files=1000, max_dv_rows=2)
        is not None
    )
    assert S.manifest(table, S.latest_version(table))["dvs"] == []
    assert _ids(S.read_snapshot(spark, table)) == [
        i for i in range(16) if i not in (1, 2, 3)
    ]
    # under both thresholds: no-op
    assert S.maybe_compact_snapshot(spark, table, max_live_files=1000) is None


def test_scoped_delete_prunes_scan_and_out_of_scope_matches_survive(
    spark, tmp_path, monkeypatch
):
    """r10 scoped deletes: months/ts_range/col_ranges are part of the
    delete's MEANING (predicate AND scope), which makes the manifest-level
    pruning they buy a pure optimization — 'erase trade 5's Jan rows'
    scans January's files only, and trade 5's February twin survives."""
    from datetime import datetime

    path = str(tmp_path / "scoped")
    for month in (1, 2, 3):
        rows = [
            (datetime(2024, month, 2), "BTC", i, float(i), 0) for i in range(10)
        ]
        S.append(
            spark.createDataFrame(
                rows,
                "ts timestamp, symbol string, trade_id long, price double,"
                " ingested_at long",
            ),
            path,
        )
    scanned = []
    real = S._read_files
    monkeypatch.setattr(
        S,
        "_read_files",
        lambda sp, p, files, **kw: scanned.append([f["path"] for f in files])
        or real(sp, p, files, **kw),
    )
    v = S.delete_where(
        spark, path, "trade_id = 5", months=("202401", "202401")
    )
    monkeypatch.undo()
    assert v == S.latest_version(path)
    assert len(scanned) == 1 and all("p_month=202401" in p for p in scanned[0])
    left = S.read_snapshot(spark, path).where("trade_id = 5").collect()
    # January's row 5 is gone; February's and March's survive
    assert sorted(r.ts.month for r in left) == [2, 3]
    # ts_range scoping composes with the predicate the same way
    S.delete_where(
        spark,
        path,
        "trade_id = 7",
        ts_range=(datetime(2024, 2, 1), datetime(2024, 2, 28)),
    )
    left7 = S.read_snapshot(spark, path).where("trade_id = 7").collect()
    assert sorted(r.ts.month for r in left7) == [1, 3]
    # a scope that provably matches nothing is a metadata no-op
    head = S.latest_version(path)
    assert (
        S.delete_where(
            spark, path, "trade_id = 1", months=("209901", "209912")
        )
        == head
    )
