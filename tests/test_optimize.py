"""optimize_small_files gates (plans/snapshots — the Delta OPTIMIZE
semantics, r9): bin-pack ONLY the small files, carry everything else by
reference. The gates pin: O(small files) file economics (the big file's
path is carried, never rewritten), row-set preservation, deletion-vector
interaction (rewritten files' deletes materialize, untouched files'
positions survive the DV consolidation), equality-delete sequencing,
conflict detection, and the no-op threshold."""

from __future__ import annotations

from datetime import datetime

import pytest

from crypto_clickhouse_poc_spark.plans import snapshots as S

SCHEMA = "ts timestamp, symbol string, trade_id long, price double, ingested_at long"


def _batch(spark, ids, version: int = 0):
    rows = [
        (datetime(2024, 1, 1 + (i % 27)), "BTC", i, float(100 + i), version)
        for i in ids
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def table(tmp_path, spark):
    path = str(tmp_path / "opt_table")
    S.append(_batch(spark, range(10)), path)  # v0: one 10-row "big" file
    for k in range(4):  # v1..v4: four 2-row small files
        S.append(_batch(spark, range(10 + 2 * k, 12 + 2 * k)), path)
    return path


def _ids(df):
    return sorted(r.trade_id for r in df.collect())


def test_optimize_packs_small_files_and_carries_big_by_reference(spark, table):
    before = S.manifest(table, S.latest_version(table))["files"]
    big = [f["path"] for f in before if f.get("rows", 0) >= 5]
    assert len(big) == 1 and len(before) == 5
    v = S.optimize_small_files(spark, table, min_rows=5)
    m = S.manifest(table, v)
    assert m["op"] == "optimize"
    paths = [f["path"] for f in m["files"]]
    assert big[0] in paths  # the big file was never rewritten
    assert len(paths) == 2  # big + one packed file
    assert _ids(S.read_snapshot(spark, table)) == list(range(18))
    # time travel: the pre-optimize version still reads the small files
    assert _ids(S.read_snapshot(spark, table, version=v - 1)) == list(range(18))


def test_optimize_materializes_deletes_on_rewritten_files_only(spark, table):
    S.delete_where(spark, table, "trade_id = 11")  # position in a SMALL file
    S.delete_where(spark, table, "trade_id = 3")  # position in the BIG file
    v = S.optimize_small_files(spark, table, min_rows=5)
    m = S.manifest(table, v)
    # the small file's positions died with the rewrite; the big file's
    # position survives the consolidation
    assert sum(e["rows"] for e in m["dvs"]) == 1
    assert _ids(S.read_snapshot(spark, table)) == [
        i for i in range(18) if i not in (3, 11)
    ]


def test_optimize_respects_equality_delete_sequencing(spark, table):
    S.delete_by_keys(spark, table, spark.createDataFrame([(13,)], "trade_id long"))
    v = S.optimize_small_files(spark, table, min_rows=5)
    m = S.manifest(table, v)
    assert m["eq_dvs"]  # entry stays listed (untouched files remain subject)
    assert _ids(S.read_snapshot(spark, table)) == [i for i in range(18) if i != 13]
    # re-insert after the delete stays visible through the optimize
    S.append(_batch(spark, [13], version=9), table)
    got = {r.trade_id: r.ingested_at for r in S.read_snapshot(spark, table).collect()}
    assert got[13] == 9 and len(got) == 18


def test_optimize_rebases_over_a_pure_append(spark, table, monkeypatch):
    """r10 contract change (was: CommitConflict): a pure-append interleave
    is logically disjoint from the rewrite — optimize rebases onto it and
    both commits survive; the appended small file becomes the NEXT
    optimize's debt. Non-append interleaves still conflict — gated in
    tests/test_commit_rebase.py."""
    orig = S._write_txn

    def interleave(df, path, ts_col, **kw):
        out = orig(df, path, ts_col, **kw)
        if not getattr(interleave, "fired", False):
            interleave.fired = True
            S.append(_batch(df.sparkSession, [99]), table)
        return out

    monkeypatch.setattr(S, "_write_txn", interleave)
    before = _ids(S.read_snapshot(spark, table))
    v = S.optimize_small_files(spark, table, min_rows=5)
    monkeypatch.setattr(S, "_write_txn", orig)
    assert v == S.latest_version(table)
    assert S._version_body(table, v)["op"] == "optimize"
    # nothing lost on either side of the race
    assert _ids(S.read_snapshot(spark, table)) == sorted(before + [99])


def test_optimize_is_a_noop_below_two_small_files(spark, tmp_path):
    path = str(tmp_path / "opt_noop")
    S.append(_batch(spark, range(10)), path)
    head = S.latest_version(path)
    assert S.optimize_small_files(spark, path, min_rows=5) == head
    assert S.latest_version(path) == head
