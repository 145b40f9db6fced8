"""Manifest-sharding gates (plans/snapshots SHARD_FILES — the Iceberg
manifest-list layout, r9).

Past SHARD_FILES entries a commit writes the file list as per-month
content-addressed shards and v{N}.json holds only references; manifest()
splices them back so readers are unchanged. The gates pin: read
equivalence across the inline/sharded boundary, shard REUSE (a commit
touching one month re-links, not rewrites, the others), months-pruned
reads skipping other shards entirely, field round-trip (added_v), and
the maintenance ops (compact / retention / rollback / eq-delete) over a
sharded log."""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path

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
def sharded(tmp_path, spark, monkeypatch):
    monkeypatch.setattr(S, "SHARD_FILES", 2)
    path = str(tmp_path / "sh_table")
    S.append(_batch(spark, 1, range(4)), path)  # v0: Jan
    S.append(_batch(spark, 2, range(4, 8)), path)  # v1: Feb
    S.append(_batch(spark, 3, range(8, 12)), path)  # v2: Mar
    return path


def _ids(df):
    return sorted(r.trade_id for r in df.collect())


def _raw(path, v):
    return json.loads((Path(path) / S.LOG_DIR / f"v{v}.json").read_text())


def test_sharded_log_reads_identically_and_stays_small(spark, sharded):
    head = S.latest_version(sharded)
    raw = _raw(sharded, head)
    assert "files" not in raw and len(raw["files_ref"]) == 3  # one per month
    assert sum(r["n"] for r in raw["files_ref"]) == len(
        S.manifest(sharded, head)["files"]
    )
    assert _ids(S.read_snapshot(spark, sharded)) == list(range(12))
    # time travel across the inline->sharded boundary (v0 was inline iff
    # small; either way every version reads)
    assert _ids(S.read_snapshot(spark, sharded, version=1)) == list(range(8))


def test_unchanged_months_reuse_their_shard_by_content_address(spark, sharded):
    v = S.latest_version(sharded)
    before = {r["p_month"]: r["path"] for r in _raw(sharded, v)["files_ref"]}
    S.append(_batch(spark, 2, range(12, 14), version=1), sharded)  # touch Feb only
    after = {r["p_month"]: r["path"] for r in _raw(sharded, v + 1)["files_ref"]}
    assert after["202401"] == before["202401"]  # untouched months: same shard
    assert after["202403"] == before["202403"]
    assert after["202402"] != before["202402"]  # the touched month re-hashed
    assert _ids(S.read_snapshot(spark, sharded)) == list(range(14))


def test_months_pruned_read_never_parses_other_shards(spark, sharded, monkeypatch):
    head = S.latest_version(sharded)
    other = [
        r["path"]
        for r in _raw(sharded, head)["files_ref"]
        if r["p_month"] != "202402"
    ]
    real_read_text = Path.read_text

    def spy(self, *a, **kw):
        assert self.name not in {Path(p).name for p in other}, (
            f"months-pruned read parsed out-of-range shard {self.name}"
        )
        return real_read_text(self, *a, **kw)

    monkeypatch.setattr(Path, "read_text", spy)
    got = _ids(S.read_snapshot(spark, sharded, months=("202402", "202402")))
    monkeypatch.setattr(Path, "read_text", real_read_text)
    assert got == list(range(4, 8))


def test_added_v_round_trips_through_shards_for_eq_deletes(spark, sharded):
    S.delete_by_keys(
        spark, sharded, spark.createDataFrame([(5,)], "trade_id long")
    )
    # re-insert after the delete: sequencing needs added_v to survive the
    # shard encode/decode
    S.append(_batch(spark, 2, [5], version=7), sharded)
    got = {r.trade_id: r.ingested_at for r in S.read_snapshot(spark, sharded).collect()}
    assert got[5] == 7 and len(got) == 12


def test_maintenance_ops_over_a_sharded_log(spark, sharded):
    S.compact_snapshot(spark, sharded, keys=("ts", "symbol", "trade_id"))
    assert _ids(S.read_snapshot(spark, sharded)) == list(range(12))
    S.drop_months(sharded, "202402")  # retention drops January
    assert _ids(S.read_snapshot(spark, sharded)) == list(range(4, 12))
    S.rollback(sharded, 2)
    assert _ids(S.read_snapshot(spark, sharded)) == list(range(12))
    removed = S.vacuum(sharded)
    assert _ids(S.read_snapshot(spark, sharded)) == list(range(12))
    assert all(r.endswith(".parquet") for r in removed)  # never log shards


def test_manifest_delta_parses_only_changed_shards(spark, sharded, monkeypatch):
    """manifest_delta (r11) must answer "what did commit v add/remove"
    from the commit's CHANGED month shards alone — the other months'
    shard files are never even opened (the CDC feed and the stream
    source's catch-up path both ride on this)."""
    S.append(_batch(spark, 2, range(12, 14), version=1), sharded)  # touch Feb
    v = S.latest_version(sharded)
    untouched = [
        r["path"]
        for r in _raw(sharded, v)["files_ref"]
        if r["p_month"] != "202402"
    ]
    real_read_text = Path.read_text

    def spy(self, *a, **kw):
        assert self.name not in {Path(p).name for p in untouched}, (
            f"manifest_delta parsed unchanged shard {self.name}"
        )
        return real_read_text(self, *a, **kw)

    monkeypatch.setattr(Path, "read_text", spy)
    added, removed = S.manifest_delta(sharded, v)
    monkeypatch.setattr(Path, "read_text", real_read_text)
    assert removed == []
    assert [f["p_month"] for f in added] == ["202402"]
    assert all(f["added_v"] == v for f in added)


def test_manifest_delta_sees_removals_and_inline_boundary(spark, sharded):
    """Retention removals surface in the delta; a commit CROSSING the
    shard boundary (sharded -> inline) still answers correctly via the
    documented full-materialization fallback."""
    S.drop_months(sharded, "202402")  # Jan dropped; 2 files -> inline again
    v = S.latest_version(sharded)
    added, removed = S.manifest_delta(sharded, v)
    assert added == []
    assert [f["p_month"] for f in removed] == ["202401"]
