"""Per-file Bloom index gates (plans/bloomidx): point lookups equal the
full-scan filter for present AND absent keys, the probe provably skips
files (inputFiles shrinks), post-index appends are conservatively read,
deletion vectors stay applied, the empty-prune path keeps the schema,
and the sidecar survives vacuum."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans import bloomidx as B
from crypto_clickhouse_poc_spark.plans import snapshots as S

SCHEMA = "ts timestamp, symbol string, trade_id long, price double, ingested_at long"


def _batch(spark, month, ids):
    rows = [(datetime(2024, month, 1), "BTC", i, float(i), 0) for i in ids]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def table(tmp_path, spark):
    path = str(tmp_path / "idx_table")
    S.append(_batch(spark, 1, range(0, 40)), path)  # file(s) in Jan
    S.append(_batch(spark, 2, range(40, 80)), path)  # Feb
    S.append(_batch(spark, 3, range(80, 120)), path)  # Mar
    return path


def _full_filter(spark, table, v):
    return sorted(
        map(
            tuple,
            S.read_snapshot(spark, table).where(F.col("trade_id") == v).collect(),
        )
    )


def test_point_lookup_equals_full_scan_and_skips_files(spark, table):
    meta = B.build_bloom_index(spark, table, "trade_id")
    assert meta["n_files"] == 3
    n_all = len(S.read_snapshot(spark, table).inputFiles())
    hit = B.read_point(spark, table, "trade_id", 57)
    assert sorted(map(tuple, hit.collect())) == _full_filter(spark, table, 57)
    # the key lives in ONE month's txn file — the probe must not open
    # the others (Bloom FP is theoretically possible but ~2e-4 here)
    assert len(hit.inputFiles()) < n_all
    # absent key: every file ruled out -> empty result, schema intact
    miss = B.read_point(spark, table, "trade_id", 999_999)
    assert miss.count() == 0
    assert miss.columns == hit.columns


def test_unindexed_appends_are_read_conservatively(spark, table):
    B.build_bloom_index(spark, table, "trade_id")
    S.append(_batch(spark, 1, [500]), table)  # AFTER the index build
    got = B.read_point(spark, table, "trade_id", 500)
    assert [r.trade_id for r in got.collect()] == [500]


def test_deletes_stay_applied_through_the_pruned_read(spark, table):
    B.build_bloom_index(spark, table, "trade_id")
    S.delete_where(spark, table, "trade_id = 57")
    assert B.read_point(spark, table, "trade_id", 57).count() == 0
    S.delete_by_keys(
        spark, table, spark.createDataFrame([(58,)], "trade_id long")
    )
    assert B.read_point(spark, table, "trade_id", 58).count() == 0
    assert B.read_point(spark, table, "trade_id", 59).count() == 1


def test_rebuild_covers_new_files_and_tightens_pruning(spark, table):
    B.build_bloom_index(spark, table, "trade_id")
    S.append(_batch(spark, 2, [700]), table)
    loose = len(B.read_point(spark, table, "trade_id", 57).inputFiles())
    B.build_bloom_index(spark, table, "trade_id")  # rebuild at new head
    tight = B.read_point(spark, table, "trade_id", 57)
    assert len(tight.inputFiles()) <= loose
    assert sorted(map(tuple, tight.collect())) == _full_filter(spark, table, 57)
    assert B.read_point(spark, table, "trade_id", 700).count() == 1


def test_batched_lookup_equals_full_scan_isin(spark, table):
    B.build_bloom_index(spark, table, "trade_id")
    keys = [3, 57, 111, 999_999]  # three months + one absent
    got = B.read_points(spark, table, "trade_id", keys)
    want = sorted(
        map(
            tuple,
            S.read_snapshot(spark, table)
            .where(F.col("trade_id").isin(*keys))
            .collect(),
        )
    )
    assert sorted(map(tuple, got.collect())) == want and len(want) == 3
    # the union of three single-file keys still skips nothing it needs
    assert len(got.inputFiles()) == 3
    # an all-absent batch prunes everything and keeps the schema
    empty = B.read_points(spark, table, "trade_id", [888_888, 999_999])
    assert empty.count() == 0 and empty.columns == got.columns


def test_driver_probe_positions_match_engine_hashing(spark):
    """read_point computes probe positions driver-side with hashlib; the
    mirror must stay bit-identical to the engine's bloom_positions."""
    import hashlib

    from crypto_clickhouse_poc_spark.operators.bloom import (
        BLOOM_HASHES,
        bloom_positions,
    )

    for val, bits in (("777777", 1 << 20), ("BTC|9", 1 << 14)):
        eng = (
            spark.range(1)
            .select(bloom_positions(F.lit(val), bits=bits).alias("p"))
            .first()
            .p
        )
        py = [
            int(hashlib.md5(f"{j}:{val}".encode()).hexdigest()[:8], 16) % bits
            for j in range(BLOOM_HASHES)
        ]
        assert list(eng) == py


def test_rollback_reexposed_files_are_read_not_pruned(spark, table):
    """The review's rollback hole: compact, index the compacted head,
    then roll back — the pre-compact files re-exposed by the rollback
    were never seen by the index and MUST be read (an added_v heuristic
    would prune them and silently lose rows)."""
    pre = S.latest_version(table)
    S.compact_snapshot(spark, table)
    B.build_bloom_index(spark, table, "trade_id")
    S.rollback(table, pre)
    got = B.read_point(spark, table, "trade_id", 57)
    assert [r.trade_id for r in got.collect()] == [57]
    # and the staleness policy SEES the re-exposure as staleness
    assert B.maybe_rebuild_bloom_index(spark, table, "trade_id", 0) is not None


def test_float_keys_are_rejected_and_empty_head_is_a_noop(spark, table, tmp_path):
    with pytest.raises(TypeError, match="float/decimal"):
        B.build_bloom_index(spark, table, "price")
    S.drop_months(table, "999912")  # retention empties the head
    assert B.build_bloom_index(spark, table, "trade_id") is None


def test_superseded_index_gets_one_generation_grace(spark, table):
    m1 = B.build_bloom_index(spark, table, "trade_id")
    m2 = B.build_bloom_index(spark, table, "trade_id")
    from pathlib import Path

    root = Path(table) / B.IDX_DIR
    d1, d2 = B._dirs_of(m1)[0], B._dirs_of(m2)[0]
    assert (root / d1).exists()  # parent kept for in-flight readers
    m3 = B.build_bloom_index(spark, table, "trade_id")
    assert not (root / d1).exists()  # grandparent swept
    assert (root / d2).exists() and (root / B._dirs_of(m3)[0]).exists()


def test_extend_indexes_only_new_files_and_keeps_lookups_exact(
    spark, table, monkeypatch
):
    """The incremental-maintenance gate (r9 verdict item #3): extension
    scans ONLY manifest files absent from the sidecar — O(new files),
    never the O(table) rescan — and index-covered point lookups are
    identical before/after."""
    B.build_bloom_index(spark, table, "trade_id")
    before = sorted(
        map(tuple, B.read_point(spark, table, "trade_id", 57).collect())
    )
    S.append(_batch(spark, 4, range(200, 220)), table)  # April, new files
    scanned = []
    real = B.S._read_files
    monkeypatch.setattr(
        B.S,
        "_read_files",
        lambda sp, p, files, **kw: scanned.append([f["path"] for f in files])
        or real(sp, p, files, **kw),
    )
    meta = B.extend_bloom_index(spark, table, "trade_id")
    monkeypatch.undo()
    assert meta is not None and meta["version"] == S.latest_version(table)
    # exactly one scan, of exactly the post-build files (April only)
    assert len(scanned) == 1
    assert all("p_month=202404" in p for p in scanned[0]), scanned[0]
    # extension is covering: the new key is now PRUNED-lookup-served
    hit = B.read_point(spark, table, "trade_id", 205)
    assert [r.trade_id for r in hit.collect()] == [205]
    n_all = len(S.read_snapshot(spark, table).inputFiles())
    assert len(hit.inputFiles()) < n_all
    # pre-existing lookups unchanged
    assert (
        sorted(map(tuple, B.read_point(spark, table, "trade_id", 57).collect()))
        == before
    )
    # steady state: nothing new -> no-op, no Spark job needed
    assert B.extend_bloom_index(spark, table, "trade_id") is None


def test_extend_escalates_to_rebuild_on_saturation(spark, table, monkeypatch):
    """New files bigger than the built filter can absorb must trigger a
    full re-sized rebuild — extension must never silently saturate."""
    B.build_bloom_index(spark, table, "trade_id")
    import json as _json

    ptr = B._pointer(table, "trade_id")
    meta = _json.loads(ptr.read_text())
    assert meta["bits"] == B._MIN_BITS  # 40-row files -> floor size
    # an append big enough that BITS_PER_KEY * rows > _MIN_BITS
    n = B._MIN_BITS // B.BITS_PER_KEY + 10
    S.append(_batch(spark, 5, range(1000, 1000 + n)), table)
    calls = []
    real_build = B.build_bloom_index
    monkeypatch.setattr(
        B,
        "build_bloom_index",
        lambda *a, **kw: calls.append(1) or real_build(*a, **kw),
    )
    m2 = B.extend_bloom_index(spark, table, "trade_id")
    assert calls == [1]  # escalated
    assert m2["bits"] > B._MIN_BITS
    assert B.read_point(spark, table, "trade_id", 1001).count() == 1


def test_maybe_rebuild_policy(spark, table):
    # no index yet -> builds unconditionally
    meta = B.maybe_rebuild_bloom_index(spark, table, "trade_id")
    assert meta is not None and meta["version"] == S.latest_version(table)
    # fresh -> no-op (no Spark job)
    assert B.maybe_rebuild_bloom_index(spark, table, "trade_id") is None
    # under threshold staleness -> still a no-op; over -> rebuild
    S.append(_batch(spark, 1, [300]), table)
    assert B.maybe_rebuild_bloom_index(spark, table, "trade_id", 2) is None
    S.append(_batch(spark, 1, [301]), table)
    S.append(_batch(spark, 1, [302]), table)
    meta2 = B.maybe_rebuild_bloom_index(spark, table, "trade_id", 2)
    assert meta2 is not None and meta2["version"] == S.latest_version(table)
    assert B.read_point(spark, table, "trade_id", 302).count() == 1


def test_index_survives_vacuum_and_missing_index_means_full_read(spark, table):
    # no index yet: read_point is just filter-over-full-read
    assert B.read_point(spark, table, "trade_id", 5).count() == 1
    B.build_bloom_index(spark, table, "trade_id")
    S.compact_snapshot(spark, table)
    S.vacuum(table)
    # post-compact files are NEWER than the index -> conservative read,
    # still correct; the sidecar itself was not swept
    assert B._pointer(table, "trade_id").exists()
    assert B.read_point(spark, table, "trade_id", 5).count() == 1
