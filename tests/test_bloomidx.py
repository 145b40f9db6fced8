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
    meta, _gen = B._read_pointer(table, "trade_id")
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
    assert B.index_exists(table, "trade_id")
    assert B.read_point(spark, table, "trade_id", 5).count() == 1


def test_concurrent_extends_lose_no_coverage(spark, table, monkeypatch):
    """r11 verdict #2 (the one 'weak' grade): the pointer publish was a
    read-modify-write, so two overlapping extends could both read the old
    pointer and the loser's coverage silently vanished (its files read
    forever-unpruned) with its dir orphaned. The generation CAS makes the
    loser recompute: afterwards BOTH extensions' keys probe through the
    index, the pointer covers the head, and every sidecar dir on disk is
    referenced by the pointer (no orphans)."""
    from pathlib import Path

    B.build_bloom_index(spark, table, "trade_id")
    S.append(_batch(spark, 1, [700]), table)
    # interleave: while extend A is between its pointer read and publish
    # (inside _write_idx_dir), extend B runs start-to-finish and wins
    real_write = B._write_idx_dir
    state = {"fired": False}

    def interleave(path, key_col, head, words):
        dest = real_write(path, key_col, head, words)
        if not state["fired"]:
            state["fired"] = True
            S.append(_batch(spark, 2, [800]), table)  # B's new file
            B.extend_bloom_index(spark, table, "trade_id")  # B wins
        return dest

    monkeypatch.setattr(B, "_write_idx_dir", interleave)
    # A loses the CAS and retries against B's pointer; B (which ran at
    # the later head) already covered BOTH new files, so A's retry is
    # correctly a no-op — None is the CAS working, not lost coverage
    meta = B.extend_bloom_index(spark, table, "trade_id")
    monkeypatch.setattr(B, "_write_idx_dir", real_write)
    assert meta is None
    final, _gen = B._read_pointer(table, "trade_id")
    assert final["version"] == S.latest_version(table)
    # both keys' files are covered AND prunable (not just conservatively
    # read): each probe opens fewer files than the table has
    n_all = len(S.read_snapshot(spark, table).inputFiles())
    for key in (700, 800):
        hit = B.read_point(spark, table, "trade_id", key)
        assert [r["trade_id"] for r in hit.collect()] == [key]
        assert len(hit.inputFiles()) < n_all, f"key {key} read unpruned"
    # no orphan dirs: disk == pointer's dirs ∪ prev (A's losing dir was
    # removed by A itself on retry)
    live = set(final["dirs"]) | set(final.get("prev") or [])
    on_disk = {
        d.name for d in (Path(table) / B.IDX_DIR).iterdir() if d.is_dir()
    }
    assert on_disk == live, (on_disk, live)


def test_thread_stress_extends_and_rebuilds_converge(spark, table):
    """Real threads: 4 writers racing extends (after distinct appends)
    and one rebuild. Whatever interleaving, the final pointer must cover
    every appended key and reference only existing dirs."""
    from concurrent.futures import ThreadPoolExecutor
    from pathlib import Path

    B.build_bloom_index(spark, table, "trade_id")
    keys = [900 + i for i in range(4)]

    def writer(k):
        S.append(_batch(spark, 1 + (k % 3), [900 + k]), table)
        if k == 2:
            return B.build_bloom_index(spark, table, "trade_id")
        return B.extend_bloom_index(spark, table, "trade_id")

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(writer, range(4)))
    # converge: one last extend covers whatever the races left stale
    B.extend_bloom_index(spark, table, "trade_id")
    for key in keys:
        assert B.read_point(spark, table, "trade_id", key).count() == 1
    final, _gen = B._read_pointer(table, "trade_id")
    idx_root = Path(table) / B.IDX_DIR
    for d in set(final["dirs"]):
        assert (idx_root / d).exists(), f"pointer references missing dir {d}"


def test_compact_bloom_index_folds_dirs_probes_bit_identical(spark, table):
    """r11 verdict #3: N extensions accumulate N+1 small dirs; compaction
    folds them into ONE with probes bit-identical (same maybe-sets for
    hits, misses, and keys from every extension generation)."""
    from pathlib import Path

    B.build_bloom_index(spark, table, "trade_id")
    for i in range(4):
        S.append(_batch(spark, 1 + (i % 3), [1000 + i]), table)
        B.extend_bloom_index(spark, table, "trade_id")
    before_meta, _g = B._read_pointer(table, "trade_id")
    assert len(before_meta["dirs"]) == 5
    probes = [0, 57, 1000, 1003, 999_999]
    before = {
        v: B._maybe_files(spark, table, "trade_id", [v])[0] for v in probes
    }
    assert B.compact_bloom_index(spark, table, "trade_id", max_dirs=2) is not None
    after_meta, _g = B._read_pointer(table, "trade_id")
    assert len(after_meta["dirs"]) == 1
    assert after_meta["version"] == before_meta["version"]
    assert after_meta["bits"] == before_meta["bits"]
    for v in probes:
        assert B._maybe_files(spark, table, "trade_id", [v])[0] == before[v], v
    # under threshold -> no-op; the superseded dirs sit in the grace
    # window (prev) and the NEXT supersede sweeps them
    assert B.compact_bloom_index(spark, table, "trade_id", max_dirs=2) is None
    assert set(after_meta["prev"]) == set(before_meta["dirs"])
    B.build_bloom_index(spark, table, "trade_id")  # next supersede
    final, _g = B._read_pointer(table, "trade_id")
    idx_root = Path(table) / B.IDX_DIR
    for d in before_meta["dirs"]:
        assert not (idx_root / d).exists(), f"grandparent dir {d} not swept"


def test_sweep_bloom_orphans_age_guarded(spark, table, tmp_path):
    from pathlib import Path

    B.build_bloom_index(spark, table, "trade_id")
    idx_root = Path(table) / B.IDX_DIR
    orphan = idx_root / "bloom-trade_id-v99-deadbeef"
    orphan.mkdir()
    (orphan / "junk.parquet").write_bytes(b"x")
    # younger than the age guard: NEVER swept (could be an in-flight
    # extension that has not claimed the pointer yet)
    assert B.sweep_bloom_orphans(table) == []
    assert orphan.exists()
    # old enough: swept; live dirs untouched
    removed = B.sweep_bloom_orphans(table, min_age_sec=0.0)
    assert removed == [orphan.name]
    meta, _g = B._read_pointer(table, "trade_id")
    for d in meta["dirs"]:
        assert (idx_root / d).exists()
    assert B.read_point(spark, table, "trade_id", 57).count() == 1


def test_pointer_parser_and_sweep_survive_dot_g_key_names(tmp_path):
    """r13 (ADVICE): a key column whose NAME contains '.g' (e.g. 'a.gx')
    was truncated to 'a' by the naive split — its live pointer was never
    read, its dirs never marked live, and the sweep deleted a live
    index. The anchored parser keeps the key intact."""
    import json

    assert B._parse_ptr_name("bloom-a.gx.g3.json") == ("a.gx", 3)
    assert B._parse_ptr_name("bloom-a.gx.json") == ("a.gx", 0)
    assert B._parse_ptr_name("bloom-symbol.g12.json") == ("symbol", 12)
    assert B._parse_ptr_name("not-a-pointer.txt") is None

    from pathlib import Path

    table = tmp_path / "t"
    idx_root = Path(table) / B.IDX_DIR
    idx_root.mkdir(parents=True)
    live = idx_root / "bloom-a.gx-v1-cafe01"
    live.mkdir()
    (idx_root / "bloom-a.gx.g1.json").write_text(
        json.dumps({"dirs": [live.name], "version": 1})
    )
    assert B.sweep_bloom_orphans(str(table), min_age_sec=0.0) == []
    assert live.exists()
    # and the truncated key must NOT resolve to the other key's pointer
    assert B._read_pointer(str(table), "a") is None
    meta, gen = B._read_pointer(str(table), "a.gx")
    assert gen == 1 and meta["dirs"] == [live.name]


def test_publish_behind_newer_generation_raises_not_false_success(tmp_path):
    """r13 (ADVICE): winners unlink generations <= their own, REOPENING
    those numbers — a delayed publisher whose target was claimed and
    cleaned by two back-to-back winners could os.link a stale generation
    'successfully' even though a higher one governs (readers pick max
    gen: the pointer is dead on arrival, and its supersede cleanup would
    run against stale meta). The post-claim re-glob undoes the link and
    reports the race."""
    import json
    from pathlib import Path

    table = tmp_path / "t"
    idx_root = Path(table) / B.IDX_DIR
    idx_root.mkdir(parents=True)
    d5 = idx_root / "dir-g5"
    d5.mkdir()
    (idx_root / "bloom-k.g5.json").write_text(json.dumps({"dirs": [d5.name]}))
    with pytest.raises(B.PointerRace):
        B._publish_pointer(
            str(table), "k", {"dirs": ["dir-stale"]}, supersede=True, expect_gen=1
        )
    assert not (idx_root / "bloom-k.g2.json").exists()
    meta, gen = B._read_pointer(str(table), "k")
    assert gen == 5 and meta["dirs"] == [d5.name] and d5.exists()
