"""Transactional SCD2 apply gates (streaming/cdc.scd2_apply_snapshot):
the MERGE-INTO seat over the snapshot log.

The contract: batch-by-batch equivalence with the scd2_merge algebra
(the same dimension content, now with per-batch time travel), detected-
change idempotency under re-delivery, and the copy-on-write economics —
a batch rewrites only the files holding the changed keys' CURRENT
versions, never the history files."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.operators import warehouse as W
from crypto_clickhouse_poc_spark.plans import snapshots as S
from crypto_clickhouse_poc_spark.streaming import cdc
from tests.conftest import SF_CORRECT

TS1 = cdc.default_batch_ts(0)  # 2024-02-01
TS2 = cdc.default_batch_ts(1)  # 2024-02-02


def _rows(df):
    # canonical column order: merge_into emits keys first, scd2_merge the
    # original schema order — same values, so compare name-sorted
    cols = sorted(c for c in df.columns if c != "p_month")
    return sorted(map(tuple, df.select(*cols).collect()))


def _init(spark, tmp_path):
    dim0, upd = W._scd2_inputs(spark, SF_CORRECT)
    path = str(tmp_path / "dim_snap")
    S.append(dim0, path, ts_col="effective_from")
    u1 = upd.where("key % 20 = 0")
    u2 = upd.where("key % 20 = 10").withColumn(
        "acctbal", F.round(F.col("acctbal") - 55.0, 2)
    )
    return dim0, u1, u2, path


def test_snapshot_apply_matches_sequential_scd2_merges(spark, tmp_path):
    dim0, u1, u2, path = _init(spark, tmp_path)
    v1 = cdc.scd2_apply_snapshot(path, u1, TS1)
    cdc.scd2_apply_snapshot(path, u2, TS2)
    want = W.scd2_merge(W.scd2_merge(dim0, u1, TS1), u2, TS2)
    assert _rows(S.read_snapshot(spark, path)) == _rows(want)
    # per-batch time travel: the intermediate state is a readable version
    assert _rows(S.read_snapshot(spark, path, version=v1)) == _rows(
        W.scd2_merge(dim0, u1, TS1)
    )


def test_snapshot_apply_redelivered_batch_is_a_noop_commit(spark, tmp_path):
    _dim0, u1, _u2, path = _init(spark, tmp_path)
    v1 = cdc.scd2_apply_snapshot(path, u1, TS1)
    before = _rows(S.read_snapshot(spark, path))
    # foreachBatch re-delivery: same batch, later effective ts — change
    # detection stages an empty source and the merge commits NOTHING
    v2 = cdc.scd2_apply_snapshot(path, u1, TS2)
    assert v2 == v1 == S.latest_version(path)
    assert _rows(S.read_snapshot(spark, path)) == before


def test_snapshot_apply_never_rewrites_history_files(spark, tmp_path):
    _dim0, u1, _u2, path = _init(spark, tmp_path)
    cdc.scd2_apply_snapshot(path, u1, TS1)
    # after batch 1, the closed versions + untouched rows live in files
    # whose rows all have effective_from in the ORIGINAL months; batch 2
    # re-changes the SAME keys (current versions now keyed at TS1) — only
    # the TS1-era file may be rewritten
    v_before = S.latest_version(path)
    files_before = {f["path"] for f in S.manifest(path, v_before)["files"]}
    ts1_month = "2024" + TS1[5:7]
    history_files = {
        f["path"]
        for f in S.manifest(path, v_before)["files"]
        if f["p_month"] != ts1_month
    }
    assert history_files  # the fixture's original months really are distinct
    u1_again = u1.withColumn("acctbal", F.round(F.col("acctbal") + 7.0, 2))
    v = cdc.scd2_apply_snapshot(path, u1_again, TS2)
    files_after = {f["path"] for f in S.manifest(path, v)["files"]}
    assert history_files <= files_after  # history carried by reference
    assert files_before - files_after  # and something WAS copy-on-written


def test_snapshot_apply_streaming_seat(spark, tmp_path):
    import glob
    import os
    import shutil

    dim0, u1, u2, path = _init(spark, tmp_path)
    flat = tmp_path / "cdc_flat"
    flat.mkdir()
    for k, u in enumerate((u1, u2)):
        chunk = str(tmp_path / f"chunk-{k:05d}")
        u.coalesce(1).write.parquet(chunk)
        f = glob.glob(chunk + "/*.parquet")[0]
        dst = str(flat / f"chunk-{k:05d}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (1_700_000_000 + k, 1_700_000_000 + k))
    stream = (
        spark.readStream.schema("key long, name string, acctbal double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    q = cdc.start_scd2_apply_snapshot(stream, path, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    want = W.scd2_merge(W.scd2_merge(dim0, u1, TS1), u2, TS2)
    assert _rows(S.read_snapshot(spark, path)) == _rows(want)
    assert S.history(path)[-1]["op"] == "merge"
