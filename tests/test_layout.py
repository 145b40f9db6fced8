"""Physical layout tests: partitioned writes, partition pruning, read-time
dedup (ReplacingMergeTree analog), compaction, retention."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans import layout


def _utc(s: str) -> datetime:
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


def _trades_df(spark):
    rows = []
    for m, month in enumerate(("2024-01", "2024-02", "2024-03")):
        for i in range(10):
            rows.append(
                (
                    "BTCUSDT",
                    m * 100 + i,
                    100.0 + i,
                    1.0,
                    _utc(f"{month}-05 12:00:{i:02d}"),
                    i % 2,
                    _utc(f"{month}-05 12:00:{i:02d}"),
                )
            )
    return spark.createDataFrame(
        rows,
        "symbol string, trade_id long, price double, qty double, ts timestamp,"
        " is_buyer_maker int, ingested_at timestamp",
    )


def test_write_table_partitions_and_sort(spark, tmp_path):
    path = str(tmp_path / "trades")
    layout.write_table(_trades_df(spark), path)
    parts = sorted(p.name for p in (tmp_path / "trades").glob("p_month=*"))
    assert parts == ["p_month=202401", "p_month=202402", "p_month=202403"]
    assert layout.read_table(spark, path).count() == 30


def test_month_pruned_hits_partition_filters(spark, tmp_path):
    path = str(tmp_path / "trades")
    layout.write_table(_trades_df(spark), path)
    df = layout.read_table(spark, path)
    pruned = layout.month_pruned(df, _utc("2024-02-01 00:00:00"), _utc("2024-02-28 00:00:00"))
    assert pruned.count() == 10
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the p_month predicates must land in PartitionFilters (pruning, not scan)
    assert "PartitionFilters" in plan
    assert plan.split("PartitionFilters")[1].split("]")[0].count("p_month") >= 2


def test_dedup_view_keeps_latest_version(spark):
    df = spark.createDataFrame(
        [
            ("BTCUSDT", 1, 100.0, 1.0, _utc("2024-01-01 00:00:00"), 0, _utc("2024-01-01 00:00:01")),
            ("BTCUSDT", 1, 999.0, 9.0, _utc("2024-01-01 00:00:00"), 0, _utc("2024-01-01 00:00:05")),
            ("BTCUSDT", 2, 101.0, 1.0, _utc("2024-01-01 00:00:00"), 0, _utc("2024-01-01 00:00:01")),
        ],
        "symbol string, trade_id long, price double, qty double, ts timestamp,"
        " is_buyer_maker int, ingested_at timestamp",
    )
    out = {r["trade_id"]: r["price"] for r in layout.dedup_view(df).collect()}
    assert out == {1: 999.0, 2: 101.0}  # max ingested_at wins


def test_compact_collapses_duplicates(spark, tmp_path):
    path = str(tmp_path / "trades")
    df = _trades_df(spark)
    layout.write_table(df, path)
    # re-ingest the same rows with a later ingested_at (reconnect replay)
    layout.write_table(
        df.withColumn("ingested_at", F.col("ingested_at") + F.expr("INTERVAL 1 HOUR")), path
    )
    assert layout.read_table(spark, path).count() == 60
    layout.compact(spark, path)
    after = layout.read_table(spark, path)
    assert after.count() == 30
    # survivors are the later ingestion
    assert after.where(F.col("ingested_at") == F.col("ts")).count() == 0


def test_recover_compaction_heals_crash_window(spark, tmp_path):
    """Simulate every hard-crash state of compact()'s rename swap and check
    recover_compaction restores a readable, correct table."""
    import shutil

    path = str(tmp_path / "trades")
    df = _trades_df(spark)

    # state 1: crash between the two renames AFTER a complete tmp write
    # (live path absent, .compact.old = pre-compaction, .compact.tmp done)
    layout.write_table(df, path)
    layout.write_table(
        df.withColumn("ingested_at", F.col("ingested_at") + F.expr("INTERVAL 1 HOUR")), path
    )
    compacted = str(tmp_path / "compacted_copy")
    layout.compact(spark, path)  # produce the finished rewrite to replay from
    shutil.copytree(path, compacted)
    shutil.rmtree(path)
    shutil.copytree(compacted, path + ".compact.tmp")
    layout.write_table(df, path + ".compact.old")  # stale pre-compaction copy
    assert layout.recover_compaction(path) == "promoted_tmp"
    assert layout.read_table(spark, path).count() == 30
    assert not (tmp_path / "trades.compact.old").exists()

    # state 2: crash after dest.rename(old), tmp incomplete (no _SUCCESS) —
    # healed IMPLICITLY by read_table's auto-recovery, no explicit call
    shutil.rmtree(path)
    layout.write_table(df, path + ".compact.old")
    (tmp_path / "trades.compact.tmp").mkdir()
    (tmp_path / "trades.compact.tmp" / "part-partial.parquet").write_bytes(b"junk")
    assert layout.read_table(spark, path).count() == 30
    assert not (tmp_path / "trades.compact.tmp").exists()
    assert not (tmp_path / "trades.compact.old").exists()

    # state 3: healthy table → no-op, leftovers swept
    layout.write_table(df, path + ".compact.old")
    assert layout.recover_compaction(path) is None
    assert not (tmp_path / "trades.compact.old").exists()
    assert layout.read_table(spark, path).count() == 30


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Fact-fact join on co-bucketed tables must plan without an Exchange on
    either side — the zero-shuffle orders ⋈ lineitem layout."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bux LOCATION '{tmp_path}/bux'")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    layout.write_bucketed(o, "bux.orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    layout.write_bucketed(l, "bux.lineitem_b", "l_orderkey", 8, sort_col="l_orderkey")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bux.lineitem_b").join(
            spark.table("bux.orders_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # correctness: same row count as the plain (shuffled) join
        assert j.count() == l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP DATABASE bux CASCADE")


def test_apply_retention_drops_old_months(spark, tmp_path):
    path = str(tmp_path / "trades")
    layout.write_table(_trades_df(spark), path)
    dropped = layout.apply_retention(path, cutoff_month="202402")
    assert dropped == ["p_month=202401"]
    assert layout.read_table(spark, path).count() == 20


def test_recover_compaction_tolerates_concurrent_healer(tmp_path, monkeypatch):
    """Two readers can both observe the live path absent and race to heal;
    the rename loser must treat 'dest exists now' as success instead of
    propagating OSError out of read_table (the table IS healthy)."""
    from pathlib import Path

    dest = tmp_path / "t"
    tmp = tmp_path / "t.compact.tmp"
    tmp.mkdir()
    (tmp / "_SUCCESS").touch()

    real_rename = Path.rename

    def losing_rename(self, target):
        # the other healer promotes dest the instant before our rename lands
        Path(target).mkdir(exist_ok=True)
        raise OSError("rename: target exists")

    monkeypatch.setattr(Path, "rename", losing_rename)
    assert layout.recover_compaction(str(dest)) == "promoted_tmp"
    monkeypatch.setattr(Path, "rename", real_rename)

    # and when the other healer already finished entirely (no leftovers,
    # dest present), recovery is a no-op rather than FileNotFoundError
    assert layout.recover_compaction(str(dest)) is None
