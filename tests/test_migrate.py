"""Migration-runner tests (SURVEY.md §5.5): apply, skip, checksum-mismatch."""

from __future__ import annotations

import pytest

from crypto_clickhouse_poc_spark.plans import migrate


def _write_sql(d, name, text):
    p = d / name
    p.write_text(text)
    return p


def test_apply_then_skip_then_drift(spark, tmp_path):
    sql_dir = tmp_path / "sql"
    sql_dir.mkdir()
    registry = str(tmp_path / "registry")
    _write_sql(
        sql_dir,
        "V1__base.sql",
        "-- comment line\n"
        "CREATE OR REPLACE TEMPORARY VIEW mig_t1 AS SELECT 1 AS x;\n"
        "CREATE OR REPLACE TEMPORARY VIEW mig_t2 AS SELECT 2 AS x;\n",
    )
    _write_sql(
        sql_dir, "V2__more.sql", "CREATE OR REPLACE TEMPORARY VIEW mig_t3 AS SELECT 3 AS x"
    )

    applied = migrate.run(spark, str(sql_dir), registry)
    assert applied == ["V1__base.sql", "V2__more.sql"]  # version order
    assert spark.sql("SELECT * FROM mig_t3").collect()[0]["x"] == 3

    # second run: everything already applied → no-op
    assert migrate.run(spark, str(sql_dir), registry) == []

    # new migration applies incrementally
    _write_sql(
        sql_dir, "V3__late.sql", "CREATE OR REPLACE TEMPORARY VIEW mig_t4 AS SELECT 4 AS x"
    )
    assert migrate.run(spark, str(sql_dir), registry) == ["V3__late.sql"]

    # editing an applied file is refused (drift detection)
    _write_sql(
        sql_dir, "V1__base.sql", "CREATE OR REPLACE TEMPORARY VIEW mig_t1 AS SELECT 99 AS x"
    )
    with pytest.raises(migrate.ChecksumMismatch):
        migrate.run(spark, str(sql_dir), registry)


def test_statement_error_context(spark, tmp_path):
    sql_dir = tmp_path / "sql"
    sql_dir.mkdir()
    _write_sql(sql_dir, "V1__bad.sql", "SELECT 1;\nSELECT FROM nonsense syntax here")
    with pytest.raises(RuntimeError, match=r"V1__bad\.sql statement 2 failed"):
        migrate.run(spark, str(sql_dir), str(tmp_path / "registry"))


def test_non_matching_files_ignored(tmp_path):
    (tmp_path / "notes.sql").write_text("SELECT 1")
    (tmp_path / "V9__ok.sql").write_text("SELECT 1")
    found = migrate.discover(str(tmp_path))
    assert [m.filename for m in found] == ["V9__ok.sql"]


def test_shipped_ddl_files_apply(spark, tmp_path):
    """The repo's real sql/V1,V2 files (Spark rewrites of the reference
    sql/V1__create_trades_table.sql / V2__create_trades_1m_view.sql) apply
    through the runner; the trades table takes inserts with the DEFAULT
    ingested_at, the partials table takes real partial_bars output, and the
    trades_1m_final merge view equals the batch recompute."""
    from pathlib import Path

    import pyspark.sql.functions as F

    from crypto_clickhouse_poc_spark.streaming import bars

    repo_sql = Path(__file__).resolve().parents[1] / "sql"
    registry = str(tmp_path / "registry")
    spark.sql("DROP DATABASE IF EXISTS crypto CASCADE")
    try:
        applied = migrate.run(spark, str(repo_sql), registry)
        assert applied == ["V1__create_trades.sql", "V2__create_trades_1m.sql"]
        # idempotent: second run over the same real files is a no-op
        assert migrate.run(spark, str(repo_sql), registry) == []

        spark.sql(
            "INSERT INTO crypto.trades (symbol, trade_id, price, qty, ts,"
            " is_buyer_maker, p_month) VALUES"
            " ('BTCUSDT', 1, 10.0, 0.5, TIMESTAMP'2024-01-01 00:00:01', 0, '202401'),"
            " ('BTCUSDT', 2, 11.0, 0.25, TIMESTAMP'2024-01-01 00:00:02', 1, '202401')"
        )
        got = spark.table("crypto.trades")
        assert got.count() == 2
        assert got.where("ingested_at IS NULL").count() == 0  # DEFAULT filled

        # two "insert blocks" splitting a minute -> two partials, merged view
        trades = spark.createDataFrame(
            [
                ("BTCUSDT", 1, 10.0, 0.5, "2024-01-01 00:00:01"),
                ("BTCUSDT", 2, 11.0, 0.25, "2024-01-01 00:00:02"),
                ("BTCUSDT", 3, 9.0, 1.0, "2024-01-01 00:00:03"),
            ],
            "symbol string, trade_id long, price double, qty double, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        for block in (trades.where("trade_id <= 1"), trades.where("trade_id > 1")):
            bars.partial_bars(block).withColumn(
                "p_month", F.date_format("minute", "yyyyMM")
            ).write.insertInto("crypto.trades_1m")
        assert spark.table("crypto.trades_1m").count() == 2  # genuine partials
        merged = spark.table("crypto.trades_1m_final").collect()
        direct = bars.bars_batch(trades).collect()
        key = lambda r: (r["minute"], r["symbol"])
        assert {key(r): (r["open"], r["high"], r["low"], r["close"], r["volume"], r["trades"]) for r in merged} == \
               {key(r): (r["open"], r["high"], r["low"], r["close"], r["volume"], r["trades"]) for r in direct}

        # drift detection against the real content: apply a pristine copy,
        # then edit the copy (the repo files themselves stay immutable)
        drift_dir = tmp_path / "sql_copy"
        drift_dir.mkdir()
        for p in repo_sql.glob("V*__*.sql"):
            (drift_dir / p.name).write_text(p.read_text())
        reg2 = str(tmp_path / "registry2")
        spark.sql("DROP DATABASE IF EXISTS crypto CASCADE")
        assert len(migrate.run(spark, str(drift_dir), reg2)) == 2
        v1 = drift_dir / "V1__create_trades.sql"
        v1.write_text(v1.read_text() + "\n-- edited after apply\n")
        with pytest.raises(migrate.ChecksumMismatch):
            migrate.run(spark, str(drift_dir), reg2)
    finally:
        spark.sql("DROP DATABASE IF EXISTS crypto CASCADE")
