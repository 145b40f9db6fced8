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
