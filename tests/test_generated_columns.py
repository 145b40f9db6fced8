"""Generated-column gates (r15 — Delta GENERATED ALWAYS AS parity).

One metadata commit declares ``col GENERATED ALWAYS AS (expr)``; every
later row-adding write fills a missing ``col`` from the row's other
columns (cast to the logged type — the partition-derivation pattern)
and REFUSES a provided value that contradicts the expression (the Delta
rule: omit or match, never contradict). The declaration validates
existing rows; the contract is carried across every op, restored by
rollback, and pins referenced columns against rename/drop.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans import snapshots as S

SCHEMA = "ts timestamp, symbol string, trade_id long, price double, minute timestamp"


def _batch(spark, month: int, ids, minute="derive", price=None):
    rows = []
    for i in ids:
        ts = datetime(2024, month, 1 + (i % 27), 10, 30 + (i % 29), 17)
        mn = ts.replace(second=0) if minute == "derive" else minute
        rows.append(
            (ts, "AB"[i % 2] * 3, i,
             float(100 + i) if price is None else float(price), mn)
        )
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def table(tmp_path, spark):
    path = str(tmp_path / "gen_table")
    S.append(_batch(spark, 1, range(4)), path)
    S.set_generated_column(
        spark, path, "minute", "date_trunc('minute', ts)"
    )
    return path


def test_missing_generated_column_is_computed_on_write(spark, table):
    S.append(_batch(spark, 2, [9]).drop("minute"), table)
    got = {r.trade_id: (r.ts, r.minute) for r in S.read_snapshot(spark, table).collect()}
    ts, mn = got[9]
    assert mn == ts.replace(second=0, microsecond=0)
    assert len(got) == 5


def test_contradicting_provided_value_is_refused(spark, table):
    bad = _batch(spark, 2, [9], minute=datetime(1999, 1, 1))
    with pytest.raises(ValueError, match="generated-column contract"):
        S.append(bad, table)
    S.append(_batch(spark, 2, [9]), table)  # matching value: fine
    assert S.read_snapshot(spark, table).count() == 5


def test_declaration_validates_existing_rows(spark, tmp_path):
    path = str(tmp_path / "gv")
    S.append(_batch(spark, 1, range(3), minute=datetime(1999, 1, 1)), path)
    with pytest.raises(ValueError, match="existing row disagrees"):
        S.set_generated_column(spark, path, "minute", "date_trunc('minute', ts)")


def test_expression_validation(spark, table):
    with pytest.raises(ValueError, match="already generated"):
        S.set_generated_column(spark, table, "minute", "date_trunc('minute', ts)")
    with pytest.raises(ValueError, match="no column"):
        S.set_generated_column(spark, table, "nope", "1")
    with pytest.raises(ValueError, match="other columns"):
        S.set_generated_column(spark, table, "price", "nonexistent + 1")
    # self-reference fails the same other-columns analysis (the probe
    # frame drops the target column, so `price` is unresolvable)
    with pytest.raises(ValueError, match="other columns"):
        S.set_generated_column(spark, table, "price", "price * 1")
    with pytest.raises(ValueError, match="either defaulted or generated"):
        S.set_column_default(spark, table, "minute", "timestamp'2024-01-01'")


def test_contract_carries_and_rollback_restores(spark, table):
    S.append(_batch(spark, 2, [9]).drop("minute"), table)
    S.compact_snapshot(spark, table, keys=("ts", "symbol", "trade_id"),
                       version_col="trade_id")
    assert "minute" in S.table_details(table)["generated"]
    with pytest.raises(ValueError, match="generated-column contract"):
        S.append(_batch(spark, 2, [10], minute=datetime(1999, 1, 1)), table)
    before = S.latest_version(table)
    S.drop_generated_column_expr(table, "minute")
    S.append(_batch(spark, 2, [10], minute=datetime(1999, 1, 1)), table)  # gate lifted
    S.rollback(table, before)
    with pytest.raises(ValueError, match="generated-column contract"):
        S.append(_batch(spark, 2, [11], minute=datetime(1999, 1, 1)), table)


def test_referenced_column_refuses_rename_and_drop(spark, table):
    with pytest.raises(ValueError, match="referenced by generated"):
        S.rename_column(table, "ts", "ts2")
    with pytest.raises(ValueError, match="referenced by generated"):
        S.drop_column(table, "ts")
    # the GENERATED column itself renames (the contract follows it) and
    # drops (the contract dies with it)
    S.rename_column(table, "minute", "bucket")
    assert "bucket" in S.table_details(table)["generated"]
    S.append(
        _batch(spark, 2, [9]).drop("minute"), table
    )  # fill still applies under the new name
    got = {r.trade_id: r.bucket for r in S.read_snapshot(spark, table).collect()}
    assert got[9] is not None
    S.drop_column(table, "bucket")
    assert S.table_details(table)["generated"] == {}


def test_missing_source_column_evaluates_over_the_landing_null(spark, tmp_path):
    """Review r15: a frame missing a SOURCE column of the generation
    expression must be handled like the constraint pass handles it —
    evaluated over the typed null that will physically land — not crash
    analysis with an unresolved-column error. (The source here is a
    NON-layout column: a frame missing the layout time column can never
    be written, generated or not.)"""
    path = str(tmp_path / "gsrc")
    S.append(_batch(spark, 1, range(3)).withColumn(
        "sym_uc", F.upper(F.col("symbol"))), path)
    S.set_generated_column(spark, path, "sym_uc", "upper(symbol)")
    # neither symbol nor sym_uc: sym_uc computes upper(null) = null
    frame = (_batch(spark, 2, [9]).drop("minute")
             .drop("symbol"))
    S.append(frame, path)
    got = {r.trade_id: (r.symbol, r.sym_uc)
           for r in S.read_snapshot(spark, path).collect()}
    assert got[9] == (None, None)
    # sym_uc provided non-null while symbol is absent: contradicts the
    # null-computed value -> the GOVERNED contract error, not analysis
    bad = (_batch(spark, 2, [10]).drop("minute").drop("symbol")
           .withColumn("sym_uc", F.lit("ZZZ")))
    with pytest.raises(ValueError, match="generated-column contract"):
        S.append(bad, path)
