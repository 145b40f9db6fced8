"""Column-DEFAULT gates (r14 — ALTER COLUMN SET DEFAULT parity).

One metadata commit records {col: expr}; a later row-adding write whose
frame LACKS the column writes the default (cast to the logged type)
instead of null. Defaults apply to writes AFTER the set — pre-default
files read back null — and ride the contract rules: carried across every
op, restored by rollback, moved by rename, cleared by drop_column.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from crypto_clickhouse_poc_spark.plans import snapshots as S

SCHEMA = "ts timestamp, symbol string, trade_id long, price double, ingested_at long"


def _batch(spark, month: int, ids, price=None):
    rows = [
        (datetime(2024, month, 1 + (i % 27)), "BTC", i,
         float(100 + i) if price is None else float(price), 0)
        for i in ids
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def table(tmp_path, spark):
    path = str(tmp_path / "dfl_table")
    S.append(_batch(spark, 1, range(4)), path)
    return path


def test_missing_column_takes_default_history_stays_null(spark, table):
    v = S.set_column_default(spark, table, "price", "-1.0")
    assert S.manifest(table, v)["defaults"] == {"price": "-1.0"}
    S.append(_batch(spark, 2, [8, 9]).drop("price"), table)
    rows = {r.trade_id: r.price for r in S.read_snapshot(spark, table).collect()}
    assert rows[8] == -1.0 and rows[9] == -1.0
    assert rows[0] == 100.0  # frames carrying the column are untouched
    # pre-default semantics: a file written BEFORE the set stays null
    S.drop_column_default(table, "price")
    S.append(_batch(spark, 2, [10]).drop("price"), table)
    rows = {r.trade_id: r.price for r in S.read_snapshot(spark, table).collect()}
    assert rows[10] is None


def test_default_casts_to_logged_type(spark, table):
    S.set_column_default(spark, table, "ingested_at", "42")  # int literal
    S.append(_batch(spark, 2, [8]).drop("ingested_at"), table)
    got = S.read_snapshot(spark, table)
    assert dict(got.dtypes)["ingested_at"] == "bigint"
    assert {r.ingested_at for r in got.where("trade_id = 8").collect()} == {42}


def test_default_satisfies_a_check_constraint(spark, table):
    S.add_constraint(spark, table, "pos_price", "price > 0")
    S.set_column_default(spark, table, "price", "1.0")
    S.append(_batch(spark, 2, [8]).drop("price"), table)  # default passes
    assert S.read_snapshot(spark, table).count() == 5
    S.set_column_default(spark, table, "price", "-5.0")  # overwrite default
    with pytest.raises(ValueError, match="pos_price"):
        S.append(_batch(spark, 2, [9]).drop("price"), table)


def test_default_rides_rename_drop_and_rollback(spark, table):
    S.set_column_default(spark, table, "price", "7.0")  # v1
    S.rename_column(table, "price", "px")  # v2: default moves
    assert S.manifest(table, 2)["defaults"] == {"px": "7.0"}
    S.append(_batch(spark, 2, [8]).drop("price", "ingested_at"), table)
    got = {r.trade_id: r.px for r in S.read_snapshot(spark, table).collect()}
    assert got[8] == 7.0
    S.rollback(table, 0)  # pre-default world
    assert "defaults" not in S.manifest(table, S.latest_version(table))
    S.set_column_default(spark, table, "ingested_at", "1")
    S.drop_column(table, "ingested_at")  # drop clears its default
    assert "defaults" not in S.manifest(table, S.latest_version(table))


def test_set_default_validation(spark, table):
    with pytest.raises(Exception):  # column refs are not self-contained
        S.set_column_default(spark, table, "price", "trade_id + 1")
    with pytest.raises(ValueError, match="no column"):
        S.set_column_default(spark, table, "nope", "1")
    with pytest.raises(ValueError, match="no default"):
        S.drop_column_default(table, "price")


def test_default_applies_on_upsert_and_overwrite(spark, table):
    S.set_column_default(spark, table, "price", "3.5")
    S.upsert_by_keys(
        _batch(spark, 1, [2]).drop("price"), table, cols=["trade_id"]
    )
    rows = {r.trade_id: r.price for r in S.read_snapshot(spark, table).collect()}
    assert rows[2] == 3.5
    S.overwrite_months(_batch(spark, 1, range(4)).drop("price"), table)
    rows = {r.trade_id: r.price for r in S.read_snapshot(spark, table).collect()}
    assert set(rows.values()) == {3.5}


def test_default_expr_named_id_is_still_refused(spark, table):
    """The self-containment probe runs against a ZERO-column frame (r15
    — ADVICE fix): an expression referencing a column literally named
    `id` must fail like any other column reference instead of silently
    binding to spark.range's own output column."""
    with pytest.raises(Exception):
        S.set_column_default(spark, table, "price", "id + 1")
    with pytest.raises(Exception):
        S.set_column_default(spark, table, "price", "id")
    S.set_column_default(spark, table, "price", "cast(42 as double)")
