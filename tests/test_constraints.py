"""CHECK-constraint gates (r14 — ALTER TABLE ADD CONSTRAINT parity).

One metadata commit records {name: expr}; every row-adding write
(append/upsert/merge/overwrite) validates its frame BEFORE files are
written and fails loudly on a violating row. SQL CHECK semantics: NULL
passes. The add itself validates every existing row; constraints
survive compaction, restore on rollback, and pin the columns they
reference against rename/drop.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from crypto_clickhouse_poc_spark.plans import snapshots as S

SCHEMA = "ts timestamp, symbol string, trade_id long, price double, ingested_at long"


def _batch(spark, month: int, ids, price=None, symbol="BTC"):
    rows = [
        (datetime(2024, month, 1 + (i % 27)), symbol, i,
         None if price == "null" else (float(100 + i) if price is None else float(price)),
         0)
        for i in ids
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def table(tmp_path, spark):
    path = str(tmp_path / "cons_table")
    S.append(_batch(spark, 1, range(6)), path)
    return path


def test_add_enforce_and_name_the_culprit(spark, table):
    v = S.add_constraint(spark, table, "pos_price", "price > 0")
    m = S.manifest(table, v)
    assert m["op"] == "add_constraint" and m["data_change"] is False
    assert m["constraints"]["pos_price"]["expr"] == "price > 0"
    assert "price" in m["constraints"]["pos_price"]["cols"]
    with pytest.raises(ValueError, match="pos_price"):
        S.append(_batch(spark, 2, [9], price=-1.0), table)
    # the failed write left nothing behind
    assert S.read_snapshot(spark, table).count() == 6
    S.append(_batch(spark, 2, [9]), table)  # valid rows proceed
    assert S.read_snapshot(spark, table).count() == 7


def test_null_passes_sql_check_semantics(spark, table):
    S.add_constraint(spark, table, "pos_price", "price > 0")
    S.append(_batch(spark, 2, [9], price="null"), table)  # NULL satisfies
    assert S.read_snapshot(spark, table).count() == 7


def test_add_refuses_when_existing_rows_violate(spark, table):
    S.append(_batch(spark, 2, [9], price=-5.0), table)
    with pytest.raises(ValueError, match="existing"):
        S.add_constraint(spark, table, "pos_price", "price > 0")
    assert "constraints" not in S.manifest(table, S.latest_version(table))


def test_enforced_on_upsert_merge_and_overwrite(spark, table):
    S.add_constraint(spark, table, "pos_price", "price > 0")
    with pytest.raises(ValueError, match="pos_price"):
        S.upsert_by_keys(
            _batch(spark, 1, [3], price=-9.0), table, cols=["trade_id"]
        )
    with pytest.raises(ValueError, match="pos_price"):
        S.merge_into(
            spark, table, _batch(spark, 1, [3], price=-9.0), keys=["trade_id"]
        )
    with pytest.raises(ValueError, match="pos_price"):
        S.overwrite_months(_batch(spark, 1, range(6), price=-1.0), table)
    assert S.read_snapshot(spark, table).count() == 6  # nothing landed


def test_survives_compaction_and_restores_on_rollback(spark, table):
    S.add_constraint(spark, table, "pos_price", "price > 0")  # v1
    S.compact_snapshot(spark, table)  # v2
    m = S.manifest(table, S.latest_version(table))
    assert "pos_price" in m.get("constraints", {})
    with pytest.raises(ValueError, match="pos_price"):
        S.append(_batch(spark, 2, [9], price=-1.0), table)
    S.rollback(table, 0)  # pre-constraint world
    S.append(_batch(spark, 2, [9], price=-1.0), table)  # legal again
    assert S.read_snapshot(spark, table).count() == 7


def test_drop_constraint_lifts_the_gate(spark, table):
    S.add_constraint(spark, table, "pos_price", "price > 0")
    S.drop_constraint(table, "pos_price")
    S.append(_batch(spark, 2, [9], price=-1.0), table)
    assert S.read_snapshot(spark, table).count() == 7
    with pytest.raises(ValueError, match="no constraint"):
        S.drop_constraint(table, "nope")


def test_referenced_column_refuses_rename_and_drop(spark, table):
    S.add_constraint(spark, table, "pos_price", "price > 0")
    with pytest.raises(ValueError, match="pos_price"):
        S.rename_column(table, "price", "px")
    with pytest.raises(ValueError, match="pos_price"):
        S.drop_column(table, "price")
    # unreferenced columns still rename freely
    S.rename_column(table, "symbol", "sym")
    assert "sym" in S.read_snapshot(spark, table).columns


def test_duplicate_name_refused(spark, table):
    S.add_constraint(spark, table, "pos_price", "price > 0")
    with pytest.raises(ValueError, match="already exists"):
        S.add_constraint(spark, table, "pos_price", "price > 1")


def test_multi_column_constraint_pins_both(spark, table):
    S.add_constraint(
        spark, table, "id_vs_price", "price >= 100 OR trade_id < 0"
    )
    cols = S.manifest(table, S.latest_version(table))["constraints"][
        "id_vs_price"
    ]["cols"]
    assert set(cols) == {"price", "trade_id"}


def test_frame_missing_the_constrained_column_passes_exactly(spark, table):
    """Schema-evolution interplay: a write whose frame lacks the
    constrained column null-fills it, and NULL satisfies CHECK — the
    gate skips such constraints instead of crashing analysis."""
    S.add_constraint(spark, table, "pos_price", "price > 0")
    S.append(_batch(spark, 2, [9]).drop("price"), table)
    got = {r.trade_id: r.price for r in S.read_snapshot(spark, table).collect()}
    assert got[9] is None and len(got) == 7


def test_null_rejecting_constraint_gates_omitted_column(spark, table):
    """A writer OMITTING the constrained column must face the same CHECK
    as one carrying explicit NULLs (the landing value is NULL either
    way): null-rejecting expressions are evaluated over the null-filled
    frame, not skipped (r15 — ADVICE fix)."""
    # existing rows all carry a price, so the add validates
    S.add_constraint(spark, table, "price_present", "price IS NOT NULL")
    with pytest.raises(ValueError, match="price_present"):
        S.append(_batch(spark, 2, [9]).drop("price"), table)
    with pytest.raises(ValueError, match="price_present"):
        S.append(_batch(spark, 2, [9], price="null"), table)  # parity
    assert S.read_snapshot(spark, table).count() == 6  # nothing landed


def test_null_sensitive_coalesce_constraint_gates_omitted_column(spark, table):
    S.add_constraint(spark, table, "pos_price", "coalesce(price, -1.0) > 0")
    with pytest.raises(ValueError, match="pos_price"):
        S.append(_batch(spark, 2, [9]).drop("price"), table)
    S.append(_batch(spark, 2, [9]), table)  # carried price still fine
    assert S.read_snapshot(spark, table).count() == 7


def test_default_fills_before_the_check_on_omitted_column(spark, table):
    """Order of write-side contracts: DEFAULT fill runs first, so an
    omitted column with a default is checked at its DEFAULT value, not
    at NULL."""
    S.set_column_default(spark, table, "price", "3.5")
    S.add_constraint(spark, table, "price_present", "price IS NOT NULL")
    S.append(_batch(spark, 2, [9]).drop("price"), table)  # default passes
    got = {r.trade_id: r.price for r in S.read_snapshot(spark, table).collect()}
    assert got[9] == 3.5
