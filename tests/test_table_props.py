"""Table-properties gates (r15 — ALTER TABLE SET/UNSET TBLPROPERTIES).

A generic durable contract surface on the snapshot manifest: string
key/values carried across every op (appends, compaction's total
rewrite), restored by rollback, listed by DESCRIBE DETAIL. The engine's
first consumer is the cdfsink rollup, which records its group/measure
split so the maintenance compaction seat needs no out-of-band config.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans import snapshots as S

SCHEMA = "ts timestamp, symbol string, trade_id long, price double"


def _batch(spark, month: int, ids, price=None):
    rows = [
        (datetime(2024, month, 1 + (i % 27)), "AB"[i % 2] * 3, i,
         float(100 + i) if price is None else float(price))
        for i in ids
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def table(tmp_path, spark):
    path = str(tmp_path / "props_table")
    S.append(_batch(spark, 1, range(4)), path)
    return path


def test_set_get_unset_roundtrip(spark, table):
    v = S.set_table_properties(table, {"owner": "team-data", "tier": "gold"})
    m = S.manifest(table, v)
    assert m["op"] == "set_properties" and m["data_change"] is False
    assert S.table_properties(table) == {"owner": "team-data", "tier": "gold"}
    S.set_table_properties(table, {"tier": "silver"})  # merge, not replace
    assert S.table_properties(table)["tier"] == "silver"
    assert S.table_properties(table)["owner"] == "team-data"
    S.unset_table_properties(table, ["owner"])
    assert S.table_properties(table) == {"tier": "silver"}
    with pytest.raises(ValueError, match="no such properties"):
        S.unset_table_properties(table, ["nope"])
    with pytest.raises(ValueError, match="no properties"):
        S.set_table_properties(table, {})


def test_properties_survive_appends_and_compaction(spark, table):
    S.set_table_properties(table, {"k": "v"})
    S.append(_batch(spark, 2, [9]), table)
    S.compact_snapshot(spark, table, keys=("ts", "symbol", "trade_id"),
                       version_col="trade_id")  # total rewrite carries contracts
    assert S.table_properties(table) == {"k": "v"}
    assert S.table_details(table)["properties"] == {"k": "v"}


def test_rollback_restores_the_target_versions_properties(spark, table):
    S.set_table_properties(table, {"k": "v1"})
    mid = S.latest_version(table)
    S.set_table_properties(table, {"k": "v2", "extra": "x"})
    S.rollback(table, mid)
    assert S.table_properties(table) == {"k": "v1"}


def test_time_travel_reads_the_version_in_force(spark, table):
    v1 = S.set_table_properties(table, {"k": "v1"})
    S.set_table_properties(table, {"k": "v2"})
    assert S.table_properties(table, version=v1) == {"k": "v1"}
    assert S.table_properties(table)["k"] == "v2"


def test_cdf_rollup_is_self_describing_for_the_tick(spark, tmp_path):
    """A CdfMVSpec that is JUST the path: the sink recorded its
    group/measure split as properties on the first fold, and the
    maintenance seat compacts from them — reads invariant."""
    from crypto_clickhouse_poc_spark.plans.maintain import (
        CdfMVSpec,
        maintenance_tick,
    )
    from crypto_clickhouse_poc_spark.streaming import cdfsink as C

    base, mv, ck = (str(tmp_path / p) for p in ("base", "mv", "ck"))
    S.append(_batch(spark, 1, range(6)), base)
    q = C.start_cdf_sum_rollup(
        spark, base, mv, ck, ["ts", "symbol"], ["price"]
    )
    try:
        q.processAllAvailable()
        S.append(_batch(spark, 2, range(6, 9)), base)
        q.processAllAvailable()
    finally:
        q.stop()
    props = S.table_properties(mv)
    assert props["cdf.group_cols"] == '["ts", "symbol"]'
    assert props["cdf.sum_cols"] == '["price"]'
    assert props["cdf.time_col"] == "ts"

    def _read():
        return sorted(
            (r.ts, r.symbol, r.price, r._n)
            for r in C.read_cdf_rollup(spark, mv, ["ts", "symbol"], ["price"]).collect()
        )

    before = _read()
    report = maintenance_tick(
        spark, base, cdf_mvs=[CdfMVSpec(mv_path=mv, max_live_files=1)],
        min_rows=1,
    )
    assert isinstance(report[f"cdf-compact:{mv}"], int)
    assert _read() == before


def test_tick_skips_a_rollup_without_the_properties(spark, tmp_path):
    from crypto_clickhouse_poc_spark.plans.maintain import (
        CdfMVSpec,
        maintenance_tick,
    )

    base, mv = str(tmp_path / "b"), str(tmp_path / "m")
    S.append(_batch(spark, 1, range(3)), base)
    # a hand-built partials table with no cdf.* properties
    S.append(
        _batch(spark, 1, range(3))
        .groupBy("ts", "symbol")
        .agg(F.sum("price").alias("price"), F.count("*").alias("_n")),
        mv,
    )
    report = maintenance_tick(
        spark, base, cdf_mvs=[CdfMVSpec(mv_path=mv, max_live_files=0)],
        min_rows=1,
    )
    assert "no group_cols" in report[f"cdf-compact:{mv}"]


def test_props_recorded_on_first_nonempty_batch_not_batch_zero(spark, tmp_path):
    """Review r15: a stream whose bootstrap batch is EMPTY (consumer
    launched against an empty base) must still become self-describing
    on the first batch that actually folds."""
    from crypto_clickhouse_poc_spark.streaming import cdfsink as C

    base, mv, ck = (str(tmp_path / p) for p in ("base", "mv", "ck"))
    # an empty v0: the bootstrap snapshot has zero rows
    S.append(_batch(spark, 1, []), base)
    q = C.start_cdf_sum_rollup(spark, base, mv, ck, ["ts", "symbol"], ["price"])
    try:
        q.processAllAvailable()  # empty bootstrap — nothing recorded yet
        S.append(_batch(spark, 1, range(4)), base)
        q.processAllAvailable()
    finally:
        q.stop()
    assert "cdf.group_cols" in S.table_properties(mv)
