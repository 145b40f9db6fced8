"""``update_where`` gates (r16 — copy-on-write UPDATE ... SET ... WHERE
over the snapshot log, the Delta/Iceberg UPDATE parity verb).

The binding contracts: only files containing a matching row are
rewritten (untouched files carried by reference — file-level
copy-on-write), existing deletes are never resurrected into updates,
generated columns recompute instead of being assignable, constraints
re-check, time travel below the update is intact, and the commit is
CDC-representable as the merge op it is.
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


def test_update_applies_and_untouched_files_carry_by_reference(spark, tmp_path):
    path = str(tmp_path / "t")
    S.append(_batch(spark, 1, range(4)), path)   # month 1
    S.append(_batch(spark, 2, range(4, 8)), path)  # month 2
    before = {f["path"] for f in S.manifest(path, 1)["files"]}
    month2 = {p for p in before if "2024-02" in p or "p_month=202402" in p}
    v = S.update_where(
        spark, path, "trade_id < 2", {"price": F.col("price") * 2}
    )
    got = {r.trade_id: r.price for r in S.read_snapshot(spark, path).collect()}
    assert got[0] == 200.0 and got[1] == 202.0  # updated
    assert got[2] == 102.0 and got[7] == 107.0  # untouched values
    after = {f["path"] for f in S.manifest(path, v)["files"]}
    # month 2 held no matching row: its files are carried VERBATIM
    assert month2 and month2 <= after
    # month 1's files were rewritten (copy-on-write)
    assert not ({p for p in before - month2} & after)


def test_string_predicate_and_assignment_forms(spark, tmp_path):
    path = str(tmp_path / "t")
    S.append(_batch(spark, 1, range(4)), path)
    S.update_where(spark, path, "symbol = 'AAA'", {"price": "price + 1000"})
    got = {r.trade_id: r.price for r in S.read_snapshot(spark, path).collect()}
    assert got[0] == 1100.0 and got[2] == 1102.0
    assert got[1] == 101.0 and got[3] == 103.0


def test_deleted_rows_are_not_resurrected(spark, tmp_path):
    path = str(tmp_path / "t")
    S.append(_batch(spark, 1, range(4)), path)
    S.delete_where(spark, path, "trade_id = 1")
    S.update_where(spark, path, "symbol = 'BBB'", {"price": F.lit(9.0)})
    got = {r.trade_id: r.price for r in S.read_snapshot(spark, path).collect()}
    assert 1 not in got          # still deleted (deletes materialized)
    assert got[3] == 9.0         # the surviving BBB row updated
    # the rewrite materialized the touched file's delete: re-reading any
    # version at head stays consistent after a compact
    S.compact_snapshot(spark, path, keys=("ts", "symbol", "trade_id"),
                       version_col="price")
    assert 1 not in {
        r.trade_id for r in S.read_snapshot(spark, path).collect()
    }


def test_no_match_is_a_noop_and_time_travel_holds(spark, tmp_path):
    path = str(tmp_path / "t")
    S.append(_batch(spark, 1, range(3)), path)
    head = S.latest_version(path)
    assert S.update_where(
        spark, path, "trade_id = 999", {"price": F.lit(0.0)}
    ) == head  # zero matches: no commit
    v = S.update_where(spark, path, "trade_id = 0", {"price": F.lit(7.0)})
    assert v == head + 1
    old = {r.trade_id: r.price
           for r in S.read_snapshot(spark, path, version=head).collect()}
    assert old[0] == 100.0  # pre-update version unchanged


def test_generated_columns_recompute_and_refuse_assignment(spark, tmp_path):
    path = str(tmp_path / "t")
    S.append(
        _batch(spark, 1, range(3)).withColumn(
            "minute", F.date_trunc("minute", F.col("ts"))
        ),
        path,
    )
    S.set_generated_column(spark, path, "minute", "date_trunc('minute', ts)")
    # new writes compute the generated column when omitted
    S.append(_batch(spark, 2, [10]), path)
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS"):
        S.update_where(spark, path, "trade_id = 10",
                       {"minute": F.lit("2030-01-01").cast("timestamp")})
    # updating the SOURCE recomputes the generated value
    S.update_where(
        spark, path, "trade_id = 10",
        {"ts": F.lit("2024-03-05 10:30:45").cast("timestamp")},
    )
    row = (S.read_snapshot(spark, path)
           .where(F.col("trade_id") == 10).collect()[0])
    assert row.minute == datetime(2024, 3, 5, 10, 30)


def test_constraints_recheck_on_update(spark, tmp_path):
    path = str(tmp_path / "t")
    S.append(_batch(spark, 1, range(3)), path)
    S.add_constraint(spark, path, "price_pos", "price > 0")
    with pytest.raises(ValueError, match="price_pos"):
        S.update_where(spark, path, "trade_id = 0", {"price": F.lit(-5.0)})
    # the failed update committed nothing
    assert {r.price for r in S.read_snapshot(spark, path)
            .where("trade_id = 0").collect()} == {100.0}


def test_update_moves_rows_across_month_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    S.append(_batch(spark, 1, range(3)), path)
    S.update_where(
        spark, path, "trade_id = 1",
        {"ts": F.lit("2024-06-15 00:00:00").cast("timestamp")},
    )
    row = (S.read_snapshot(spark, path, keep_txn=False)
           .where("trade_id = 1").collect()[0])
    assert row.ts.month == 6
    # the month scope read finds it in its NEW month
    months = {
        f["p_month"] for f in S.manifest(path, S.latest_version(path))["files"]
    }
    assert "202406" in months


def test_cdc_feed_represents_the_update(spark, tmp_path):
    path = str(tmp_path / "t")
    S.append(_batch(spark, 1, range(3)), path)  # v0
    S.update_where(spark, path, "trade_id = 1", {"price": F.lit(555.0)})  # v1
    feed = S.read_changes_cdc(spark, path, -1)  # include v0's inserts
    rows = {(r._change_type, r.trade_id, r.price) for r in feed.collect()}
    assert ("delete", 1, 101.0) in rows   # the pre-image retracts
    assert ("insert", 1, 555.0) in rows   # the post-image inserts
    # signed fold consistency: net state equals the snapshot
    from collections import Counter

    state: Counter = Counter()
    for r in feed.collect():
        state[(r.trade_id, r.price)] += (
            1 if r._change_type == "insert" else -1
        )
    snap = Counter(
        (r.trade_id, r.price) for r in S.read_snapshot(spark, path).collect()
    )
    assert +state == snap


def test_update_through_a_rename_era(spark, tmp_path):
    """Mixed-era table: the predicate and assignment use LOGICAL names;
    era-0 files translate through the column map."""
    path = str(tmp_path / "t")
    S.append(
        _batch(spark, 1, range(3)).withColumnRenamed("price", "px0"), path
    )
    S.rename_column(path, "px0", "price")
    S.append(_batch(spark, 2, [7]), path)
    S.update_where(spark, path, "trade_id = 0", {"price": F.lit(1.0)})
    got = {r.trade_id: r.price for r in S.read_snapshot(spark, path).collect()}
    assert got[0] == 1.0 and got[7] == 107.0


def test_unknown_assignment_column_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    S.append(_batch(spark, 1, range(2)), path)
    with pytest.raises(ValueError, match="nope"):
        S.update_where(spark, path, "trade_id = 0", {"nope": F.lit(1)})


def test_conflict_detected_and_retry_rereads(spark, tmp_path, monkeypatch):
    """A commit interleaved between the update's read and its commit
    raises CommitConflict (the rewrite depends on the exact snapshot
    read); update_where_retry re-runs against the winner's head and
    both writers' effects land. The interleave is forced
    deterministically by sneaking an append in after the rewrite's
    txn-dir write, before the CAS."""
    path = str(tmp_path / "t")
    S.append(_batch(spark, 1, range(3)), path)

    real_write = S._write_txn
    state = {"sneaked": False}

    def sneaky(df, p, ts_col, **kw):
        out = real_write(df, p, ts_col, **kw)
        if not state["sneaked"]:
            state["sneaked"] = True
            S.append(_batch(spark, 2, [99]), path)  # interleaver wins
        return out

    monkeypatch.setattr(S, "_write_txn", sneaky)
    with pytest.raises(S.CommitConflict):
        S.update_where(spark, path, "trade_id = 0", {"price": F.lit(7.0)})
    state["sneaked"] = False  # the retry's FIRST attempt conflicts too
    v = S.update_where_retry(
        spark, path, "trade_id = 0", {"price": F.lit(7.0)}
    )
    got = {r.trade_id: r.price for r in S.read_snapshot(spark, path).collect()}
    assert got[0] == 7.0       # the update landed on the retry attempt
    assert 99 in got           # the interleaved appends survived
    assert v == S.latest_version(path)
