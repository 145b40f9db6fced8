"""Atomic key-replacement commits (snapshots.upsert_by_keys, r12).

Contracts gated here:

- one commit = append + equality-delete: readers see old-or-new state,
  never the gap; time travel to the parent still sees the old rows;
- sequencing: the delete applies to every PRIOR file but provably not to
  the rows appended by the same commit, and a later plain append of the
  same key is visible (the Iceberg sequence rule);
- keys may be a SUPERSET of the payload's keys (pure-erasure members);
- the CDC feed represents an upsert exactly (inserts = added rows,
  deletes = prior matching rows); read_changes refuses the range;
- idempotent-writer watermark semantics match append's;
- compaction materializes and clears the upsert's eq entry.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans import snapshots as S

SCHEMA = (
    "ts timestamp, symbol string, trade_id long, price double, qty double,"
    " ingested_at long"
)
T0 = datetime(2024, 3, 1, 9, 0, 0)


def _batch(spark, ids, price=None):
    rows = [
        (
            T0 + timedelta(minutes=i % 3, seconds=i % 60),
            "BTC" if i % 2 else "ETH",
            i,
            float(price if price is not None else 100 + (i * 7) % 31),
            1.0 + (i % 5),
            0,
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _prices(spark, path, version=None):
    return {
        r["trade_id"]: r["price"]
        for r in S.read_snapshot(spark, path, version=version)
        .select("trade_id", "price")
        .collect()
    }


def test_upsert_replaces_matches_and_inserts_rest(spark, tmp_path):
    path = str(tmp_path / "t")
    S.append(_batch(spark, range(10)), path)
    v0 = S.latest_version(path)
    v = S.upsert_by_keys(
        _batch(spark, [3, 4, 50], price=999.0), path, cols=["trade_id"]
    )
    assert S._version_body(path, v)["op"] == "upsert"
    got = _prices(spark, path)
    assert got[3] == 999.0 and got[4] == 999.0 and got[50] == 999.0
    assert len(got) == 11  # 10 originals - 2 replaced + 2 new + 1 insert
    assert got[5] != 999.0  # untouched keys keep their rows
    # time travel to the parent: the old rows are still there
    assert _prices(spark, path, version=v0)[3] != 999.0


def test_upsert_same_key_rows_in_payload_survive_their_own_delete(
    spark, tmp_path
):
    """The sequencing exemption: the payload's rows carry the very keys
    being deleted — added_v == the delete's v, so they must survive."""
    path = str(tmp_path / "t")
    S.append(_batch(spark, range(6)), path)
    S.upsert_by_keys(_batch(spark, [2], price=7.0), path, cols=["trade_id"])
    assert _prices(spark, path)[2] == 7.0
    # and a LATER plain append of the same key is visible too
    S.append(_batch(spark, [2], price=8.0), path)
    rows = sorted(
        r["price"]
        for r in S.read_snapshot(spark, path)
        .where(F.col("trade_id") == 2)
        .collect()
    )
    assert rows == [7.0, 8.0]


def test_upsert_explicit_keys_superset_erases_without_replacement(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    S.append(_batch(spark, range(8)), path)
    keys = spark.createDataFrame([(1,), (2,), (3,)], "trade_id long")
    S.upsert_by_keys(
        _batch(spark, [1], price=5.0), path, cols=["trade_id"], keys=keys
    )
    got = _prices(spark, path)
    assert got[1] == 5.0  # replaced
    assert 2 not in got and 3 not in got  # erased, no replacement
    assert len(got) == 6


def test_upsert_cdc_exact_and_read_changes_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    S.append(_batch(spark, range(8)), path)
    v0 = S.latest_version(path)
    S.upsert_by_keys(
        _batch(spark, [2, 3, 40], price=9.0), path, cols=["trade_id"]
    )
    cdc = S.read_changes_cdc(spark, path, v0)
    ins = {
        (r["trade_id"], r["price"])
        for r in cdc.where(F.col(S.CDC_TYPE) == "insert").collect()
    }
    dels = {
        r["trade_id"]
        for r in cdc.where(F.col(S.CDC_TYPE) == "delete").collect()
    }
    assert ins == {(2, 9.0), (3, 9.0), (40, 9.0)}
    assert dels == {2, 3}  # only rows that EXISTED before
    with pytest.raises(ValueError, match="non-append"):
        S.read_changes(spark, path, v0)


def test_upsert_watermark_is_idempotent_and_cas_guarded(spark, tmp_path):
    path = str(tmp_path / "t")
    S.append(_batch(spark, range(5)), path)
    head = S.latest_version(path)
    v = S.upsert_by_keys(
        _batch(spark, [1], price=2.0),
        path,
        cols=["trade_id"],
        txn_app="up",
        txn_id=7,
        txn_expect=None,
    )
    assert S.last_txn(path, "up") == 7
    # replay (id at/below watermark) is a detected no-op
    assert (
        S.upsert_by_keys(
            _batch(spark, [1], price=3.0),
            path,
            cols=["trade_id"],
            txn_app="up",
            txn_id=7,
        )
        == v
    )
    assert _prices(spark, path)[1] == 2.0
    # exact-CAS from a stale watermark read conflicts instead of landing
    with pytest.raises(S.CommitConflict):
        S.upsert_by_keys(
            _batch(spark, [1], price=4.0),
            path,
            cols=["trade_id"],
            txn_app="up",
            txn_id=9,
            txn_expect=None,  # reader thought no batch ever committed
        )
    assert head is not None


def test_upsert_validates_key_cols_before_committing(spark, tmp_path):
    path = str(tmp_path / "t")
    S.append(_batch(spark, range(4)), path)
    v = S.latest_version(path)
    with pytest.raises(ValueError, match="not in table schema"):
        S.upsert_by_keys(_batch(spark, [1]), path, cols=["no_such_col"])
    assert S.latest_version(path) == v  # nothing committed


def test_compaction_materializes_upsert_eq_entry(spark, tmp_path):
    path = str(tmp_path / "t")
    S.append(_batch(spark, range(10)), path)
    S.upsert_by_keys(_batch(spark, [4, 5], price=1.5), path, cols=["trade_id"])
    before = _prices(spark, path)
    v = S.compact_snapshot(spark, path)
    m = S.manifest(path, v)
    assert m["eq_dvs"] == [] and m["dvs"] == []
    assert _prices(spark, path) == before


def test_tuple_keys_equal_frame_keys_including_timestamp_key(spark, tmp_path):
    """r13: ``keys`` as driver-collected TUPLES (the scoped refreshers'
    shape — the key file is written driver-side, no Spark job) must leave
    the table in exactly the state the DataFrame form does, including a
    TIMESTAMP key column (collected values are OS-local naive; the write
    normalizes through UTC — the r8 timezone seam)."""
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    for p in (pa, pb):
        S.append(_batch(spark, range(10)), p)
    repl = _batch(spark, [3, 4], price=555.0)
    key_frame = _batch(spark, [3, 4, 7]).select("ts", "trade_id")
    key_tuples = [
        (r["ts"], r["trade_id"]) for r in key_frame.collect()
    ]
    va = S.upsert_by_keys(repl, pa, cols=["ts", "trade_id"], keys=key_frame)
    vb = S.upsert_by_keys(repl, pb, cols=["ts", "trade_id"], keys=key_tuples)
    rows_a = sorted(map(tuple, S.read_snapshot(spark, pa).collect()))
    rows_b = sorted(map(tuple, S.read_snapshot(spark, pb).collect()))
    assert rows_a == rows_b and va == vb == 1
    # the erased-without-replacement key (7) is gone; replacements live
    assert 7 not in _prices(spark, pb)
    assert _prices(spark, pb)[3] == 555.0
    # the entry is a real manifest eq_dv with the composite key recorded
    eq = S.manifest(pb, vb)["eq_dvs"]
    assert len(eq) == 1 and eq[0]["cols"] == ["ts", "trade_id"] and eq[0]["rows"] == 3
    # and CDC represents the tuple-keyed upsert exactly like the frame one
    cdc_a = sorted(map(tuple, S.read_changes_cdc(spark, pa, 0, 1).collect()))
    cdc_b = sorted(map(tuple, S.read_changes_cdc(spark, pb, 0, 1).collect()))
    assert cdc_a == cdc_b
