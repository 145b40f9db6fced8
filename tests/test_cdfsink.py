"""Retraction-aware CDF rollup sink gates (streaming/cdfsink, r14).

The invertible-aggregate half of the IVM story: a streaming sum/count
rollup fed by the change feed stays EXACT across overwrite backfills,
upserts and deletes — verified against the batch groupBy after every
change, plus the exactly-once replay gate and the full-retraction
(ghost-group) gate.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans import snapshots as S
from crypto_clickhouse_poc_spark.streaming import cdfsink as C

SCHEMA = "ts timestamp, symbol string, trade_id long, price double"


def _batch(spark, month: int, ids, price=None):
    rows = [
        (datetime(2024, month, 1 + (i % 27)), "AB"[i % 2] * 3, i,
         float(100 + i) if price is None else float(price))
        for i in ids
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _expect(spark, base):
    return sorted(
        (r.symbol, r.price, r._n)
        for r in S.read_snapshot(spark, base)
        .groupBy("symbol")
        .agg(F.sum("price").alias("price"), F.count("*").alias("_n"))
        .collect()
    )


def _got(spark, mv):
    return sorted(
        (r.symbol, r.price, r._n)
        for r in C.read_cdf_rollup(spark, mv, ["ts", "symbol"], ["price"])
        .groupBy("symbol")
        .agg(F.sum("price").alias("price"), F.sum("_n").alias("_n"))
        .collect()
    )


def test_rollup_exact_across_backfill_upsert_and_deletes(spark, tmp_path):
    base, mv = str(tmp_path / "base"), str(tmp_path / "mv")
    S.append(_batch(spark, 1, range(10)), base)
    q = C.start_cdf_sum_rollup(
        spark, base, mv, str(tmp_path / "ck"), ["ts", "symbol"], ["price"]
    )
    try:
        q.processAllAvailable()
        assert _got(spark, mv) == _expect(spark, base)
        # overwrite backfill: month 1 re-published with corrected prices
        S.overwrite_months(_batch(spark, 1, range(10), price=7.0), base)
        q.processAllAvailable()
        assert _got(spark, mv) == _expect(spark, base)
        # upsert two keys + eq-delete one + position-delete one
        S.upsert_by_keys(_batch(spark, 1, [3], price=999.0), base, cols=["trade_id"])
        S.delete_by_keys(spark, base, spark.createDataFrame([(4,)], "trade_id long"))
        S.delete_where(spark, base, F.col("trade_id") == 5)
        S.append(_batch(spark, 2, range(10, 13)), base)
        q.processAllAvailable()
        assert _got(spark, mv) == _expect(spark, base)
    finally:
        q.stop()


def test_full_retraction_leaves_no_ghost_group(spark, tmp_path):
    base, mv = str(tmp_path / "base"), str(tmp_path / "mv")
    S.append(_batch(spark, 1, [0, 2, 4]), base)  # all symbol AAA
    S.append(_batch(spark, 1, [1]), base)  # one BBB
    q = C.start_cdf_sum_rollup(
        spark, base, mv, str(tmp_path / "ck"), ["ts", "symbol"], ["price"]
    )
    try:
        q.processAllAvailable()
        S.delete_by_keys(
            spark, base, spark.createDataFrame([(1,)], "trade_id long")
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = _got(spark, mv)
    assert [s for s, _, _ in got] == ["AAA"]  # BBB fully retracted: gone
    assert got == _expect(spark, base)


def test_replayed_batch_is_a_metadata_noop(spark, tmp_path):
    """foreachBatch is at-least-once; the (app, batchId) watermark makes
    a replay commit nothing — re-running the SAME fold by hand leaves
    the rollup table's head untouched."""
    base, mv = str(tmp_path / "base"), str(tmp_path / "mv")
    S.append(_batch(spark, 1, range(6)), base)
    q = C.start_cdf_sum_rollup(
        spark, base, mv, str(tmp_path / "ck"), ["ts", "symbol"], ["price"]
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    head = S.latest_version(mv)
    last = S.last_txn(mv, C.CDF_APP)
    replay = (
        _batch(spark, 1, range(6))
        .groupBy("ts", "symbol")
        .agg(F.sum("price").alias("price"), F.count("*").alias("_n"))
    )
    assert (
        S.append(replay, mv, ts_col="ts", txn_app=C.CDF_APP, txn_id=last)
        == head
    )
    assert S.latest_version(mv) == head


def test_restart_resumes_from_the_checkpoint_exactly_once(spark, tmp_path):
    base, mv, ck = str(tmp_path / "base"), str(tmp_path / "mv"), str(tmp_path / "ck")
    S.append(_batch(spark, 1, range(6)), base)
    q = C.start_cdf_sum_rollup(spark, base, mv, ck, ["ts", "symbol"], ["price"])
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    S.overwrite_months(_batch(spark, 1, range(6), price=5.0), base)
    q2 = C.start_cdf_sum_rollup(spark, base, mv, ck, ["ts", "symbol"], ["price"])
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert _got(spark, mv) == _expect(spark, base)


def test_enriched_fold_exact_across_backfill_and_deletes(spark, tmp_path):
    """r15: the enriched signed fold — change rows join a broadcast
    STATIC dim before folding — equals the batch join+aggregate after a
    mid-stream overwrite and deletes (a delete joins the same dim row
    its insert did, so retractions land in the right group)."""
    base, mv, ck = (str(tmp_path / p) for p in ("base", "mv", "ck"))
    S.append(_batch(spark, 1, range(10)), base)
    dim = spark.createDataFrame(
        [("AAA", "HEAD"), ("BBB", "TAIL")], "symbol string, sector string"
    ).localCheckpoint()
    q = C.start_cdf_enriched_sum_rollup(
        spark, base, dim, mv, ck, "symbol", ["ts", "sector"], ["price"]
    )
    try:
        q.processAllAvailable()
        S.overwrite_months(_batch(spark, 1, range(10), price=7.0), base)
        S.delete_by_keys(spark, base, spark.createDataFrame([(4,)], "trade_id long"))
        S.append(_batch(spark, 2, range(10, 13)), base)
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r.ts, r.sector, r.price, r._n)
        for r in C.read_cdf_rollup(spark, mv, ["ts", "sector"], ["price"]).collect()
    )
    want = sorted(
        (r.ts, r.sector, r.price, r._n)
        for r in S.read_snapshot(spark, base)
        .join(dim, "symbol")
        .groupBy("ts", "sector")
        .agg(F.sum("price").alias("price"), F.count("*").alias("_n"))
        .collect()
    )
    assert got == want


def test_enriched_fold_drops_unmatched_keys_symmetrically(spark, tmp_path):
    """Inner-join semantics: feed rows without a dim match contribute
    nothing — on the insert AND the delete leg, so a later retraction
    of an unmatched row cannot go negative."""
    base, mv, ck = (str(tmp_path / p) for p in ("base", "mv", "ck"))
    S.append(_batch(spark, 1, range(4)), base)  # symbols AAA + BBB
    dim = spark.createDataFrame(
        [("AAA", "ONLY")], "symbol string, sector string"
    ).localCheckpoint()
    q = C.start_cdf_enriched_sum_rollup(
        spark, base, dim, mv, ck, "symbol", ["ts", "sector"], ["price"]
    )
    try:
        q.processAllAvailable()
        # delete a BBB row (unmatched): must be a no-op for the rollup
        S.delete_by_keys(spark, base, spark.createDataFrame([(1,)], "trade_id long"))
        q.processAllAvailable()
    finally:
        q.stop()
    rows = C.read_cdf_rollup(spark, mv, ["ts", "sector"], ["price"]).collect()
    assert {r.sector for r in rows} == {"ONLY"}
    assert all(r._n > 0 for r in rows)


def test_mutated_dim_kills_the_stream_instead_of_drifting(spark, tmp_path):
    """r16 (VERDICT r15 next #6): the static-dim contract is enforced —
    a dim backed by a LIVE source that changes mid-stream fails the
    next fold with a clear error, never silent drift. The dim here is a
    parquet file overwritten in place between micro-batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.errors.exceptions.captured import StreamingQueryException

    base, mv, ck = (str(tmp_path / p) for p in ("base", "mv", "ck"))
    S.append(_batch(spark, 1, range(4)), base)
    dim_file = str(tmp_path / "dim.parquet")
    pq.write_table(
        pa.table({"symbol": ["AAA", "BBB"], "sector": ["HEAD", "TAIL"]}),
        dim_file,
    )
    dim = spark.read.parquet(dim_file)  # deliberately NOT checkpointed
    q = C.start_cdf_enriched_sum_rollup(
        spark, base, dim, mv, ck, "symbol", ["ts", "sector"], ["price"]
    )
    try:
        q.processAllAvailable()  # bootstrap folds fine
        pq.write_table(  # the violation: AAA re-mapped mid-stream
            pa.table({"symbol": ["AAA", "BBB"], "sector": ["MOVED", "TAIL"]}),
            dim_file,
        )
        S.append(_batch(spark, 2, [10, 11]), base)
        with pytest.raises(StreamingQueryException) as ei:
            q.processAllAvailable()
        assert "static-dim contract violated" in str(q.exception() or ei.value)
    finally:
        q.stop()


def test_checkpointed_dim_passes_the_guard(spark, tmp_path):
    """The guard must not false-positive on the CONTRACTUAL usage: a
    localCheckpoint'd dim fingerprints identically on every batch."""
    base, mv, ck = (str(tmp_path / p) for p in ("base", "mv", "ck"))
    S.append(_batch(spark, 1, range(4)), base)
    dim = spark.createDataFrame(
        [("AAA", "HEAD"), ("BBB", "TAIL")], "symbol string, sector string"
    ).localCheckpoint()
    q = C.start_cdf_enriched_sum_rollup(
        spark, base, dim, mv, ck, "symbol", ["ts", "sector"], ["price"]
    )
    try:
        q.processAllAvailable()
        S.append(_batch(spark, 2, [10, 11]), base)
        q.processAllAvailable()  # second fold re-checks the fingerprint
    finally:
        q.stop()
    rows = C.read_cdf_rollup(spark, mv, ["ts", "sector"], ["price"]).collect()
    assert sum(r._n for r in rows) == 6


def test_merge_spec_mismatch_raises_a_named_error(spark, tmp_path):
    """r16 ADVICE: a CdfMVSpec whose group/measure split does not cover
    the rollup's columns fails with a diagnosable ValueError naming the
    absent/unclaimed columns — not an AnalysisException mid-tick."""
    base, mv, ck = (str(tmp_path / p) for p in ("base", "mv", "ck"))
    S.append(_batch(spark, 1, range(4)), base)
    q = C.start_cdf_sum_rollup(
        spark, base, mv, str(tmp_path / "ck"), ["ts", "symbol"], ["price"]
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    partials = S.read_snapshot(spark, mv)
    # subset spec: 'price' exists in the partials but goes unclaimed
    with pytest.raises(ValueError, match="unclaimed by the spec.*price"):
        C.merge_cdf_fn(["ts", "symbol"], [])(partials)
    # absent group col
    with pytest.raises(ValueError, match="absent from partials"):
        C.merge_cdf_fn(["ts", "sector"], ["price"])(partials)
    # the default (sum_cols=None) covers everything — no raise
    C.merge_cdf_fn(["ts", "symbol"])(partials)
