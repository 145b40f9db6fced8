"""Count-Min sketch gates (operators/cms): value parity vs DuckDB is
covered by tests/test_oracle_parity.py; these pin the sketch's defining
properties — one-sided error (estimate >= truth, ALWAYS, for every
token), exact element-wise mergeability of shard partials, collision
behavior under a deliberately tiny grid, and the broadcast probe plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.operators import cms
from crypto_clickhouse_poc_spark.tables import load
from tests.conftest import SF_CORRECT


def _toks(spark):
    return cms._tokens(spark, SF_CORRECT)


def test_estimate_never_undercounts_any_token(spark):
    toks = _toks(spark)
    truth = toks.groupBy("token").agg(F.count("*").alias("freq"))
    est = cms.cms_point_estimates(cms._cms_cells(toks), truth)
    bad = est.where(F.col("cms_est") < F.col("freq"))
    assert bad.count() == 0
    assert est.count() == truth.count()  # every token got an estimate


def test_shard_partials_merge_exactly(spark):
    """CMS cells of disjoint shards SUM to the one-shot sketch — the
    property that makes per-flush/per-shard partials a valid MV."""
    toks = _toks(spark).withColumn(
        "shard", (F.crc32(F.col("token")) % 2).cast("int")
    )
    one_shot = {
        (r.d, r.bucket): r.cnt for r in cms._cms_cells(toks).collect()
    }
    merged: dict = {}
    for s in (0, 1):
        part = cms._cms_cells(toks.where(F.col("shard") == s))
        for r in part.collect():
            merged[(r.d, r.bucket)] = merged.get((r.d, r.bucket), 0) + r.cnt
    assert merged == one_shot


def test_tiny_grid_forces_collisions_but_stays_one_sided(spark, monkeypatch):
    monkeypatch.setattr(cms, "CMS_W", 8)
    toks = _toks(spark)
    truth = toks.groupBy("token").agg(F.count("*").alias("freq"))
    est = cms.cms_point_estimates(cms._cms_cells(toks), truth)
    rows = est.collect()
    assert all(r.cms_est >= r.freq for r in rows)
    assert any(r.cms_est > r.freq for r in rows)  # 8 buckets MUST collide


def test_probe_join_is_broadcast(spark):
    plan = str(
        cms.corpus_cms_freq(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
