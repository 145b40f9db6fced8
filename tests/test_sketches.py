"""HLL sketch family (operators/sketches.py): error bound, exact
mergeability, grouping independence, and the partial-aggregation plan
shape. No DuckDB oracle exists for DataSketches HLL (different HLL
implementations disagree bit-for-bit), so these properties are the gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.operators import sketches
from crypto_clickhouse_poc_spark.tables import load
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def direct(spark):
    return {r["event_type"]: r for r in sketches.ev_user_hll(spark, SF_CORRECT).collect()}


def test_estimate_within_error_bound(direct):
    assert direct, "no groups"
    for t, r in direct.items():
        assert r["rel_err"] <= 0.05, (t, r["n_approx"], r["n_exact"])


def test_merged_partials_equal_one_shot(spark, direct):
    merged = {
        r["event_type"]: r["n_approx"]
        for r in sketches.ev_user_hll_merged(spark, SF_CORRECT).collect()
    }
    assert sorted(merged) == sorted(direct)
    for t in direct:
        assert merged[t] == direct[t]["n_approx"], t


def test_merge_is_grouping_independent(spark, direct):
    """Partials cut by a hash bucket of user_id (instead of day) union to
    the same estimate: the sketch MV is insensitive to how history was
    sliced into flushes."""
    e = load(spark, SF_CORRECT, "events")
    parts = e.groupBy(
        "event_type", (F.abs(F.xxhash64("user_id")) % 7).alias("b")
    ).agg(F.hll_sketch_agg(F.col("user_id"), F.lit(sketches.LG_CONFIG_K)).alias("sk"))
    merged = {
        r["event_type"]: r["n"]
        for r in parts.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"), F.lit(True))).alias("n"))
        .collect()
    }
    for t in direct:
        assert merged[t] == direct[t]["n_approx"], t


def test_sketch_agg_partials_before_exchange(spark):
    """Map-side partial sketching: the plan must show a partial
    hll_sketch_agg BELOW the Exchange — shuffle volume is then
    groups x sketch bytes, not rows."""
    plan = str(
        sketches.ev_user_hll(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
    )
    assert "hll_sketch_agg" in plan
    pre_exchange = plan.split("Exchange", 1)[1]
    assert "partial" in pre_exchange.lower()


def test_high_cardinality_error_still_bounded(spark):
    """Push past sparse mode (50k distinct > 2^12 registers) so the dense
    HLL estimator actually engages, and check the error bound holds."""
    df = spark.range(50_000).select((F.col("id") * 2654435761).alias("u"))
    est = df.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("u"), F.lit(sketches.LG_CONFIG_K))
        ).alias("n")
    ).collect()[0]["n"]
    assert abs(est - 50_000) / 50_000 <= 0.05, est
