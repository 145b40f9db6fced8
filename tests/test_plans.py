"""Physical-plan regression tests: lock in the scale-critical plan shapes.

These assert properties of the *optimized physical plan*, not results — a
correct-but-reshuffled regression (lost pushdown, de-broadcasted dim, full
sort instead of top-K) would pass every value test while being 100× slower
at 100 TB. Plan strings come from queryExecution().executedPlan(); with AQE
the pre-execution string still names join strategies, pushed filters, and
scan schemas.
"""

from __future__ import annotations

import pytest

from crypto_clickhouse_poc_spark import operators
from tests.conftest import SF_CORRECT

QS = operators.all_queries()


def _plan(spark, name: str) -> str:
    return str(QS[name](spark, SF_CORRECT)._jdf.queryExecution().executedPlan())


def test_q6_filters_pushed_no_join_no_wide_exchange(spark):
    plan = _plan(spark, "tpch_q6")
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1]
    assert "Join" not in plan
    # only the partial→final agg exchange (single row), never a wide shuffle
    assert plan.count("Exchange") <= 1


def test_q3_broadcasts_dim_and_uses_topk(spark):
    plan = _plan(spark, "tpch_q3")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-K, not global sort
    # the BUILDING segment filter reaches the customer scan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_q19_predicate_legs_pushed_to_both_scans(spark):
    plan = _plan(spark, "tpch_q19")
    pushed = plan.split("PushedFilters")
    assert len(pushed) >= 3  # both scans carry pushed filters
    assert "p_brand" in plan and "l_quantity" in plan


def test_ev_latest_is_topk(spark):
    plan = _plan(spark, "ev_latest")
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(event_type,click)" in plan  # filter pushed to scan


def test_per_row_text_ops_are_shuffle_free(spark):
    for name in ("doc_stats", "doc_fingerprints", "doc_split"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, name


def test_multimodal_kernels_are_shuffle_free(spark):
    for name in ("mm_byte_features", "mm_resize"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, name
        assert "MapInPandas" in plan or "mapInPandas" in plan.lower(), name


def test_lsh_band_joins_are_hash_joins_not_bnl(spark):
    plan = _plan(spark, "dedup_minhash_lsh")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_asof_sweep_is_single_key_shuffle_no_join(spark):
    plan = _plan(spark, "asof_last_click_price")
    # union-tag sweep: window over user_id, no join operator at all
    assert "Join" not in plan
    assert "Window" in plan


@pytest.mark.parametrize("name", ["ann_topk_brute", "ann_ivf_assign"])
def test_ann_broadcasts_small_side(spark, name):
    plan = _plan(spark, name)
    assert "Broadcast" in plan


def test_q17_threshold_join_broadcasts(spark):
    plan = _plan(spark, "tpch_q17")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(p_brand,Brand#11)" in plan  # dim filter pushed


def test_gapfill_spine_is_single_row_explode(spark):
    plan = _plan(spark, "ev_ohlcv_gapfill")
    assert "Generate explode" in plan or "Explode" in plan or "generate" in plan.lower()


@pytest.mark.parametrize("name", ["tpch_q3", "tpch_q5", "tpch_q17", "asof_last_click_price"])
def test_results_survive_broadcast_disable(spark, name):
    """Forced-broadcast hints must degrade gracefully: with the broadcast
    threshold off, plans fall back to shuffled joins and values are
    unchanged — the property that makes the hints safe when a 'small' side
    outgrows memory at 100 TB."""
    def rows():
        df = QS[name](spark, SF_CORRECT)
        return sorted(tuple(str(x) for x in r) for r in df.collect())

    base = rows()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert rows() == base, name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
