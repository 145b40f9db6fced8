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

QS = operators.library_queries()


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
    for name in ("doc_stats", "doc_fingerprints", "doc_split", "doc_chunks"):
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


@pytest.mark.parametrize("name", ["ann_topk_brute", "ann_ivf_search"])
def test_ann_broadcasts_small_side(spark, name):
    plan = _plan(spark, name)
    assert "Broadcast" in plan


def test_ivf_assign_stage_is_shuffle_free(spark):
    """The IVF coarse-quantization stage must be a pure per-row projection
    (fold argmax over inlined centroid literals): no Join, no Exchange, no
    vectors×k row explosion. At 100 TB the crossJoin+window alternative
    multiplies the scan by k and shuffles it — the shape this test bans."""
    from pyspark.sql import functions as F

    from crypto_clickhouse_poc_spark.operators import similarity as S

    e = S._vectors(spark, SF_CORRECT)
    assigned = e.select(
        "vec_id", S._ranking(spark, SF_CORRECT)[0]["cid"].alias("cluster")
    )
    plan = str(assigned._jdf.queryExecution().executedPlan())
    # r17: the ONLY exchange allowed is _vectors' guarded scan_parallel
    # round-robin repartition (guide §2.5 — no-op on a production
    # multi-file scan); the assign itself adds no hash/range shuffle
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert plan.count("Exchange") <= 1
    assert "Join" not in plan
    assert "Generate" not in plan  # no explode-based fan-out either
    # and the full contingency query keeps exactly one Exchange (the groupBy)
    full = _plan(spark, "ann_ivf_assign")
    assert full.count("Exchange") <= 3  # round-robin + partial→final agg
    assert "Join" not in full


def test_pq_probe_reads_pruned_partitions(spark):
    """The persisted IVF-PQ index is partitioned by cluster id; a probe's
    scan must carry PartitionFilters on p_cluster (directory-level pruning
    — at 100 TB the probe reads ~nprobe/k of the index, not all of it),
    and the probed read must return the same rows as the in-memory twin."""
    from crypto_clickhouse_poc_spark.operators import similarity as S

    out = S.ann_ivf_pq_probe_pruned(spark, SF_CORRECT)
    plan = str(out._jdf.queryExecution().executedPlan())
    assert "PartitionFilters" in plan
    assert "p_cluster" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, S.ann_ivf_pq_search(spark, SF_CORRECT).collect()))
    assert got == want


def test_dataset_assembly_plan_shapes(spark):
    """Assembly-family scale shapes: sampling is selection-by-projection
    (no Join anywhere; only the accounting aggregate shuffles), and
    packing is one shard-keyed window + the accounting aggregate — no
    Join, no extra Exchange beyond window/agg/sort."""
    for name in ("corpus_sample_stratified", "corpus_shard"):
        plan = _plan(spark, name)
        assert "Join" not in plan, name
    pack = _plan(spark, "corpus_pack")
    assert "Join" not in pack
    assert "Window" in pack
    assert pack.count("Exchange") <= 3  # window + partial/final agg + sort


def test_phash_band_joins_are_hash_joins_not_bnl(spark):
    """The image near-dup candidates must come from band equi-joins —
    never a nested-loop pair scan (the O(pairs) shape this family bans)."""
    plan = _plan(spark, "mm_phash_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_q17_threshold_join_broadcasts(spark):
    plan = _plan(spark, "tpch_q17")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(p_brand,Brand#11)" in plan  # dim filter pushed


def test_gapfill_spine_is_single_row_explode(spark):
    plan = _plan(spark, "ev_ohlcv_gapfill")
    assert "Generate explode" in plan or "Explode" in plan or "generate" in plan.lower()


def test_layout_query_prunes_partitions(spark):
    """ev_layout_pruned reads the month-partitioned table through the
    month_pruned helper: the scan must carry a PartitionFilters predicate on
    p_month (directory-level pruning — X1) AND a pushed ts filter (row-group
    skipping — X2). At 100 TB this is the scan-1-month-not-10-years shape."""
    plan = _plan(spark, "ev_layout_pruned")
    assert "PartitionFilters" in plan
    part = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "p_month" in part
    assert "PushedFilters" in plan and "ts" in plan.split("PushedFilters", 1)[1]


def test_month_pruning_actually_skips_months(spark, tmp_path):
    """Two-month synthetic table: a pruned read must touch only the matching
    month's files (asserted via the scan's 'partition count' metadata)."""
    from pyspark.sql import functions as F

    from crypto_clickhouse_poc_spark.plans import layout

    df = spark.range(200).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,CAST(id AS INT),0,0,0)"
        ).alias("ts"),
        F.lit("x").alias("event_type"),
    )
    dest = str(tmp_path / "two_months")
    layout.write_table(
        df, dest, sort_cols=("ts", "event_type", "event_id"), mode="overwrite"
    )
    pruned = layout.month_pruned(
        layout.read_table(spark, dest), "2024-02-01 00:00:00"
    )
    rows = pruned.collect()
    # days 31..199 (ts >= Feb 1) survive; every surviving row is February+
    assert len(rows) == 169 and all(r.ts.month >= 2 for r in rows)
    plan = str(pruned._jdf.queryExecution().executedPlan())
    assert "PartitionFilters" in plan and "p_month" in plan


def test_bar_windows_sort_bars_not_events(spark):
    """ev_minute_momentum / ev_ohlcv_gapfill use a global Window.orderBy —
    safe ONLY because the window input is minute bars (bounded by time
    range: ~44k rows/month regardless of trade volume), never raw events.
    Lock the shape: the Window must sit above the bar-building
    HashAggregate in the plan tree."""
    for name in ("ev_minute_momentum", "ev_ohlcv_gapfill"):
        plan = _plan(spark, name)
        # bar build is SortAggregate (max_by-on-struct) or HashAggregate
        agg = min(
            i
            for i in (plan.find("SortAggregate"), plan.find("HashAggregate"))
            if i >= 0
        )
        # plan strings print root-first: downstream Window appears before
        # the aggregate that feeds it
        assert 0 <= plan.index("Window") < agg, name


@pytest.mark.parametrize("name", ["tpch_q3", "tpch_q5", "tpch_q17", "asof_last_click_price", "ev_type_activity_salted", "corpus_decontaminate"])
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


def test_srp_lsh_band_joins_are_hash_joins_not_nlj(spark):
    """SRP-LSH (dedup + ANN): every band join must be an int-keyed hash
    join. An OR-of-bands join condition would silently plan a
    BroadcastNestedLoopJoin — all-pairs compute, the exact thing the
    banding exists to avoid."""
    for name in ("dedup_embedding_lsh", "ann_srp_search"):
        plan = _plan(spark, name)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert plan.count("HashJoin") >= 4, name  # one equi-join per band


def test_q8_single_fact_shuffle_all_dims_broadcast(spark):
    """TPC-H q8: part/customer/supplier/nation²/region all broadcast; the
    p_type filter reaches the part scan so lineitem is pruned early."""
    plan = _plan(spark, "tpch_q8")
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 7
    assert "EqualTo(p_type,ECONOMY)" in plan


def test_q13_left_join_keeps_filter_in_join_not_above(spark):
    """TPC-H q13: the orders filter must sit UNDER the left outer join
    (pushed to the scan), never above it — a post-join filter would drop
    the zero-order customers bucket."""
    plan = _plan(spark, "tpch_q13")
    assert "LeftOuter" in plan
    # the priority exclusion is pushed into the orders scan
    assert "o_orderpriority" in plan.split("PushedFilters", 1)[1]


def test_corpus_mix_no_full_stratum_rank(spark):
    """corpus_mix selection must never sort a whole stratum (the r5
    straggler shape: row_number over PARTITION BY lang with ~3 strata put
    each stratum's FULL row set through one task). Two-pass threshold
    selection: the full-keep branch is a pure per-row comparison — no
    Join, no Window — and the only rank runs over the boundary-bucket
    filter (≤ n/65 536 of the data)."""
    from pyspark.sql import functions as F

    from crypto_clickhouse_poc_spark.operators import sampling as S

    plan = str(S._mix_kept(spark, SF_CORRECT)._jdf.queryExecution().executedPlan())
    assert "Join" not in plan
    # at sf0.01 every doc has a distinct 16-bit bucket, so quotas land on
    # bucket edges and the partial branch prunes away entirely
    # (remaining == 0): the whole selection is shuffle-free
    assert "Exchange" not in plan and "Window" not in plan

    # forced-collision variant (tiny bucket space) exercises the partial
    # rank: still no Join, and the ONLY Exchange is the boundary-filtered
    # window input — never the raw stratum
    d = S._mix_docs(spark, SF_CORRECT).withColumn("bkt", F.col("bkt") % 4)
    plan2 = str(S._mix_kept_from(d)._jdf.queryExecution().executedPlan())
    assert "Join" not in plan2
    assert plan2.count("row_number") >= 1
    assert plan2.count("Exchange") <= 1
    # the rank's input (printed below the Window, root-first) carries the
    # boundary-bucket equality filter (Catalyst inlines the bkt expression,
    # so match the collapsed `<md5-bucket> % 4) = <literal>` form)
    after = plan2.split("row_number", 1)[1]
    assert "Filter" in after and "% 4) = " in after


def test_skip_scan_pushes_residual_filters(spark):
    """The skip-index read path must not trade away in-file skipping: the
    residual predicates still reach the survivors' parquet scan (row-group
    pruning inside surviving files), and the rollup shape is join-free."""
    plan = _plan(spark, "ev_skip_pruned")
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1]
    assert "value" in pushed
    assert "Join" not in plan

    plan = _plan(spark, "ev_skip_semijoin")
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1]
    assert "user_id" in pushed
    assert "Join" not in plan


def test_curation_plan_shapes(spark):
    """Curation-family scale shapes: repetition and PII are per-row maps
    (no Join; only agg/sort exchanges), and decontamination's holdout
    n-gram set broadcasts — the fact side is never a shuffle-join input."""
    for name, max_ex in (("doc_repetition", 1), ("corpus_pii_scan", 2)):
        plan = _plan(spark, name)
        assert "Join" not in plan, name
        assert plan.count("Exchange") <= max_ex, name
    plan = _plan(spark, "corpus_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dup_spans_shuffles_hashes_not_strings(spark):
    """doc_dup_spans: the only generated span representation crossing an
    Exchange is the 64-bit xxhash64 — the span STRING must be consumed
    map-side (concat_ws feeds xxhash64 inside the Generate, before the
    first Exchange) — and the per-span doc count joins back via an
    equi-join (AQE-skew-splittable), never a window over h (single-task
    sort on a hot span) and never a nested-loop pair scan."""
    plan = _plan(spark, "doc_dup_spans")
    assert "xxhash64" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Window" not in plan
    # int-row exchanges only: groupBy(h,doc) + groupBy(h) + join re-key +
    # final doc rollup (the grp branch re-derives the Generate, so count
    # keys, not positions)
    import re

    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert keys, "expected hash exchanges"
    for k in keys:
        cols = {c.strip().split("#")[0] for c in k.split(",") if "#" in c}
        assert cols <= {"h", "doc_id"}, k  # never the span string / text


def test_corpus_dup_spans_topk_not_global_sort(spark):
    plan = _plan(spark, "corpus_dup_spans")
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_bm25_is_two_scans_one_row_broadcast(spark):
    """corpus_bm25_topk: term frequencies are map-side array folds (no
    explode → no Generate), corpus stats collapse to a 1-row broadcast
    (BroadcastNestedLoopJoin over a single-row build side is the cheap
    crossJoin, not a pair blow-up), and the top-20 is a TakeOrdered."""
    plan = _plan(spark, "corpus_bm25_topk")
    assert "Generate" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan


def test_arrow_kernel_is_shuffle_free_mapinarrow(spark):
    plan = _plan(spark, "mm_byte_features_arrow")
    assert "Exchange" not in plan
    assert "MapInArrow" in plan and "MapInPandas" not in plan


def test_incremental_lsh_probe_is_hash_joins_not_bnl(spark):
    plan = _plan(spark, "dedup_incremental_lsh")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan  # band equi-joins present


def test_unpivot_is_map_only_expand(spark):
    """ev_hourly_unpivot: the wide->long step is a per-row Expand/Generate,
    never a join; total plan = one hash aggregate + map work + topk sort."""
    plan = _plan(spark, "ev_hourly_unpivot")
    assert "Join" not in plan
    assert "Expand" in plan or "Generate" in plan


def test_scd2_merge_is_joins_no_windows(spark):
    """cust_scd2_merge: change detection is ONE equi-join (broadcast at
    batch-sized updates), untouched rows leave via anti-join — no window
    over the dimension, no global sort besides the oracle-determinism
    orderBy."""
    plan = _plan(spark, "cust_scd2_merge")
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_kmv_topk_is_two_phase_salted(spark):
    """ev_user_kmv: the distinct-user top-k must run as the salted
    two-phase (a windowspec over (event_type, salt) BEFORE the final
    (event_type)-only windowspec) — a single full-type window would funnel
    each type's entire distinct-user set through one task's sort."""
    plan = _plan(spark, "ev_user_kmv")
    assert "salt" in plan
    import re

    specs = [m.group(1) for m in re.finditer(r"windowspecdefinition\(([^)]*?), frac", plan)]
    assert any("salt" in s for s in specs), specs


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Catalyst's runtime Bloom-filter join pruning (on by default,
    spark.sql.optimizer.runtime.bloomFilter.enabled): a selective dim
    filter is turned into a bloom_filter_agg on the build side and a
    might_contain pre-filter on the fact scan, cutting shuffle volume
    before the join. The fixture fact is below the 10 GB production
    applicationSideScanSizeThreshold, so the test lowers it — at 100 TB
    the rewrite fires out of the box (this is 'let Catalyst optimize'
    made checkable)."""
    from pyspark.sql import functions as F

    _SF = "/root/testdata/sf0.1"  # the larger fixture: the fact side must
    # clear the (lowered) application-side scan threshold

    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1MB",
        )
        li = spark.read.parquet(f"{_SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{_SF}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = str(j._jdf.queryExecution().executedPlan())
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_twopass_quantiles_no_value_buffering(spark):
    """ev_price_quantiles_twopass: no F.percentile aggregate anywhere
    (that's the buffer-every-group-value shape it replaces), and every
    window partitions on at least (event_type, b) or runs over the
    <=QUANTILE_BUCKETS histogram rows — never a full-type value sort."""
    plan = _plan(spark, "ev_price_quantiles_twopass")
    assert "percentile" not in plan.lower()
    import re

    specs = [m.group(1) for m in re.finditer(r"windowspecdefinition\(([^)]*?)\)", plan)]
    assert specs
    for s in specs:
        # each window is keyed by the NULL-safe group surrogate gk plus
        # either the bucket column (boundary ranking) or runs on the
        # histogram rows keyed by b — never a full-type value sort
        assert "gk" in s, s


def test_hash_embed_is_scan_fused_map(spark):
    """doc_hash_embed: the featurizer is a pure per-row fold+generate
    (r9: the presentation sort was dropped — its range-partition bounds
    sampling re-ran the md5 fold, 3.82 → 2.08 s at sf0.1; the driver
    canonicalizes row order itself). r17: the ONLY exchange allowed is
    scan_parallel's guarded ROUND-ROBIN repartition (guide §2.5 — the
    single-file fixture scan starves the 32-lane fold; the guard makes
    it a no-op on a production multi-file scan), never a hash/range
    exchange and never a join. The live cache from an earlier test is
    popped first (the dsir-lock precedent below): a materialized
    InMemoryRelation repeats its child plan in the dump, double-counting
    the one allowed exchange."""
    from crypto_clickhouse_poc_spark import caching

    prev = caching._LIVE.pop("text._hash_embed", None)
    if prev is not None:
        prev.unpersist()
    plan = _plan(spark, "doc_hash_embed")
    assert "Join" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert plan.count("Exchange") <= 1  # the guarded round-robin only


def test_dsir_weights_scan_the_corpus_once(spark):
    """corpus_dsir_weights: three branches (bucket stats, totals, per-doc
    weights) share the (doc,bucket) partials; uncached, Catalyst
    re-derives the subplan per branch and the corpus is scanned three
    times (observed before the bounded_cache). Lock on the DETERMINISTIC
    fresh-cache state (an already-populated cache prints relations in a
    format-dependent way — the r10 bounded_cache self-eviction find):
    every branch reads the shared InMemoryRelation (whose DEFINITION
    contains the scan, executed once), so scans == relations — no parquet
    scan exists OUTSIDE a cached relation. Score/totals join broadcast."""
    from crypto_clickhouse_poc_spark import caching

    prev = caching._LIVE.pop("dsir_per", None)
    if prev is not None:
        prev.unpersist()
    plan = _plan(spark, "corpus_dsir_weights")
    assert plan.count("Scan parquet") == plan.count("InMemoryRelation")
    assert plan.count("InMemoryTableScan") >= 3  # all three consumers
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan
