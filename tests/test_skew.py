"""Skew handling: AQE's runtime skew-join split on a synthesized hot-key
fact table, and the static salted-join fallback's exact parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans.skew import SALT_COL, salted_join


def _skewed(spark, n=200_000, hot_frac=0.9):
    """Fact table where one key owns ``hot_frac`` of all rows."""
    return spark.range(n).select(
        F.when(F.col("id") < int(n * hot_frac), F.lit(1))
        .otherwise((F.col("id") % 50) + 2)
        .alias("k"),
        F.col("id").alias("payload"),
    )


def _dim(spark):
    return spark.range(1, 60).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )


def test_aqe_splits_skewed_sort_merge_join(spark):
    """With broadcast disabled (forcing a shuffle join), AQE must mark the
    hot partition's join as skew-handled at runtime — the engine-level
    answer to skew the session enables globally."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_thresh = spark.conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    )
    prev_factor = spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    prev_adv = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # the synthetic table is small; lower the skew bar AND the split
        # target so the hot partition both qualifies and actually splits
        # at test scale
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        j = _skewed(spark).join(_dim(spark), "k")
        # AQE finalizes per execution: run THIS DataFrame's own plan (a
        # .count() would execute a different QueryExecution), then read
        # its adaptively-optimized final plan
        assert len(j.collect()) == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", prev_thresh
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", prev_factor)
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev_adv)


def test_salted_join_matches_plain_join(spark):
    """Static salting parity: same rows as the unsalted join (inner and
    left, including unmatched left rows), salt column not leaked, and the
    hot key's rows spread across many salt buckets."""
    big, dim = _skewed(spark, n=20_000), _dim(spark)
    for how in ("inner", "left"):
        got = salted_join(big, dim, "k", buckets=8, how=how)
        assert SALT_COL not in got.columns
        want = big.join(dim, "k", how)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect())), how
    # the hot key really spreads: its rows occupy >1 salt bucket
    bs = big.withColumn(SALT_COL, F.pmod(F.xxhash64(*big.columns), F.lit(8)))
    n_buckets = bs.where(F.col("k") == 1).select(SALT_COL).distinct().count()
    assert n_buckets == 8


def test_salted_join_key_includes_salt(spark):
    """The physical join keys must include the salt — that IS the
    mitigation (hot key hashes to `buckets` shuffle keys, not one)."""
    big, dim = _skewed(spark, n=20_000), _dim(spark)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = salted_join(big, dim, "k", buckets=8)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert SALT_COL in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_runtime_bloom_filter_reduces_fact_scan(spark):
    """Catalyst injects a bloom-filter semi-join reduction: the selective
    orders side builds a bloom_filter_agg and the lineitem scan applies
    might_contain BEFORE the join shuffle. Results are identical with the
    filter off (it only removes definite non-matches)."""
    from pyspark.sql import functions as F

    from crypto_clickhouse_poc_spark.plans.skew import runtime_bloom_demo
    from tests.conftest import SF_CORRECT

    o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    l = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")

    def q():
        sel = o.where(F.col("o_orderpriority") == "1-URGENT")
        return (
            l.join(sel, l.l_orderkey == sel.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        )

    baseline = sorted(tuple(r) for r in q().collect())
    with runtime_bloom_demo(spark):
        df = q()
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt, "no runtime bloom filter injected"
        assert "might_contain" in opt
        assert sorted(tuple(r) for r in df.collect()) == baseline
    # confs restored: the shared session must keep its broadcast behavior
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"
