"""Approximate distinct-count sketches over ``events`` — Apache
DataSketches HLL via Spark's BUILT-IN ``hll_sketch_agg`` family.

The repo already carries an exactly-reproducible KMV sketch
(``trades.ev_user_kmv`` — oracle-hashable, O(k) state) and its streaming
partials replay. This module adds the production-grade complement: Spark
4's JVM-side HyperLogLog (Apache DataSketches HllSketch), which is what a
real 100 TB deployment would actually use — constant ~2^lgK bytes per
group, map-side partial sketching inside ObjectHashAggregate, and binary
sketches that union losslessly across partitions, flushes, or days.

Why no DuckDB oracle: DuckDB's ``approx_count_distinct`` is a different
HLL implementation (different hashing/register layout), so estimates don't
match bit-for-bit across engines. The family is therefore pytest-gated on
properties that pin the semantics harder than a cross-engine diff would:

- bounded relative error vs the exact distinct count (lgConfigK=12 →
  ~1.6% standard error; gate at 5%),
- EXACT equality between the one-shot sketch estimate and the estimate of
  union-merged partials (mergeability is the whole point of a sketch MV),
- partition/flush-order independence of the merged estimate,
- plan shape: partial sketch aggregation before the Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

LG_CONFIG_K = 12  # 4 KB registers per group; ~1.6% standard error


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events")


def ev_user_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type approximate distinct users (HLL estimate) next to the
    exact count so the error is visible — the HLL twin of ``ev_user_kmv``.

    Dataflow: ONE aggregation pass; the sketch partial-aggregates map-side
    (no pre-distinct shuffle needed, unlike KMV's distinct-then-top-k), so
    total shuffle volume is groups × 2^lgK bytes regardless of row count.
    The exact count rides along only for the error column.
    """
    e = _events(spark, sf_dir)
    return (
        e.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(LG_CONFIG_K))
            ).alias("n_approx"),
            F.countDistinct("user_id").alias("n_exact"),
        )
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("n_approx") - F.col("n_exact"))
                / F.col("n_exact").cast("double"),
                6,
            ),
        )
    )


def hll_day_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary HLL partials per (event_type, day) — the MV increment a
    streaming flush would persist. Sketches are opaque binary; estimates
    are taken only after union."""
    e = _events(spark, sf_dir)
    return e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.hll_sketch_agg(F.col("user_id"), F.lit(LG_CONFIG_K)).alias("sketch"))


def ev_user_hll_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type from UNION-MERGED per-day partials —
    must equal ``ev_user_hll``'s one-shot estimate exactly (test-gated).
    This is the incremental-MV read path: merge k day-sketches (k tiny)
    instead of rescanning all events."""
    parts = hll_day_partials(spark, sf_dir)
    return (
        parts.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg(F.col("sketch"), F.lit(True))
            ).alias("n_approx")
        )
        .orderBy("event_type")
    )


QUERIES = {
    "ev_user_hll": ev_user_hll,
    "ev_user_hll_merged": ev_user_hll_merged,
}

# No ORACLES: cross-engine HLL estimates don't agree bit-for-bit (different
# sketch implementations). Gated by tests/test_sketches.py instead.
ORACLES: dict[str, str] = {}
