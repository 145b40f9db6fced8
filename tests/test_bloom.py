"""Bloom membership-sketch gates (round-8): the two classical guarantees
plus the Spark-shape locks. Value parity with the DuckDB oracles is
covered by tests/test_oracle_parity.py like every library query; these
gates check the SEMANTICS the oracle diff can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.operators import bloom as B
from crypto_clickhouse_poc_spark.streaming import compaction
from crypto_clickhouse_poc_spark.tables import load
from tests.conftest import SF_CORRECT


def test_no_false_negatives(spark):
    """Probing the corpus against its own filter: EVERY doc must read
    maybe_dup — Bloom's hard guarantee."""
    d = load(spark, SF_CORRECT, "documents")
    filt = B.bloom_build(d)
    verdicts = B.bloom_probe(d, filt)
    assert verdicts.where(F.col("status") != "maybe_dup").count() == 0
    assert verdicts.count() == d.where(F.col("text").isNotNull()).count()


def test_filter_is_partitioning_independent(spark):
    """OR is associative/commutative: any repartitioning builds the SAME
    filter bit-for-bit (what makes the mergeable build + the oracle
    hash-check sound)."""
    d = load(spark, SF_CORRECT, "documents")
    base = sorted(map(tuple, B.bloom_build(d).collect()))
    for nparts in (1, 7):
        got = sorted(map(tuple, B.bloom_build(d.repartition(nparts)).collect()))
        assert got == base, nparts


def test_planted_duplicate_is_flagged(spark):
    """A probe batch containing one exact copy of a corpus doc: the copy
    must read maybe_dup, the genuinely new doc must read novel (at this
    sizing the fixture has zero false positives — the novelty oracle's
    250/250 'novel' pins that)."""
    d = load(spark, SF_CORRECT, "documents")
    filt = B.bloom_build(d)
    copied = d.orderBy("doc_id").limit(1).collect()[0]["text"]
    probe = spark.createDataFrame(
        [(900001, copied), (900002, "genuinely new never seen text xyzzy")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in B.bloom_probe(probe, filt).collect()}
    assert got == {900001: "maybe_dup", 900002: "novel"}


def test_null_text_contributes_and_probes_nothing(spark):
    probe = spark.createDataFrame(
        [(1, None)], "doc_id long, text string"
    )
    d = load(spark, SF_CORRECT, "documents")
    filt_with = sorted(
        map(
            tuple,
            B.bloom_build(
                d.unionByName(
                    spark.createDataFrame([(999, None, "x", "s", 0)], d.schema)
                )
            ).collect(),
        )
    )
    assert filt_with == sorted(map(tuple, B.bloom_build(d).collect()))
    assert B.bloom_probe(probe, B.bloom_build(d)).count() == 0


def test_build_plan_is_partial_aggregated(spark):
    """The build must ship <= BLOOM_WORDS rows per partition: a hash
    aggregate with a map-side partial under the single exchange — never a
    shuffle of the exploded positions."""
    d = load(spark, SF_CORRECT, "documents")
    plan = str(B.bloom_build(d)._jdf.queryExecution().executedPlan())
    assert plan.count("Exchange") == 1
    # partial_bit_or below the exchange, final above it
    pre, post = plan.split("Exchange", 1)
    assert "bit_or" in pre and "bit_or" in post


def test_bloom_compaction_family(spark, tmp_path):
    """Flush-partial Bloom seats compact through the shared machinery:
    OR-merged reads are invariant (and idempotent under replayed
    flushes)."""
    d = load(spark, SF_CORRECT, "documents")
    path = str(tmp_path / "bloom")
    for i in range(3):
        B.bloom_build(d.where(F.col("doc_id") % 3 == i)).write.mode(
            "append"
        ).parquet(path)
    # replay one flush (at-least-once delivery): OR makes it harmless
    B.bloom_build(d.where(F.col("doc_id") % 3 == 0)).write.mode("append").parquet(
        path
    )
    merged = compaction.merge_bloom_to_partial(spark.read.parquet(path))
    want_filter = sorted(map(tuple, B.bloom_build(d).collect()))
    assert sorted(map(tuple, merged.collect())) == want_filter
    compaction.compact_partials(spark, path, "bloom")
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert got == want_filter
    assert len(list((tmp_path / "bloom").glob("part-*"))) == 1
