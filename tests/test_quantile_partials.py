"""Mergeable quantile partials (streaming/quantiles.py).

The sketch's contract: (1) merging flush partials is EXACT — any batch
interleaving produces the same histogram, hence the same estimates;
(2) the estimate is within one bucket width of the true quantile;
(3) the registered replay query equals its one-shot oracle (covered again
by the global parity gate; asserted here structurally via re-chunking).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.operators.trades import _events
from crypto_clickhouse_poc_spark.streaming import quantiles as Q
from tests.conftest import SF_CORRECT


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _replay(spark, splits: int):
    e = _events(spark, SF_CORRECT)
    parts = None
    for i in range(splits):
        p = Q.hist_partials(
            e.where(F.col("event_id") % splits == i), value_col="price", key="event_type"
        )
        parts = p if parts is None else parts.unionAll(p)
    return Q.merge_quantiles(parts)


def test_flush_boundary_independence(spark):
    """3-way, 5-way, and one-shot (1-way) replays agree exactly — the
    merge is associative/commutative, so flush layout can't leak into
    results (the property that makes the MV maintainable)."""
    one = _rows(_replay(spark, 1))
    assert _rows(_replay(spark, 3)) == one
    assert _rows(_replay(spark, 5)) == one


def test_merged_histogram_equals_one_shot(spark):
    e = _events(spark, SF_CORRECT)
    parts = None
    for i in range(4):
        p = Q.hist_partials(e.where(F.col("event_id") % 4 == i), key="event_type")
        parts = p if parts is None else parts.unionAll(p)
    merged = parts.groupBy("key", "bucket").agg(F.sum("cnt").alias("cnt"))
    oneshot = Q.hist_partials(e, key="event_type")
    assert _rows(merged) == _rows(oneshot)


def test_estimate_within_one_bucket_of_exact(spark):
    est = {r["key"]: r for r in _replay(spark, 3).collect()}
    exact = {
        r["event_type"]: r
        for r in _events(spark, SF_CORRECT)
        .groupBy("event_type")
        .agg(
            F.percentile("price", F.lit(0.5)).alias("p50"),
            F.percentile("price", F.lit(0.9)).alias("p90"),
            F.percentile("price", F.lit(0.99)).alias("p99"),
        )
        .collect()
    }
    assert est.keys() == exact.keys()
    for k, r in est.items():
        for q in ("p50", "p90", "p99"):
            # upper-edge estimate: true quantile lies in (est - WIDTH, est]
            # up to interpolation (percentile interpolates between samples,
            # the sketch targets the lower-rank sample) — allow one width
            assert abs(r[f"{q}_est"] - exact[k][q]) <= 2 * Q.WIDTH, (k, q)


def test_partial_size_is_bounded_by_buckets_not_rows(spark):
    e = _events(spark, SF_CORRECT)
    p = Q.hist_partials(e, key="event_type")
    n_types = e.select("event_type").distinct().count()
    # fixture prices span [0, ~500) → ≤ 100 occupied buckets per type
    assert p.count() <= n_types * 101


def test_streaming_hist_partials_pipeline(spark, tmp_path):
    """End-to-end under Structured Streaming: replay → normalize →
    start_hist_partials sink → merge view equals the one-shot batch
    quantiles (same foreachBatch MV shape as the bars pipeline)."""
    from crypto_clickhouse_poc_spark.sources.replay import (
        read_replay_stream,
        trades_to_event_lines,
        write_replay_chunks,
    )
    from crypto_clickhouse_poc_spark.streaming import ingest
    from tests.test_streaming import _fixture_rows

    rows = _fixture_rows()
    replay_dir = str(tmp_path / "replay")
    hist_dir, ckpt = str(tmp_path / "hist"), str(tmp_path / "ckpt_hist")
    write_replay_chunks(trades_to_event_lines(rows), replay_dir, num_chunks=5)

    stream = ingest.normalize(read_replay_stream(spark, replay_dir))
    q = Q.start_hist_partials(stream, hist_dir, ckpt, trigger_sec=0)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    merged = Q.merge_quantiles(spark.read.parquet(hist_dir))
    batch = spark.createDataFrame(
        [(r["symbol"], r["price"]) for r in rows], "symbol string, price double"
    )
    oneshot = Q.merge_quantiles(Q.hist_partials(batch))
    assert _rows(merged) == _rows(oneshot)
    assert merged.count() == 2  # both symbols present


@pytest.mark.parametrize("vals,q,expect", [
    ([1.0], 0.5, 5.0),          # single value in bucket 0 → upper edge 5
    ([4.9, 5.0, 5.1], 0.5, 10.0),  # 5.0 lands in bucket 1 → rank-2 → edge 10
])
def test_tiny_cases_by_hand(spark, vals, q, expect):
    df = spark.createDataFrame([(v,) for v in vals], "price double").withColumn(
        "symbol", F.lit("s")
    )
    out = Q.merge_quantiles(Q.hist_partials(df), qs=(q,)).collect()[0]
    assert out[f"p{int(q * 100)}_est"] == expect
