#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Query selection: every operator family is represented, but only queries whose
cost model is scale-sane are included (the quadratic exact-pair baselines —
dedup_jaccard_topk, dedup_embedding — are correctness references, not
benchmarks; their scale paths dedup_minhash_lsh / ann_ivf_assign are what we
measure).
"""

from __future__ import annotations

import json
import os
import re
import time

BENCH_QUERIES = [
    # reference-parity trades surface
    "ev_count",
    "ev_latest",
    "ev_ohlcv_1m",
    "ev_top_types",
    "ev_buy_sell_live",
    "ev_buy_sell_hist",
    "ev_dedup_latest",
    "ev_sessionize",
    "ev_price_quantiles",
    "ev_ohlcv_gapfill",
    "ev_cohort_retention",
    "ev_ohlcv_multires",
    "ev_user_kmv",
    # joins
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    # temporal joins (union-tag as-of sweep, bucketed range join)
    "asof_last_click_price",
    "range_click_activity",
    # text / dedup / similarity (scale paths)
    "doc_stats",
    "doc_fingerprints",
    "corpus_prepare",
    "dedup_exact",
    "dedup_simhash",
    "dedup_minhash_summary",
    "dedup_embedding_lsh",
    "ann_topk_brute",
    "ann_ivf_assign",
    # multimodal (binary payload + Arrow-batched Pandas-UDF kernels)
    "mm_byte_features",
    "mm_frame_sample",
    # physical layout read path (partition pruning + read-time dedup)
    "ev_layout_pruned",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from crypto_clickhouse_poc_spark import operators
    from crypto_clickhouse_poc_spark.session import get_spark

    spark = get_spark("bench")
    qs = operators.library_queries()

    # JVM/codegen warmup on a trivial scan (not timed)
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # two runs per query, report the min: the first run pays one-off JIT /
    # codegen / file-listing costs that a steady-state deployment amortizes.
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            n = len(qs[name](spark, sf_dir).collect())
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", flush=True)

    ingest_rps = _ingest_throughput(spark)
    print(f"# streaming ingest: {ingest_rps:,.0f} rows/s", flush=True)
    bars_rps = _bars_throughput(spark)
    print(f"# streaming bars MV (watermarked finals): {bars_rps:,.0f} rows/s", flush=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "ingest_rows_per_sec": round(ingest_rps),
                "bars_rows_per_sec": round(bars_rps),
                "sf": sf,
            }
        ),
        flush=True,
    )
    spark.stop()


def _ingest_throughput(spark, n_rows: int = 200_000) -> float:
    """Streaming ingest rate: synthetic Binance source → normalize → dedup →
    parquet sink (the full reference dataflow), rows/sec wall-clock."""
    import shutil
    import tempfile

    from crypto_clickhouse_poc_spark.sources.binance import BinanceTradesDataSource
    from crypto_clickhouse_poc_spark.streaming import ingest

    spark.dataSource.register(BinanceTradesDataSource)
    raw = (
        spark.readStream.format("binance_trades")
        .option("rate", str(n_rows // 4))
        .option("limit", str(n_rows))
        .load()
    )
    root = tempfile.mkdtemp(prefix="bench_ingest_")
    t0 = time.perf_counter()
    q = ingest.start_ingest(raw, f"{root}/trades", f"{root}/ckpt", trigger_sec=0)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    elapsed = time.perf_counter() - t0
    shutil.rmtree(root, ignore_errors=True)
    return n_rows / elapsed


def _bars_throughput(spark, n_rows: int = 200_000) -> float:
    """Streaming MV rate: synthetic source → normalize → watermarked 1-minute
    OHLCV finals (streaming/bars.start_bars_final), input rows/sec wall-clock.
    Tracks the cost of the stateful windowed aggregation design round-over-round."""
    import shutil
    import tempfile

    from crypto_clickhouse_poc_spark.sources.binance import BinanceTradesDataSource
    from crypto_clickhouse_poc_spark.streaming import bars, ingest

    spark.dataSource.register(BinanceTradesDataSource)
    raw = (
        spark.readStream.format("binance_trades")
        .option("rate", str(n_rows // 4))
        .option("limit", str(n_rows))
        .load()
    )
    root = tempfile.mkdtemp(prefix="bench_bars_")
    t0 = time.perf_counter()
    q = bars.start_bars_final(
        ingest.normalize(raw), f"{root}/bars", f"{root}/ckpt"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    elapsed = time.perf_counter() - t0
    shutil.rmtree(root, ignore_errors=True)
    return n_rows / elapsed


if __name__ == "__main__":
    main()
