"""Scale probe: optimize_small_files is O(small-file debt), not O(table).

Builds two tables with the SAME small-file debt (24 micro-batch files of
1k rows — a streaming sink's steady state) sitting next to a compacted
base that differs 10x in size (200k vs 2M rows), then times

- ``optimize_small_files`` — the claim under test: wall-clock tracks the
  debt (flat across the 10x base), because big files are carried by
  manifest reference and never opened, and
- ``compact_snapshot`` — the contrast: a full-table rewrite whose cost
  scales with the base, which is why it is the wrong maintenance tick for
  small-file debt at 100 TB.

Run:  python tools/scale_probe_optimize.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans import snapshots as S

MICRO_BATCHES = 24
BATCH_ROWS = 1_000


def _rows(spark, n: int, base: int):
    return spark.range(base, base + n).select(
        F.timestamp_seconds(F.lit(1_700_000_000) + (F.col("id") % 86_400)).alias("ts"),
        F.lit("BTC").alias("symbol"),
        F.col("id").alias("trade_id"),
        (F.col("id") % 997).cast("double").alias("price"),
        F.lit(0).cast("long").alias("ingested_at"),
    )


def build(spark, base_rows: int) -> str:
    path = tempfile.mkdtemp() + "/t"
    S.append(_rows(spark, base_rows, 0), path)
    for k in range(MICRO_BATCHES):
        S.append(_rows(spark, BATCH_ROWS, 10_000_000 + k * BATCH_ROWS), path)
    return path


def run(spark, base_rows: int) -> dict:
    p_opt = build(spark, base_rows)
    t0 = time.time()
    S.optimize_small_files(spark, p_opt, min_rows=50_000)
    t_opt = time.time() - t0
    n_files = len(S.manifest(p_opt, S.latest_version(p_opt))["files"])

    p_cmp = build(spark, base_rows)
    t0 = time.time()
    S.compact_snapshot(spark, p_cmp)
    t_cmp = time.time() - t0
    for p in (p_opt, p_cmp):
        shutil.rmtree(os.path.dirname(p), ignore_errors=True)
    return {
        "base_rows": base_rows,
        "optimize_s": round(t_opt, 2),
        "compact_s": round(t_cmp, 2),
        "files_after_optimize": n_files,
    }


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("scale-probe-optimize")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    small = run(spark, 200_000)
    big = run(spark, 2_000_000)
    out = {
        "probe": "optimize_vs_compact",
        "debt_files": MICRO_BATCHES,
        "debt_rows": MICRO_BATCHES * BATCH_ROWS,
        "runs": [small, big],
        "optimize_ratio_10x_base": round(big["optimize_s"] / small["optimize_s"], 2),
        "compact_ratio_10x_base": round(big["compact_s"] / small["compact_s"], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
