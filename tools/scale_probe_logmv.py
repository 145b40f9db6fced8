"""Scale probe: incremental MV refresh is O(delta), not O(base).

Builds two base tables differing 10x in size (200k vs 2M rows), brings
the rollup MV current, then times one refresh folding in the SAME
30k-row delta. The claim under test: refresh wall-clock tracks the
delta (flat across the 10x base) because read_changes hands the
partial-agg exactly the added files — the base is never re-read. A full
recompute (rebuild_rollup) is timed as the contrast: it scales with the
base, which is why it is reserved for the non-append degradation path.

Run:  python tools/scale_probe_logmv.py
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

from crypto_clickhouse_poc_spark.plans import logmv as M
from crypto_clickhouse_poc_spark.plans import snapshots as S

DELTA_ROWS = 30_000


def _rows(spark, n: int, base: int):
    return spark.range(base, base + n).select(
        F.timestamp_seconds(F.lit(1_700_000_000) + (F.col("id") % 86_400)).alias("ts"),
        F.concat(F.lit("S"), (F.col("id") % 8).cast("string")).alias("symbol"),
        F.col("id").alias("trade_id"),
        (F.col("id") % 997).cast("double").alias("price"),
        F.lit(1.0).alias("qty"),
        F.lit(0).cast("long").alias("ingested_at"),
    )


def run(spark, base_rows: int) -> dict:
    d = tempfile.mkdtemp()
    base, mv = d + "/b", d + "/m"
    S.append(_rows(spark, base_rows, 0), base)
    M.refresh_rollup(spark, base, mv)  # MV current at the big base

    S.append(_rows(spark, DELTA_ROWS, 10_000_000), base)
    t0 = time.time()
    M.refresh_rollup(spark, base, mv)
    t_refresh = time.time() - t0

    t0 = time.time()
    M.rebuild_rollup(spark, base, mv)
    t_rebuild = time.time() - t0
    shutil.rmtree(d, ignore_errors=True)
    return {
        "base_rows": base_rows,
        "refresh_s": round(t_refresh, 2),
        "rebuild_s": round(t_rebuild, 2),
    }


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("scale-probe-logmv")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    small = run(spark, 200_000)
    big = run(spark, 2_000_000)
    out = {
        "probe": "logmv_refresh_vs_rebuild",
        "delta_rows": DELTA_ROWS,
        "runs": [small, big],
        "refresh_ratio_10x_base": round(big["refresh_s"] / small["refresh_s"], 2),
        "rebuild_ratio_10x_base": round(big["rebuild_s"] / small["rebuild_s"], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
