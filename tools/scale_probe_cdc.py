"""Scale probe: retractable MV refresh is O(delta + deletes), not O(base).

Builds two base tables differing 10x (200k vs 2M rows), brings a SUMS
rollup MV current, then runs the most common production event — a small
position delete on the base — followed by one refresh. The claim under
test (r9 verdict item #2): the refresh consumes the CDC feed's retraction
rows (the delete names its files; only THOSE files are read) and appends
negative partials, so its wall-clock is flat across the 10x base. The
contrast is the pre-r10 behavior: any delete in the range forced
rebuild_rollup, which scales with the base AND rewrites the whole MV.

Run:  python tools/scale_probe_cdc.py
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
    # four appends so the delete's files are a strict subset of the table
    step = base_rows // 4
    for k in range(4):
        S.append(_rows(spark, step, k * step), base)
    M.refresh_rollup(
        spark, base, mv, partial_fn=M.partial_sums, negate_fn=M.negate_sums
    )

    # the erasure: 50 rows, all inside ONE append's files
    S.delete_where(spark, base, "trade_id >= 100 and trade_id < 150")
    t0 = time.time()
    M.refresh_rollup(
        spark, base, mv, partial_fn=M.partial_sums, negate_fn=M.negate_sums
    )
    t_retract = time.time() - t0
    op = S._version_body(mv, S.latest_version(mv))["op"]

    t0 = time.time()
    M.rebuild_rollup(spark, base, mv, partial_fn=M.partial_sums)
    t_rebuild = time.time() - t0
    shutil.rmtree(d, ignore_errors=True)
    return {
        "base_rows": base_rows,
        "retract_refresh_sec": round(t_retract, 2),
        "refresh_op": op,
        "rebuild_sec": round(t_rebuild, 2),
    }


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe-cdc")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    # 1M/10M (not the other probes' 200k/2M): at 2M rows the fixed Spark
    # overhead still dominates a full rebuild, hiding its O(base) slope
    small = run(spark, 1_000_000)
    big = run(spark, 10_000_000)
    print(
        json.dumps(
            {
                "small": small,
                "big": big,
                "retract_ratio_10x_base": round(
                    big["retract_refresh_sec"] / small["retract_refresh_sec"], 2
                ),
                "rebuild_ratio_10x_base": round(
                    big["rebuild_sec"] / small["rebuild_sec"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
