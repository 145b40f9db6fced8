"""Scale probe: group-scoped refresh of a NON-invertible MV is
O(affected groups' rows), not O(base).

Builds two base tables differing 10x (1M vs 10M rows), brings a BARS
rollup (min/max/open/close — non-retractable partials) current, then
runs the most common production event — a small position delete hitting
a handful of (minute, symbol) groups — followed by one refresh. The
claim under test (r11 verdict item #1): the refresh derives the affected
group set from the CDC delete rows, re-aggregates ONLY those groups from
the pinned head through manifest-level ts pruning + an exact broadcast
group semi-join, and swaps their partials in one atomic upsert — so its
wall-clock is flat across the 10x base. The contrast is the pre-r12
behavior: any delete forced rebuild_rollup, which scales with the base.

Run:  python tools/scale_probe_scoped.py
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
    # ~1 day of synthetic trades: 1440 minutes x 8 symbols of groups, so
    # the 10x table has 10x rows per group AND plenty of untouched groups
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
    step = base_rows // 4
    for k in range(4):
        S.append(_rows(spark, step, k * step), base)
    M.refresh_rollup(spark, base, mv)  # bars partials, no negate_fn

    # the erasure: 50 trade ids — their ts values cluster in a few
    # minutes, so the affected group set is a handful of (minute, symbol)
    S.delete_where(spark, base, "trade_id >= 100 and trade_id < 150")
    t0 = time.time()
    M.refresh_rollup(spark, base, mv)
    t_scoped = time.time() - t0
    op = S._version_body(mv, S.latest_version(mv))["op"]

    t0 = time.time()
    M.rebuild_rollup(spark, base, mv)
    t_rebuild = time.time() - t0
    shutil.rmtree(d, ignore_errors=True)
    return {
        "base_rows": base_rows,
        "scoped_refresh_sec": round(t_scoped, 2),
        "refresh_op": op,
        "rebuild_sec": round(t_rebuild, 2),
    }


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe-scoped")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    small = run(spark, 1_000_000)
    big = run(spark, 10_000_000)
    print(
        json.dumps(
            {
                "small": small,
                "big": big,
                "scoped_ratio_10x_base": round(
                    big["scoped_refresh_sec"] / small["scoped_refresh_sec"], 2
                ),
                "rebuild_ratio_10x_base": round(
                    big["rebuild_sec"] / small["rebuild_sec"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
