"""Scale probe: a partition BACKFILL's MV refresh is O(changed rows),
not O(table) — and the overwrite commit itself is manifest surgery.

Builds two base tables differing 10x in HISTORY LENGTH (12 vs 120
day-partitions of ~83k rows each — the production shape: a table grows
by accumulating time, a backfill touches one slice), brings the bars MV
current, then re-publishes the FIRST month with corrected prices via
``overwrite_months`` and refreshes once. Claims under test (r13):

1. the overwrite commit cost is O(overwritten month) — and it never
   touches any other month's files (asserted by file-path identity);
2. the refresh derives its scope from the overwrite's FILE-level CDC
   (one narrow map-side-combined pass over the month — the row-precise
   wide diff is explicitly NOT used for overwrite ranges, probe-driven
   r13 decision) and recomputes only that month's groups from the
   pinned head, so refresh wall-clock is FLAT across the 10x history
   while ``rebuild_rollup`` grows with the table; the commit is a
   scoped ``upsert``, never a rebuild.

Run:  python tools/scale_probe_overwrite.py
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

_T0 = 1_704_067_200  # 2024-01-01 UTC
_MONTH_ROWS = 83_333  # rows per month bucket; constant across scales


def _rows(spark, n: int, base: int):
    # consecutive ~month buckets of equal row count: row i lands in
    # month i // _MONTH_ROWS, inside one day of in-month spread (1440
    # minutes x 8 symbols of groups per month)
    return spark.range(base, base + n).select(
        F.timestamp_seconds(
            F.lit(_T0)
            + (F.col("id") / _MONTH_ROWS).cast("long") * 2_678_400
            + (F.col("id") % 86_400)
        ).alias("ts"),
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

    others_before = {
        f["path"]
        for f in S.manifest(base, S.latest_version(base))["files"]
        if f["p_month"] != "202401"
    }
    # the backfill: the FIRST month re-published with corrected prices
    jan = (
        S.read_snapshot(spark, base, months=("202401", "202401"))
        .drop(S.PARTITION_COL)
        .withColumn("price", F.col("price") + 1000.0)
    )
    t0 = time.time()
    S.overwrite_months(jan, base)
    t_overwrite = time.time() - t0
    others_after = {
        f["path"]
        for f in S.manifest(base, S.latest_version(base))["files"]
        if f["p_month"] != "202401"
    }
    assert others_after == others_before, "overwrite touched other months"

    t0 = time.time()
    M.refresh_rollup(spark, base, mv)
    t_refresh = time.time() - t0
    op = S._version_body(mv, S.latest_version(mv))["op"]

    t0 = time.time()
    M.rebuild_rollup(spark, base, mv)
    t_rebuild = time.time() - t0
    shutil.rmtree(d, ignore_errors=True)
    return {
        "base_rows": base_rows,
        "overwrite_sec": round(t_overwrite, 2),
        "refresh_sec": round(t_refresh, 2),
        "refresh_op": op,
        "rebuild_sec": round(t_rebuild, 2),
    }


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe-overwrite")
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
                "refresh_ratio_10x_base": round(
                    big["refresh_sec"] / small["refresh_sec"], 2
                ),
                "rebuild_ratio_10x_base": round(
                    big["rebuild_sec"] / small["rebuild_sec"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
