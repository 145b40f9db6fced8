"""Scale probe: the 1m->1h cascade tick is O(new 1m partials), not
O(1m MV) — and never O(trades).

Builds two trades bases differing 10x, brings the 1m MV and the 1h
cascade current, appends the SAME fixed delta to the base, refreshes the
1m MV, then times ONE cascade tick folding the resulting new 1m partials.
Claim (r9 verdict item #5): cascade wall-clock is flat across the 10x
base because refresh_cascade reads exactly the 1m MV's added files. The
contrast — rebuilding the 1h level from the whole 1m MV — scales with
|1m groups|.

Run:  python tools/scale_probe_cascade.py
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
    # one row per second over up to ~23 days -> many minutes AND hours
    return spark.range(base, base + n).select(
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        F.concat(F.lit("S"), (F.col("id") % 8).cast("string")).alias("symbol"),
        F.col("id").alias("trade_id"),
        (F.col("id") % 997).cast("double").alias("price"),
        F.lit(1.0).alias("qty"),
        F.lit(0).cast("long").alias("ingested_at"),
    )


def run(spark, base_rows: int) -> dict:
    d = tempfile.mkdtemp()
    base, mv1m, mv1h = d + "/b", d + "/m1", d + "/h1"
    S.append(_rows(spark, base_rows, 0), base)
    M.refresh_rollup(spark, base, mv1m)
    M.refresh_cascade(spark, mv1m, mv1h)

    S.append(_rows(spark, DELTA_ROWS, 40_000_000), base)
    M.refresh_rollup(spark, base, mv1m)
    t0 = time.time()
    M.refresh_cascade(spark, mv1m, mv1h)
    t_tick = time.time() - t0

    t0 = time.time()
    M.rebuild_rollup(
        spark, mv1m, mv1h, partial_fn=M.hour_partials, app="logmv-1h",
        ts_col="hour",
    )
    t_rebuild = time.time() - t0
    n_1m = S.read_snapshot(spark, mv1m).count()
    shutil.rmtree(d, ignore_errors=True)
    return {
        "base_rows": base_rows,
        "n_1m_partials": n_1m,
        "cascade_tick_sec": round(t_tick, 2),
        "cascade_rebuild_sec": round(t_rebuild, 2),
    }


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe-cascade")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    small = run(spark, 200_000)
    big = run(spark, 2_000_000)
    print(
        json.dumps(
            {
                "small": small,
                "big": big,
                "tick_ratio_10x_base": round(
                    big["cascade_tick_sec"] / small["cascade_tick_sec"], 2
                ),
                "rebuild_ratio_10x_base": round(
                    big["cascade_rebuild_sec"] / small["cascade_rebuild_sec"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
