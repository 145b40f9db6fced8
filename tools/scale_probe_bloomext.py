"""Scale probe: bloom-index EXTENSION is O(new files), not O(table).

Builds two snapshot tables differing 10x in file count (12 vs 120 monthly
appends), builds the index, appends the SAME 2-file delta, then times
``extend_bloom_index`` vs a full ``build_bloom_index``. Claim (r9 verdict
item #3): extension wall-clock is flat across the 10x table (it scans
only the delta's files); rebuild scales with the table.

Run:  python tools/scale_probe_bloomext.py
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

from crypto_clickhouse_poc_spark.plans import bloomidx as B
from crypto_clickhouse_poc_spark.plans import snapshots as S

ROWS_PER_APPEND = 20_000


def _rows(spark, n: int, base: int, month: int):
    return spark.range(base, base + n).select(
        F.to_timestamp(F.lit(f"2024-{month:02d}-01 00:00:00")).alias("ts"),
        F.lit("BTC").alias("symbol"),
        F.col("id").alias("trade_id"),
        (F.col("id") % 997).cast("double").alias("price"),
        F.lit(0).cast("long").alias("ingested_at"),
    )


def run(spark, n_appends: int) -> dict:
    d = tempfile.mkdtemp()
    path = d + "/t"
    for k in range(n_appends):
        S.append(
            _rows(spark, ROWS_PER_APPEND, k * ROWS_PER_APPEND, 1 + k % 12),
            path,
        )
    B.build_bloom_index(spark, path, "trade_id")

    hi = n_appends * ROWS_PER_APPEND
    S.append(_rows(spark, ROWS_PER_APPEND, hi, 1), path)
    S.append(_rows(spark, ROWS_PER_APPEND, hi + ROWS_PER_APPEND, 2), path)
    t0 = time.time()
    meta = B.extend_bloom_index(spark, path, "trade_id")
    t_extend = time.time() - t0
    n_dirs = len(B._dirs_of(meta))

    t0 = time.time()
    B.build_bloom_index(spark, path, "trade_id")
    t_rebuild = time.time() - t0
    probe = B.read_point(spark, path, "trade_id", hi + 5)
    ok = probe.count() == 1
    shutil.rmtree(d, ignore_errors=True)
    return {
        "n_files": n_appends + 2,
        "extend_sec": round(t_extend, 2),
        "extend_dirs": n_dirs,
        "rebuild_sec": round(t_rebuild, 2),
        "post_extend_lookup_ok": ok,
    }


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe-bloomext")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    small = run(spark, 12)
    big = run(spark, 120)
    print(
        json.dumps(
            {
                "small": small,
                "big": big,
                "extend_ratio_10x_files": round(
                    big["extend_sec"] / small["extend_sec"], 2
                ),
                "rebuild_ratio_10x_files": round(
                    big["rebuild_sec"] / small["rebuild_sec"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
