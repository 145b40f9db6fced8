"""Scale probe: per-file Bloom index vs full scan for point lookups.

Two regimes on the SAME 2M rows:

- few-big-files (32 x 62k rows): parquet row-group min/max stats already
  make the local full scan nearly free, so wall-clock is probe-overhead
  bound — the honest statement is the I/O volume (files opened 32 -> 1),
  which is what scales.
- many-files (8 appends x ~34 months ~ 272 files): the full scan's cost
  is linear in manifest files while the probe reads k words of the
  sidecar and opens the one surviving file — wall-clock crosses over
  and keeps diverging with file count.

Run:  python tools/scale_probe_bloomidx.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans import bloomidx as B
from crypto_clickhouse_poc_spark.plans import snapshots as S

ROWS = 2_000_000
KEY = 777_777


def _rows(spark, months_spread: bool):
    ts = (
        F.timestamp_seconds(F.lit(1_600_000_000) + (F.col("id") % 1000) * 86_400)
        if months_spread
        else F.timestamp_seconds(F.lit(1_700_000_000) + (F.col("id") % 86_400))
    )
    return spark.range(0, ROWS).select(
        ts.alias("ts"),
        F.lit("BTC").alias("symbol"),
        F.col("id").alias("trade_id"),
        (F.col("id") % 997).cast("double").alias("price"),
        F.lit(0).cast("long").alias("ingested_at"),
    )


def _timed(f) -> float:
    f()  # warm
    runs = []
    for _ in range(3):
        t0 = time.time()
        f()
        runs.append(time.time() - t0)
    return statistics.median(runs)


def run(spark, months_spread: bool, appends: int) -> dict:
    rows = _rows(spark, months_spread)
    d = tempfile.mkdtemp()
    p = d + "/t"
    for i in range(appends):
        S.append(rows.where(F.col("trade_id") % appends == i), p)
    t0 = time.time()
    meta = B.build_bloom_index(spark, p, "trade_id")
    t_build = time.time() - t0
    n_files = len(S.manifest(p, S.latest_version(p))["files"])
    t_full = _timed(
        lambda: S.read_snapshot(spark, p).where(F.col("trade_id") == KEY).collect()
    )
    t_pt = _timed(lambda: B.read_point(spark, p, "trade_id", KEY).collect())
    opened = len(B.read_point(spark, p, "trade_id", KEY).inputFiles())
    shutil.rmtree(d, ignore_errors=True)
    return {
        "files": n_files,
        "bits_per_file": meta["bits"],
        "build_s": round(t_build, 2),
        "full_scan_s": round(t_full, 2),
        "point_s": round(t_pt, 2),
        "files_opened": opened,
        "speedup": round(t_full / t_pt, 2),
    }


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("scale-probe-bloomidx")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    out = {
        "probe": "bloomidx_point",
        "rows": ROWS,
        "few_big_files": run(spark, months_spread=False, appends=32),
        "many_files": run(spark, months_spread=True, appends=8),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
