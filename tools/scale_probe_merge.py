"""Scale probe: snapshot-log MERGE INTO wall-clock vs table size.

Builds two snapshot tables from the events fixture — sf0.01 (~60k rows)
and sf0.1 (~600k rows), each appended in 8 commits so the head holds
dozens of files — then merges the SAME small source (200 updates + 50
inserts) into each and reports the 10×-table wall-clock ratio (p50 of 3
runs, each against a fresh copy of the table so every run rewrites the
same state).

What the ratio demonstrates: merge cost = one column-pruned key scan
(linear in table, cheap) + a rewrite of ONLY the touched files (constant
here — the source's keys land in a bounded set of files regardless of
table size). So 10× table rows must cost far less than 10× wall-clock;
the copy-on-write claim in plans/snapshots.merge_into is measured, not
asserted.

Dev tool, same family as scale_probe_assemble.py; results in PERF.md.
"""

import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from crypto_clickhouse_poc_spark.plans import snapshots as S  # noqa: E402
from crypto_clickhouse_poc_spark.session import get_spark  # noqa: E402
from crypto_clickhouse_poc_spark.tables import load  # noqa: E402


def build_table(spark, sf_dir: str, path: str) -> None:
    ev = load(spark, sf_dir, "events").select(
        "ts",
        F.col("event_type").alias("symbol"),
        F.col("event_id").alias("trade_id"),
        F.col("value").alias("price"),
        F.lit(0).alias("ingested_at"),
    )
    n = ev.count()
    for k in range(8):  # 8 commits → a head of dozens of files
        S.append(ev.where(F.col("trade_id") % 8 == k), path)
    assert sum(1 for _ in S.manifest(path, S.latest_version(path))["files"]) >= 8
    print(f"  built {path}: {n} rows, "
          f"{len(S.manifest(path, S.latest_version(path))['files'])} files")


def main() -> None:
    spark = get_spark("scale-probe-merge")
    spark.sparkContext.setLogLevel("ERROR")
    work = Path(tempfile.mkdtemp(prefix="merge_probe_"))
    results = {}
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        base = work / Path(sf).name
        build_table(spark, sf, str(base))
        src = (
            S.read_snapshot(spark, str(base))
            .where(F.col("trade_id") % 297 == 0)
            .limit(200)
            .drop("p_month")
            .withColumn("price", F.col("price") + 1.0)
        ).unionByName(
            spark.range(50).select(
                F.lit("2024-06-01 00:00:00").cast("timestamp").alias("ts"),
                F.lit("new").alias("symbol"),
                (F.col("id") + 10_000_000_000).alias("trade_id"),
                F.lit(1.0).alias("price"),
                F.lit(1).alias("ingested_at"),
            )
        ).cache()
        src.count()
        runs = []
        for r in range(3):
            copy = work / f"{Path(sf).name}_run{r}"
            shutil.copytree(base, copy)
            t0 = time.perf_counter()
            S.merge_into(spark, str(copy), src, ["symbol", "trade_id"])
            runs.append(time.perf_counter() - t0)
            shutil.rmtree(copy, ignore_errors=True)
        src.unpersist()
        results[sf] = statistics.median(runs)
        print(f"{sf}: merge p50 {results[sf]:.2f}s (runs {[round(x, 2) for x in runs]})")
    small, big = results["/root/testdata/sf0.01"], results["/root/testdata/sf0.1"]
    print(f"10x table rows -> {big / small:.2f}x merge wall-clock")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
