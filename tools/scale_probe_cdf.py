"""Scale probe: the cdfsink rollup's read cost with and without the r15
compaction seat.

The sink appends one signed partial commit per micro-batch forever, so
``read_cdf_rollup`` merges O(flushes) part-files until the maintenance
seat compacts. This probe simulates N flush commits (the sink's exact
append shape: txn-watermarked partial frames), times the merged read at
N and 10N, then compacts through the seat and re-times — the receipt
that reads are O(groups) after compaction regardless of flush count,
and bit-identical before/after.

Run: python tools/scale_probe_cdf.py [N=32]
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans import snapshots as S
from crypto_clickhouse_poc_spark.plans.maintain import CdfMVSpec, maintenance_tick
from crypto_clickhouse_poc_spark.session import get_spark
from crypto_clickhouse_poc_spark.streaming.cdfsink import CDF_APP, read_cdf_rollup

GROUPS, SUMS = ["minute", "symbol"], ["price"]


def _partial(spark, batch: int, rows_per_batch: int = 200):
    base = datetime(2024, 1, 1)
    return (
        spark.range(rows_per_batch)
        .select(
            (F.lit(base) + F.make_interval(mins=(F.col("id") % 60).cast("int")))
            .alias("minute"),
            F.concat(F.lit("S"), (F.col("id") % 16).cast("string")).alias("symbol"),
            (F.col("id") * 0.5 + batch).alias("price"),
            F.lit(1).cast("long").alias("_n"),
        )
        .groupBy("minute", "symbol")
        .agg(F.sum("price").alias("price"), F.sum("_n").alias("_n"))
    )


def _feed(spark, mv: str, n: int, start: int) -> None:
    for b in range(start, start + n):
        S.append(_partial(spark, b), mv, ts_col="minute", txn_app=CDF_APP, txn_id=b)


def _timed_read(spark, mv: str) -> tuple[float, int, list]:
    t0 = time.perf_counter()
    rows = read_cdf_rollup(spark, mv, GROUPS, SUMS).collect()
    return time.perf_counter() - t0, len(rows), sorted(map(tuple, rows))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_spark("scale-probe-cdf")
    root = tempfile.mkdtemp(prefix="probe_cdf_")
    base, mv = f"{root}/base", f"{root}/mv"
    S.append(
        spark.createDataFrame(
            [(datetime(2024, 1, 1), "S0", 1.0)],
            "minute timestamp, symbol string, price double",
        ),
        base,
        ts_col="minute",
    )
    _feed(spark, mv, n, 0)
    S.set_table_properties(
        mv,
        {
            "cdf.group_cols": '["minute", "symbol"]',
            "cdf.sum_cols": '["price"]',
            "cdf.time_col": "minute",
        },
    )
    _timed_read(spark, mv)  # warm (listing caches, codegen)
    t1, g1, rows1 = _timed_read(spark, mv)
    files1 = S._n_files(mv, S.latest_version(mv))
    print(f"uncompacted  n={n:4d} commits files={files1:5d} read={t1:6.2f}s groups={g1}")

    _feed(spark, mv, 9 * n, n)
    t10, g10, rows10 = _timed_read(spark, mv)
    files10 = S._n_files(mv, S.latest_version(mv))
    print(f"uncompacted  n={10*n:4d} commits files={files10:5d} read={t10:6.2f}s groups={g10}")

    report = maintenance_tick(
        spark, base, cdf_mvs=[CdfMVSpec(mv_path=mv)], min_rows=1
    )
    tc, gc, rowsc = _timed_read(spark, mv)
    filesc = S._n_files(mv, S.latest_version(mv))
    print(f"compacted    tick={report} files={filesc:5d} read={tc:6.2f}s groups={gc}")
    print(f"read growth uncompacted {t10/t1:4.1f}x at 10x flushes; "
          f"compacted read {tc/t1:4.2f}x of the n={n} read")
    same = rowsc == rows10  # value-level invariance across the compact
    print("post-compaction read equals pre-compaction 10n read:", same)
    if not same:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
