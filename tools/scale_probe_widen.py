"""Scale probe: the r16 emit-cast's cost on a widened table's stream
bootstrap.

The widen×stream fix casts every emitted column to the stream's
DECLARED type, so a table widened mid-history (int32-era files under a
bigint logged schema) bootstraps correctly. The cast is per-Arrow-column
(vectorized, zero-copy where types already match); this probe is the
receipt that a widened table's bootstrap throughput equals a
homogeneous table's — the seam fix is semantics, not a tax.

Method: two tables with identical row counts — A: two long-era commits;
B: one int32-era commit, an explicit widen, one long-era commit. Both
bootstrap through the ACTUAL stream read path (SnapshotStreamReader
partitions + read, the pyarrow executor code), bypassing Structured
Streaming's fixed ~12 s bring-up so the data path is what's timed.

Run: python tools/scale_probe_widen.py [rows_per_commit=1000000]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans import snapshots as S
from crypto_clickhouse_poc_spark.session import get_spark
from crypto_clickhouse_poc_spark.sources.snapstream import (
    SnapshotCommitsDataSource,
)


def _frame(spark, n: int, ddl_int: bool, base: int):
    df = spark.range(base, base + n).select(
        F.to_timestamp(F.lit("2024-01-01")).alias("ts"),
        (F.col("id") % 7).cast("string").alias("symbol"),
        (F.col("id").cast("int") if ddl_int else F.col("id")).alias(
            "trade_id"
        ),
        (F.col("id") % 1000).cast("double").alias("price"),
    )
    return df


def _bootstrap_rows_per_sec(path: str) -> tuple[int, float]:
    ds = SnapshotCommitsDataSource(options={"path": path})
    rd = ds.streamReader(ds.schema())
    parts = rd.partitions(rd.initialOffset(), rd.latestOffset())
    t0 = time.perf_counter()
    n = 0
    for p in parts:
        for batch in rd.read(p):
            n += batch.num_rows
    dt = time.perf_counter() - t0
    return n, dt


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("scale-probe-widen")
    with tempfile.TemporaryDirectory(prefix="widen_probe_") as root:
        homo, mixed = os.path.join(root, "homo"), os.path.join(root, "mixed")
        S.append(_frame(spark, rows, False, 0), homo)
        S.append(_frame(spark, rows, False, rows), homo)
        S.append(_frame(spark, rows, True, 0), mixed)
        S.widen_column_type(mixed, "trade_id", "long")
        S.append(_frame(spark, rows, False, rows), mixed)

        for name, path in (("homogeneous", homo), ("widened", mixed)):
            _bootstrap_rows_per_sec(path)  # warm page cache / imports
            best = None
            for _ in range(3):
                n, dt = _bootstrap_rows_per_sec(path)
                best = dt if best is None or dt < best else best
            print(
                f"{name}: {n:,} rows bootstrap in {best:.3f}s "
                f"({n / best:,.0f} rows/s, min of 3)"
            )
    spark.stop()


if __name__ == "__main__":
    main()
