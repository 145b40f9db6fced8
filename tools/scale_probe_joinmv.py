"""Scale probe: a dim update on an enriched (fact ⋈ dim) rollup costs
O(the affected key's fact rows), not O(table agg + full MV rewrite) —
and on a key-CLUSTERED fact layout (r13 ``cluster_cols``), the scoped
read opens only the files whose key range can hold the affected key.

Builds fact tables differing 10x (1M vs 10M rows, 64 symbols → a key
owns ~1.6% of the rows) in BOTH layouts — unclustered (every file spans
the symbol domain; the row-pruned scan is the I/O floor) and clustered
by symbol (``append(cluster_cols=("symbol",))``; each file covers a
contiguous symbol range and the manifest records it) — brings the joinmv
rollup current, then runs the change the module exists for: a ONE-ROW
dim update followed by one refresh. Receipts per layout: refresh
wall-clock, the rebuild contrast, and the file-prune effect
(files the manifest listed → files the scoped read actually opened).

Run:  python tools/scale_probe_joinmv.py
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans import joinmv as J
from crypto_clickhouse_poc_spark.plans import snapshots as S

N_SYMBOLS = 64


def _rows(spark, n: int, base: int):
    return spark.range(base, base + n).select(
        F.timestamp_seconds(F.lit(1_700_000_000) + (F.col("id") % 86_400)).alias("ts"),
        F.concat(F.lit("S"), (F.col("id") % N_SYMBOLS).cast("string")).alias("symbol"),
        F.col("id").alias("trade_id"),
        (F.col("id") % 997).cast("double").alias("price"),
        F.lit(1.0).alias("qty"),
        F.lit(0).cast("long").alias("ingested_at"),
    )


def _dim(spark, moved: bool = False):
    rows = [
        (
            f"S{i}",
            "MOVED" if (moved and i == 7) else ("EVEN" if i % 2 == 0 else "ODD"),
            datetime.datetime(2024, 1, 1),
        )
        for i in range(N_SYMBOLS)
    ]
    return spark.createDataFrame(rows, "symbol string, sector string, ts timestamp")


def run(spark, fact_rows: int, clustered: bool) -> dict:
    d = tempfile.mkdtemp()
    fact, dim, mv = d + "/f", d + "/d", d + "/m"
    step = fact_rows // 4
    cluster = ("symbol",) if clustered else None
    for k in range(4):
        S.append(_rows(spark, step, k * step), fact, cluster_cols=cluster)
    S.append(_dim(spark), dim)
    J.refresh_enriched_rollup(spark, fact, dim, mv)

    # the change: one key (S7, ~1/64 of the fact) moves sector
    S.upsert_by_keys(
        _dim(spark, moved=True).where(F.col("symbol") == "S7"),
        dim,
        cols=["symbol"],
    )
    prune_effect: list[tuple[int, int]] = []
    real = S.prune_files_by_values

    def spy(files, key_col, values):
        out = real(files, key_col, values)
        prune_effect.append((len(files), len(out)))
        return out

    S.prune_files_by_values = spy
    try:
        t0 = time.time()
        J.refresh_enriched_rollup(spark, fact, dim, mv)
        t_scoped = time.time() - t0
    finally:
        S.prune_files_by_values = real
    op = S._version_body(mv, S.latest_version(mv))["op"]
    t0 = time.time()
    J.rebuild_enriched(spark, fact, dim, mv)
    t_rebuild = time.time() - t0
    shutil.rmtree(d, ignore_errors=True)
    listed = max((n for n, _ in prune_effect), default=0)
    opened = min((o for _, o in prune_effect), default=0)
    return {
        "fact_rows": fact_rows,
        "clustered": clustered,
        "dim_update_refresh_sec": round(t_scoped, 2),
        "refresh_op": op,
        "files_listed": listed,
        "files_opened": opened,
        "rebuild_sec": round(t_rebuild, 2),
    }


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe-joinmv")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    out = {}
    for name, n in (("small", 1_000_000), ("big", 10_000_000)):
        flat = run(spark, n, clustered=False)
        clus = run(spark, n, clustered=True)
        out[name] = {"flat": flat, "clustered": clus}
        out[f"scoped_vs_rebuild_{name}"] = round(
            clus["dim_update_refresh_sec"] / clus["rebuild_sec"], 2
        )
        out[f"cluster_speedup_{name}"] = round(
            flat["dim_update_refresh_sec"]
            / max(clus["dim_update_refresh_sec"], 1e-9),
            2,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
