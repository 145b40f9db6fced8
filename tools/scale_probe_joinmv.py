"""Scale probe: a dim update on an enriched (fact ⋈ dim) rollup costs
O(the affected key's fact rows), not O(table agg + full MV rewrite).

Builds two fact tables differing 10x (1M vs 10M rows, 64 symbols → a
key owns ~1.6% of the rows), brings the joinmv rollup current, then runs
the change the module exists for — a ONE-ROW dim update — followed by
one refresh. The scoped leg re-aggregates only the affected key's rows
(row-pruned by a pushed native IN; at this layout every file contains
every symbol, so the file-level Bloom/clustering prune documented in the
module has nothing to bite on — the scan I/O is the floor) and swaps a
sliver of partials; the contrast is the pre-r12 answer, a full
rebuild_enriched (whole-table aggregation + complete MV rewrite).

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


def run(spark, fact_rows: int) -> dict:
    d = tempfile.mkdtemp()
    fact, dim, mv = d + "/f", d + "/d", d + "/m"
    step = fact_rows // 4
    for k in range(4):
        S.append(_rows(spark, step, k * step), fact)
    S.append(_dim(spark), dim)
    J.refresh_enriched_rollup(spark, fact, dim, mv)

    # the change: one key (S7, ~1/64 of the fact) moves sector
    S.upsert_by_keys(
        _dim(spark, moved=True).where(F.col("symbol") == "S7"),
        dim,
        cols=["symbol"],
    )
    t0 = time.time()
    J.refresh_enriched_rollup(spark, fact, dim, mv)
    t_scoped = time.time() - t0
    op = S._version_body(mv, S.latest_version(mv))["op"]

    t0 = time.time()
    J.rebuild_enriched(spark, fact, dim, mv)
    t_rebuild = time.time() - t0
    shutil.rmtree(d, ignore_errors=True)
    return {
        "fact_rows": fact_rows,
        "dim_update_refresh_sec": round(t_scoped, 2),
        "refresh_op": op,
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
    small = run(spark, 1_000_000)
    big = run(spark, 10_000_000)
    print(
        json.dumps(
            {
                "small": small,
                "big": big,
                "scoped_vs_rebuild_small": round(
                    small["dim_update_refresh_sec"] / small["rebuild_sec"], 2
                ),
                "scoped_vs_rebuild_big": round(
                    big["dim_update_refresh_sec"] / big["rebuild_sec"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
