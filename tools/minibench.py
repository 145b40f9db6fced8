"""Targeted per-entry bench: bench.py's exact methodology (pre-touch,
untimed warmup, clearCache before each of 3 timed runs, median) for a
subset of entries — the A/B harness for this round's per-operator work.

Usage:  python tools/minibench.py <query> [<query> ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import _pretouch
    from crypto_clickhouse_poc_spark import operators
    from crypto_clickhouse_poc_spark.session import get_spark

    _pretouch(sf_dir)
    spark = get_spark("minibench")
    qs = operators.library_queries()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    print(f"# loadavg {os.getloadavg()}", flush=True)
    for name in names:
        qs[name](spark, sf_dir).collect()  # warmup, untimed
        runs, n = [], 0
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = len(qs[name](spark, sf_dir).collect())
            runs.append(time.perf_counter() - t0)
        print(
            f"{name}: median {statistics.median(runs):.3f}s "
            f"{[round(r, 3) for r in sorted(runs)]} ({n} rows)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
