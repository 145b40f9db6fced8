#!/usr/bin/env python
"""ANN-family scale probe: multiply the embeddings fixture 10× (disjoint
id spaces, same distribution) and compare wall-clock at 1× vs 10× for the
linear-shaped similarity queries. Dev tool (like tools/driver_sim.py);
results recorded in PERF.md's scale-probe section.

The multiplied copy lives in a temp dir shaped like an sf dir, so every
query runs unmodified. Training (k-means + PQ) is timed separately from
probes — production trains once and serves many probes, so probe latency
is the scaling number that matters.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("SCALE_PROBE_MULT", "10"))
QUERIES = ["ann_topk_brute", "ann_ivf_assign", "ann_ivf_search", "ann_ivf_pq_search"]


def main() -> None:
    spark = get_spark("scale-probe-ann")
    from crypto_clickhouse_poc_spark import operators
    from crypto_clickhouse_poc_spark.operators import similarity as S

    qs = operators.library_queries()

    big_dir = tempfile.mkdtemp(prefix="ann_scale_")
    try:
        e = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
        n = e.count()
        shift = n * 10  # disjoint id spaces per copy; queries stay vec_id < 5
        parts = [
            e.withColumn("vec_id", F.col("vec_id") + F.lit(k * shift))
            for k in range(MULT)
        ]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(os.path.join(big_dir, "embeddings.parquet"))
        print(f"# {n} -> {n * MULT} vectors", flush=True)

        for label, d in (("1x", SF), (f"{MULT}x", big_dir)):
            t0 = time.perf_counter()
            S._train_kmeans(spark, d)
            S._train_pq(spark, d)
            t_train = time.perf_counter() - t0
            print(f"# [{label}] train (kmeans+pq): {t_train:.2f}s", flush=True)
            for name in QUERIES:
                runs = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    qs[name](spark, d).count()
                    runs.append(time.perf_counter() - t0)
                runs.sort()
                print(f"# [{label}] {name}: p50 {runs[1]:.2f}s", flush=True)
    finally:
        shutil.rmtree(big_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
