"""Scale probe: corpus_assemble wall-clock vs corpus size.

Runs the end-to-end assembly chain at sf0.01 (500 docs) and sf0.1
(5000 docs) on the same session and reports the 10×-docs wall-clock
ratio (p50 of 3 warm runs each). The chain is a composition of
linear-shuffle stages (digest dedup, banded LSH, broadcast decontam,
two-pass mix, shard windows), so the ratio should stay well under 10× —
fixed per-query overheads (driver rounds of the component step, cache
materialization, plan compile) dominate at fixture scale.

Dev tool, same family as scale_probe_spans.py / scale_probe_ann.py;
results are recorded in PERF.md.
"""

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from crypto_clickhouse_poc_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("scale-probe-assemble")
    spark.sparkContext.setLogLevel("ERROR")
    from crypto_clickhouse_poc_spark.operators.assemble import corpus_assemble

    results = {}
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        corpus_assemble(spark, sf).collect()  # warm: JIT + page cache
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            corpus_assemble(spark, sf).collect()
            runs.append(time.perf_counter() - t0)
        results[sf] = statistics.median(runs)
        print(f"{sf}: {results[sf]:.2f}s (runs {[round(r, 2) for r in runs]})")
    small, big = results["/root/testdata/sf0.01"], results["/root/testdata/sf0.1"]
    print(f"10x docs -> {big / small:.2f}x wall-clock")


if __name__ == "__main__":
    main()
