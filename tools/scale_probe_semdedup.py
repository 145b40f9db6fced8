#!/usr/bin/env python
"""SemDeDup scale probe: the pair stage is Σ|cluster|², so scaling the
corpus WITHOUT scaling k is the documented anti-pattern (clusters grow
linearly → pair work grows quadratically). This probe measures both
regimes on synthetic gaussian corpora:

  n→10n with k FIXED      — expect ≳10× pair-stage wall-clock growth
  n→10n with k scaled 10× — expect ≈linear growth (the paper's recipe:
                            k ≈ n/1000 on LAION keeps E|cluster| flat)

Dev tool (like tools/scale_probe_ann.py); results go to PERF.md. Uses
``dedup.semantic_pairs`` directly with synthetic centroids (k-means
training cost is not the subject — assignment + pair join are).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from crypto_clickhouse_poc_spark.operators.dedup import semantic_pairs
from crypto_clickhouse_poc_spark.session import get_spark

N_BASE = int(os.environ.get("SEMDEDUP_PROBE_N", "3000"))
MULT = int(os.environ.get("SCALE_PROBE_MULT", "10"))
DIM = 64
K_BASE = 8


def _corpus(spark, n: int, seed: int):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, DIM))
    # plant 10% near-dups so the verify stage has real hits
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    for j in range(n // 10):
        noisy = base[j] + 0.15 * rng.standard_normal(DIM)
        rows.append((10_000_000 + j, [float(x) for x in noisy]))
    return spark.createDataFrame(rows, "vec_id long, v array<double>").repartition(32)


def _centroids(rng, k: int):
    C = rng.standard_normal((k, DIM))
    return [(i, [float(x) for x in C[i]], float(np.linalg.norm(C[i]))) for i in range(k)]


def _time_pairs(df, cents) -> tuple[float, int]:
    t0 = time.time()
    n = semantic_pairs(df, cents).count()
    return time.time() - t0, n


def main() -> None:
    spark = get_spark("scale-probe-semdedup")
    rng = np.random.default_rng(0)

    small = _corpus(spark, N_BASE, seed=1)
    big = _corpus(spark, N_BASE * MULT, seed=2)
    k_small = _centroids(rng, K_BASE)
    k_scaled = _centroids(rng, K_BASE * MULT)

    # warm the JVM/codegen path once, untimed
    _time_pairs(small, k_small)

    t1, p1 = _time_pairs(small, k_small)
    t_fixed, pf = _time_pairs(big, k_small)
    t_scaled, ps = _time_pairs(big, k_scaled)

    print(f"n={N_BASE} k={K_BASE}: {t1:.2f}s ({p1} pairs)")
    print(
        f"n={N_BASE * MULT} k={K_BASE} (FIXED k, anti-pattern): "
        f"{t_fixed:.2f}s ({pf} pairs) -> {t_fixed / t1:.2f}x"
    )
    print(
        f"n={N_BASE * MULT} k={K_BASE * MULT} (k scaled with n): "
        f"{t_scaled:.2f}s ({ps} pairs) -> {t_scaled / t1:.2f}x"
    )


if __name__ == "__main__":
    main()
