"""Bench-fixture receipt (r14, VERDICT r13 next #7): files opened by the
enriched replay's KEY-SCOPED reads on the actual bench entry.

Runs `operators.lakehouse_q.mv_enriched_replay` verbatim against
$SPARK_GRAFT_SF_DIR (default sf0.1) with a spy on
`snapshots.prune_files_by_values`, and prints every (listed → survived)
file-prune event. The dim-update refresh's scoped read should open a
strict SUBSET of the symbol-clustered fact's manifest — a layout
regression (losing cluster_cols or key stats) shows up here as
listed == survived.

Run:  python tools/bench_probe_enriched.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_clickhouse_poc_spark.plans import snapshots as S
from crypto_clickhouse_poc_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-probe-enriched")

    events = []
    real = S.prune_files_by_values

    def spy(files, key_col, values, **kw):
        out = real(files, key_col, values, **kw)
        events.append((key_col, len(files), len(out)))
        return out

    S.prune_files_by_values = spy
    try:
        from crypto_clickhouse_poc_spark.operators.lakehouse_q import (
            mv_enriched_replay,
        )

        t0 = time.time()
        n = mv_enriched_replay(spark, sf_dir).count()
        el = time.time() - t0
    finally:
        S.prune_files_by_values = real

    print(f"mv_enriched_replay @ {sf_dir}: {n} rows in {el:.2f}s")
    if not events:
        print("NO prune events — key-scoped read lost its layout receipts!")
    for key_col, listed, opened in events:
        tag = "SUBSET" if opened < listed else "full-width"
        print(f"  prune[{key_col}]: listed={listed} -> opened={opened}  {tag}")
    spark.stop()


if __name__ == "__main__":
    main()
