"""Dump `.explain("formatted")` for named queries to plans/<tag>/.

Usage:  python tools/dump_plans.py <tag> <suffix> <query> [<query> ...]
Writes plans/<tag>/<query>_<suffix>.txt for each query (sf0.01 — plan
shape, not data scale, is what the dumps witness).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    from crypto_clickhouse_poc_spark import operators
    from crypto_clickhouse_poc_spark.session import get_spark

    spark = get_spark("dump-plans")
    qs = operators.library_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        n_ex = plan.count("Exchange")
        n_sort = plan.count("Sort ")
        print(f"{name}: {n_ex} Exchange, {n_sort} Sort -> {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
