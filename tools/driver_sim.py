"""Simulate the driver correctness gate across ALL declared queries.

Vanilla session, sf0.01, DuckDB oracle, column-name-sorted value compare —
the same shape the driver uses. Not part of the package; dev tool.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
import __spark_entry__ as E

qs, os_ = E.queries(), E.oracle_sql()
print(f"declared: {len(qs)} oracles: {len(os_)}", flush=True)

import duckdb

con = duckdb.connect()
SF = "/root/testdata/sf0.01"
for name in (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split():
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF}/{name}.parquet'")

results = {}
for name, fn in qs.items():
    t0 = time.time()
    try:
        sdf = fn(spark, SF)
        scols = sorted(sdf.columns)
        srows = sorted(
            tuple(str(r[c]) for c in scols) for r in sdf.collect()
        )
        dres = con.execute(os_[name])
        dcols = [d[0] for d in dres.description]
        assert sorted(dcols) == scols, (sorted(dcols), scols)
        perm = [dcols.index(c) for c in scols]
        drows = sorted(tuple(str(r[i]) for i in perm) for r in dres.fetchall())
        ok = srows == drows
        results[name] = {
            "rows": len(srows),
            "match": ok,
            "sec": round(time.time() - t0, 2),
        }
        if not ok:
            diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            results[name]["sample_diff"] = diff
    except Exception as exc:  # noqa: BLE001
        results[name] = {"err": repr(exc)[:300], "sec": round(time.time() - t0, 2)}
    r = results[name]
    print(f"{name}: {r}", flush=True)

bad = {n: r for n, r in results.items() if not r.get("match")}
print(json.dumps({"total": len(results), "bad": list(bad)}))
sys.exit(1 if bad else 0)
