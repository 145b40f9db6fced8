"""Simulate the driver correctness gate across ALL declared queries.

Vanilla session, sf0.01, DuckDB oracle, column-name-sorted value compare —
the same shape the driver uses. Not part of the package; dev tool.

BOTH sides are canonicalized through pandas (``sdf.toPandas()`` /
``duckdb .df()``) because that is the DRIVER's conversion path: a result
that only breaks during pandas conversion (out-of-range timestamps like
a 9999-12-31 sentinel, dtype coercions, NaN/None conflation) must fail
HERE, pre-commit — the r6 ``cust_scd2_merge`` red row shipped precisely
because the old ``collect()+str`` canonicalization couldn't see it.
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

import numpy as np
import pandas as pd


def _canon_val(v):
    """One canonical string per value: None, NaT and pd.NA print as NULL;
    float NaN prints as its OWN token (r7 ADVICE: conflating NaN with
    NULL hid genuine Spark-NaN-vs-oracle-NULL divergence — note the
    residual limit: for double columns pandas itself maps NULL→NaN on
    BOTH sides' .toPandas()/.df(), so the distinct token only bites
    where pandas preserves the difference, e.g. object-dtype columns);
    integer-valued floats print as ints (pandas promotes nullable int
    columns to float64 — the promotion happens on both sides when the
    NULL sets agree, and a disagreeing NULL set diffs on its own row)."""
    if v is None:
        return "NULL"
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v.is_integer() and abs(v) < 2**53:
            return str(int(v))
    try:
        if v is pd.NaT or v is pd.NA:
            return "NULL"
    except Exception:  # noqa: BLE001
        pass
    return str(v)


def _canon_frame(pdf):
    """(sorted columns, canonical row tuples in pandas sort order).

    The sort MUST go through pandas ``sort_values`` — the DRIVER's
    canonicalization path — not a Python tuple sort: ``sort_values``
    factorizes each column and CRASHES on unhashable cells
    (list/ndarray), which is exactly how the r8 ``doc_hash_embed``
    red row shipped — the old tuple-sort here handled lists fine while
    the driver's pandas sort raised ``TypeError: unhashable type``.
    The simulator must fail where the driver fails (the r6
    ``cust_scd2_merge`` lesson, one conversion step later)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    rows = [
        tuple(_canon_val(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    # the canonical-string pass erases ordering differences the raw sort
    # keyed on (e.g. -0.0 vs 0.0, NaN position); re-sort the CANONICAL
    # tuples so both sides compare in one deterministic order — the raw
    # sort_values above is kept purely to reproduce driver-side crashes
    return cols, sorted(rows)


results = {}
for name, fn in qs.items():
    t0 = time.time()
    try:
        sdf = fn(spark, SF)
        # schema lint: the driver's pandas canonicalizer only handles
        # scalar cells — a declared array/map/struct column is a red row
        # even when its values are oracle-exact (r8 doc_hash_embed)
        complex_cols = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if complex_cols:
            raise TypeError(
                f"declared output has non-scalar columns {complex_cols}; "
                "explode or stringify them (driver sort_values cannot hash)"
            )
        # toPandas IS the gate: the driver converts through pandas, so
        # conversion-time failures must reproduce here
        scols, srows = _canon_frame(sdf.toPandas())
        dcols, drows = _canon_frame(con.execute(os_[name]).df())
        assert dcols == scols, (dcols, scols)
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
