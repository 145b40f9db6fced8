"""functions/vectors literal builders — the one-parse py4j rule.

``dbl_array``/``dbl_array2`` render an array literal as ONE ``F.expr``
parse instead of per-element ``F.lit`` round trips. These gates pin the
r13-advice seam: repr() of non-finite floats is not SQL ('nanD'), so
NaN/±Inf must spell as typed CASTs — a NaN sneaking into trained
centroids degrades a distance instead of crashing plan construction —
and finite values stay bit-identical to the ``F.lit`` path.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.functions import vectors as V


def test_dbl_array_roundtrips_finite_values_bit_exact(spark):
    vals = [0.1, -2.5e-300, 7.0, 1.7976931348623157e308]
    row = spark.range(1).select(V.dbl_array(vals).alias("a")).first()
    assert row.a == vals  # repr() is shortest-round-trip: bit-identical


def test_dbl_array_nonfinite_values_build_and_evaluate(spark):
    vals = [float("nan"), float("inf"), float("-inf"), 1.5]
    row = spark.range(1).select(V.dbl_array(vals).alias("a")).first()
    assert math.isnan(row.a[0])
    assert row.a[1] == float("inf") and row.a[2] == float("-inf")
    assert row.a[3] == 1.5


def test_dbl_array2_nonfinite_rows(spark):
    row = (
        spark.range(1)
        .select(V.dbl_array2([[1.0, float("nan")], [float("-inf"), 2.0]]).alias("m"))
        .first()
    )
    assert row.m[0][0] == 1.0 and math.isnan(row.m[0][1])
    assert row.m[1][0] == float("-inf") and row.m[1][1] == 2.0
