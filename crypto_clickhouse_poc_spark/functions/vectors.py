"""Vector math over ``array<float>`` embedding columns — built-ins only.

Dot products / norms are expressed with ``zip_with`` + ``aggregate`` folds:
JVM-side, codegen'd, and — critically for oracle parity — a *sequential
in-index-order* fold, so the floating-point result is reproducible. Arrays
are cast to ``array<double>`` first so both engines do the same IEEE ops.

At 100 TB these expressions vectorize fine, but for very wide fan-out ANN a
Pandas-UDF (numpy matmul) path wins on constant factors — see
``operators.similarity`` for where each is used.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
