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

import math

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


# --- coarse quantization (IVF assignment) ---------------------------------
#
# The trained centroid table is tiny (k rows) and, once collected, can be
# inlined into the plan as an array-of-structs LITERAL — so assigning every
# vector to its nearest centroid is a pure per-row projection: a transform
# (one cosine per centroid) + array_sort fold. Zero joins, zero Exchange,
# no vectors×k row explosion — the shape that survives 100 TB, where the
# crossJoin+window argmax alternative multiplies the scan by k and shuffles
# it. For k beyond ~10³ the literal bloats codegen; at that size switch the
# same fold to a one-row broadcast array or a numpy Pandas-UDF argmax — the
# per-row semantics (and the oracle) are unchanged.


def _dbl_sql(x) -> str:
    """One double as a Spark-SQL literal. ``repr(float)`` is
    shortest-round-trip so the parsed double is bit-identical to the
    ``F.lit`` it replaces — but ``repr`` of non-finite values yields
    ``nan``/``inf``, which the SQL parser rejects ('nanD' is not a
    literal). Those spell as typed CAST strings instead, matching what
    the F.lit path produced, so a NaN sneaking into trained centroids
    or a PQ LUT degrades the distance (as before) rather than crashing
    plan construction."""
    v = float(x)
    if math.isnan(v):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(v):
        return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
    return f"{v!r}D"


def dbl_array(vals) -> Column:
    """A ``array<double>`` literal in ONE py4j call: PySpark's
    ``F.lit``/``F.array`` build one JVM round trip PER ELEMENT (~1 ms
    each — a 24×64 hyperplane matrix costs ~1.6 s of pure driver time
    per plan build, measured r13), while one ``F.expr`` string parses
    JVM-side in ~1 ms total."""
    return F.expr("array(" + ",".join(_dbl_sql(x) for x in vals) + ")")


def dbl_array2(rows) -> Column:
    """``array<array<double>>`` literal in one py4j call (the PQ
    distance-LUT shape: per-subspace code tables)."""
    inner = ",".join(
        "array(" + ",".join(_dbl_sql(x) for x in r) + ")" for r in rows
    )
    return F.expr(f"array({inner})")


def centroid_literal(rows: list[tuple]) -> Column:
    """Inline trained centroids ``[(cid, cv, cnrm), ...]`` as an
    ``array<struct<cid:bigint, cv:array<double>, cnrm:double>>`` literal."""
    return F.array(
        *[
            F.struct(
                F.lit(int(cid)).cast("long").alias("cid"),
                dbl_array(cv).alias("cv"),
                F.lit(float(cnrm)).alias("cnrm"),
            )
            for cid, cv, cnrm in rows
        ]
    )


def centroid_ranking(v: Column, nrm: Column, cent: Column) -> Column:
    """Per-row centroid ranking: ``array<struct<negcos, cid>>`` sorted by
    cosine DESC, cid ASC (negated cosine + natural struct order gives
    exactly the ``row_number() OVER (ORDER BY cosine DESC, cid)`` tie-break
    the oracle uses). ``ranking[0]['cid']`` is the nearest centroid;
    ``-ranking[0]['negcos']`` its cosine; slots 1.. are the multi-probe
    runners-up."""
    scored = F.transform(
        cent,
        lambda c: F.struct(
            (-(dot(v, c["cv"]) / (nrm * c["cnrm"]))).alias("negcos"),
            c["cid"].alias("cid"),
        ),
    )
    return F.array_sort(scored)


# --- signed-random-projection (SRP / Charikar) sketch ---------------------
#
# Shared by the LSH-bucketed dedup (operators.dedup.dedup_embedding_lsh) and
# ANN search (operators.similarity.ann_srp_search). The hyperplanes are
# deterministic (md5-parity signs) and inlined as literals into both the
# Spark plan and the generated DuckDB oracle SQL, so the sketch is
# bit-reproducible across engines.

EMB_DIM = 64  # fixture embeddings dimension (TESTDATA.md)
# 4 bands of 6 bits: 64 buckets per band keeps the in-bucket pair work ~4×
# below a 4-bit banding at equal vector count, while P[pair proposed] at
# cosine 0.97 stays ≈ 1-(1-p⁶)⁴ ≈ 0.98 (p = 1-θ/π ≈ 0.92). Weak pairs near
# the 0.35 verify floor are proposed rarely (~0.2) — SRP-LSH is a NEAR-dup
# recaller by design; the exactness baseline is dedup_embedding.
SRP_BITS = 24
SRP_BANDS = 4  # 6 bits per band


def srp_signs() -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix (SRP_BITS × EMB_DIM): sign =
    parity of the first md5 byte of ``"bit:dim"``."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{b}:{j}".encode()).digest()[0] % 2 == 0 else -1.0
            for j in range(EMB_DIM)
        ]
        for b in range(SRP_BITS)
    ]


def srp_band_keys(v: Column) -> list[Column]:
    """Banded SRP bucket keys for a ``array<double>`` vector column:
    bit_b = (v · h_b) > 0, band key k = the 4-bit int of bits 4k..4k+3.
    Returns SRP_BANDS small-int columns aliased ``bk0..bk{n-1}``."""
    signs = srp_signs()
    bits = [
        (dot(v, dbl_array(signs[b])) > 0).cast("int")
        for b in range(SRP_BITS)
    ]
    step = SRP_BITS // SRP_BANDS
    keys = []
    for k in range(SRP_BANDS):
        key = F.lit(0)
        for i in range(step):
            key = key + bits[k * step + i] * (1 << i)
        keys.append(key.alias(f"bk{k}"))
    return keys


def srp_band_keys_sql(vec_expr: str = "v") -> list[str]:
    """The DuckDB twin of :func:`srp_band_keys`: SQL expressions (one per
    band, aliased ``bk{k}``) over a DOUBLE[] column, same inlined signs."""
    signs = srp_signs()
    step = SRP_BITS // SRP_BANDS
    out = []
    for k in range(SRP_BANDS):
        terms = []
        for i in range(step):
            lit = "[" + ", ".join(str(s) for s in signs[k * step + i]) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product({vec_expr}, {lit}) > 0"
                f" THEN {1 << i} ELSE 0 END)"
            )
        out.append(" + ".join(terms) + f" AS bk{k}")
    return out
