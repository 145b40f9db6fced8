"""Z-order (Morton) clustering: multi-dimensional data layout for skipping.

The reference's table layout is one-dimensional: ClickHouse ``ORDER BY
(ts, symbol, trade_id)`` (``sql/V1__create_trades_table.sql:15``) clusters
data by the *leading* key only, so granule/row-group min-max stats prune
range predicates on ``ts`` but are useless for a predicate on a trailing
column alone (every granule spans the full ``value`` domain). Z-ordering
interleaves the bits of several quantized key columns into one sort key, so
files cluster in ALL the interleaved dimensions at once — the same idea
Delta Lake / Databricks ``OPTIMIZE ZORDER BY`` and ClickHouse's
``mortonEncode`` key expressions use. Paired with a per-file skipping index
(``plans/skipping.py``), a selective predicate on ANY z-dimension prunes
~``files^(1 - 1/d)`` of the table instead of nothing.

At 100 TB the layout job is a one-off sort (``repartitionByRange`` on the
z-key → contiguous z-ranges per file → tight per-file min-max in every
dimension); queries pay nothing — pruning happens before the scan.

Everything here is JVM-side Catalyst expressions (quantize = arithmetic,
interleave = shift/AND/OR folds); no Python UDFs.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "__zkey"

#: bits per dimension. Equi-depth quantization needs few bits (256 buckets
#: per dim = 65k z-boxes for 2 dims — plenty beyond any file count); linear
#: gets more bits since its buckets can be empty under skew. 2 dims × 21
#: bits still fits a long (3 × 21 = 63).
DEFAULT_BITS = {"equidepth": 8, "linear": 16}


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale ``col`` into ``[0, 2**bits)`` given its domain ``[lo, hi]``.

    Constant-fold-friendly arithmetic; NULLs and out-of-domain values clamp
    to the edges (a NULL sorts with the minimum — it still lands in *some*
    file whose min-max covers it, so skipping stays correct).
    """
    n = (1 << bits) - 1
    if hi <= lo:  # degenerate domain: everything quantizes to 0
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(n)
    q = F.floor(scaled).cast("long")
    return F.coalesce(F.greatest(F.lit(0), F.least(F.lit(n), q)), F.lit(0))


def _interleave(quantized: Sequence[Column], bits: int) -> Column:
    """Morton-interleave ``d`` already-quantized columns into one long.

    Bit ``b`` of dimension ``i`` lands at output bit ``b*d + i``, so the
    result cycles through dimensions as it descends bit positions —
    the classic Z-curve. Built as a fold of ``2*d*bits`` shift/AND terms;
    Catalyst folds them into a single whole-stage-codegen expression.
    """
    d = len(quantized)
    out: Column = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * d + i))
    return out


def _bucket_tree(col: Column, bounds: Sequence[float], lo: int, hi: int) -> Column:
    """Equi-depth bucket index via a balanced WHEN-tree: ``bounds[i]`` is
    the inclusive upper edge of bucket ``i``. Evaluation cost is the tree
    DEPTH (log2 buckets ≈ 8 comparisons/row), all whole-stage-codegen."""
    if lo == hi:
        return F.lit(lo).cast("long")
    mid = (lo + hi) // 2
    return (
        F.when(col <= F.lit(float(bounds[mid])), _bucket_tree(col, bounds, lo, mid))
        .otherwise(_bucket_tree(col, bounds, mid + 1, hi))
    )


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    domains: Mapping[str, tuple[float, float]] | None = None,
    boundaries: Mapping[str, Sequence[float]] | None = None,
    bits: int | None = None,
    method: str = "equidepth",
) -> DataFrame:
    """Add the Morton key column ``__zkey`` over ``cols``.

    Two quantizers:

    - ``equidepth`` (default): bucket edges at the column's quantiles
      (``approxQuantile``, Greenwald-Khanna — one pass, bounded driver
      state), so every bucket holds ~equal ROWS regardless of skew. Under a
      long-tailed distribution linear buckets are mostly empty and the few
      occupied ones span huge row counts — equi-depth is what keeps z-box
      min-max ranges tight on real data, so it is the default.
    - ``linear``: min-max affine scaling — cheapest, fine for uniform keys;
      pass ``domains`` (col → (lo, hi)) to skip the bounds aggregate.

    Pass precomputed ``domains``/``boundaries`` for incremental loads: new
    data quantized against the ORIGINAL edges lands in the right z-range.

    Timestamps/dates quantize via their numeric cast; strings are not
    supported (hash them to a numeric bucket first if needed).
    """
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns; use a plain sort for 1")
    if method not in DEFAULT_BITS:
        raise ValueError(f"method must be one of {sorted(DEFAULT_BITS)}")
    bits = DEFAULT_BITS[method] if bits is None else bits
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} dims x {bits} bits overflows a long key")

    if method == "equidepth":
        n = 1 << bits
        if boundaries is None:
            dbl = df.select(
                *[F.col(c).cast("double").alias(c) for c in cols]
            )
            probs = [(i + 1) / n for i in range(n - 1)]
            qs_list = dbl.stat.approxQuantile(list(cols), probs, 1.0 / (4 * n))
            boundaries = dict(zip(cols, qs_list))
        # materialize bucket indices as real columns before interleaving:
        # _interleave references each quantized value `bits` times, and a
        # projection boundary guarantees the WHEN-tree evaluates once per
        # row instead of relying on codegen CSE to dedupe 8 copies
        tmp_names = [f"__zq_{c}" for c in cols]
        df = df.withColumns(
            {
                name: _bucket_tree(
                    F.coalesce(F.col(c).cast("double"), F.lit(float("-inf"))),
                    boundaries[c],
                    0,
                    n - 1,
                )
                for c, name in zip(cols, tmp_names)
            }
        )
        keyed = df.withColumn(
            Z_COL, _interleave([F.col(t) for t in tmp_names], bits)
        )
        return keyed.drop(*tmp_names)
    else:
        if domains is None:
            aggs = []
            for c in cols:
                aggs += [
                    F.min(F.col(c).cast("double")).alias(f"lo_{c}"),
                    F.max(F.col(c).cast("double")).alias(f"hi_{c}"),
                ]
            row = df.agg(*aggs).collect()[0]  # 1 row: the domain bounds
            domains = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}
        qs = [
            _quantize(F.col(c).cast("double"), *domains[c], bits=bits) for c in cols
        ]
    return df.withColumn(Z_COL, _interleave(qs, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 16,
    domains: Mapping[str, tuple[float, float]] | None = None,
    boundaries: Mapping[str, Sequence[float]] | None = None,
    bits: int | None = None,
    method: str = "equidepth",
) -> None:
    """Write ``df`` as ``num_files`` z-clustered parquet files.

    ``repartitionByRange`` on the z-key gives each file a contiguous,
    non-overlapping z-range (range partitioning samples the key — at scale
    this is the standard global-sort write); ``sortWithinPartitions`` keeps
    rows z-ordered inside each file so parquet row-group stats nest the
    same way. The key column itself is dropped — it is derivable, and
    keeping the storage schema identical to the source keeps readers
    oblivious to the layout.
    """
    keyed = zorder_key(
        df, cols, domains=domains, boundaries=boundaries, bits=bits, method=method
    )
    (
        keyed.repartitionByRange(num_files, F.col(Z_COL))
        .sortWithinPartitions(Z_COL)
        .drop(Z_COL)
        .write.mode("overwrite")
        .parquet(path)
    )
