"""Data-quality gate: the constraint checks a pipeline runs before
downstream (training/serving) jobs consume a snapshot.

One query returns one row per check with its violation count — the shape a
scheduler can assert on (`all(violations == 0)`) and a dashboard can trend.
Each check is the cheapest plan for its class:

- primary-key uniqueness      → groupBy(pk) HAVING count>1 (one shuffle)
- referential integrity       → left-anti join child→parent (parent side
                                broadcast when small)
- domain constraints          → pure scan filters (pushed to parquet)
- parse validity              → cast-to-null counting (no UDF)

All checks against the same table share its scan; the final union is a
handful of single-row frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load


def _count_row(spark_df: DataFrame, name: str) -> DataFrame:
    return spark_df.agg(
        F.lit(name).alias("check"), F.count("*").cast("long").alias("violations")
    )


def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the whole check suite; returns (check, violations) sorted by name."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    e = load(spark, sf_dir, "events")
    d = load(spark, sf_dir, "documents")

    dup_cust = (
        c.groupBy("c_custkey").agg(F.count("*").alias("n")).where(F.col("n") > 1)
    )
    orphan_orders = o.join(
        F.broadcast(c.select("c_custkey")),
        o.o_custkey == c.c_custkey,
        "left_anti",
    )
    orphan_lines = l.join(
        o.select("o_orderkey"), l.l_orderkey == o.o_orderkey, "left_anti"
    )
    neg_price = l.where(F.col("l_extendedprice") <= 0)
    disc_range = l.where((F.col("l_discount") < 0) | (F.col("l_discount") > 1))
    bad_qty = e.where(
        F.get_json_object("props", "$.k").cast("double").isNull()
    )
    empty_docs = d.where(F.length("text") == 0)

    checks = [
        _count_row(dup_cust, "customer_duplicate_pk"),
        _count_row(orphan_orders, "orders_orphan_custkey"),
        _count_row(orphan_lines, "lineitem_orphan_orderkey"),
        _count_row(neg_price, "lineitem_nonpositive_price"),
        _count_row(disc_range, "lineitem_discount_out_of_range"),
        _count_row(bad_qty, "events_unparseable_qty"),
        _count_row(empty_docs, "documents_empty_text"),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionAll(chk)
    return out


_STATS_TABLE = "orders"
_STATS_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)
_STATS_MINMAX = ("o_orderkey", "o_custkey")  # integer cols: engine-safe min/max


def dq_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE analog: per-column row count, null count, exact
    distinct count, and (for integer columns) min/max — the statistics a
    cost-based optimizer and a data-quality dashboard both consume.

    One aggregation pass; the multiple COUNT(DISTINCT) rewrite to an
    Expand multiplies scan rows by the distinct-agg count, which is the
    exact-ndv price — at 100 TB swap ``countDistinct`` for
    ``approx_count_distinct`` (HLL, one pass, no Expand) and keep the
    same output shape; exact here so the DuckDB oracle value-checks it.
    min/max are emitted for integer columns only: float and timestamp
    string-casts format differently across engines, and the optimizer
    stats consumer wants typed bounds anyway.
    """
    o = load(spark, sf_dir, _STATS_TABLE)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in _STATS_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
        aggs.append(F.countDistinct(c).alias(f"ndv_{c}"))
    for c in _STATS_MINMAX:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    wide = o.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"nulls_{c}").alias("n_nulls"),
                F.col(f"ndv_{c}").alias("ndv"),
                (
                    F.col(f"min_{c}")
                    if c in _STATS_MINMAX
                    else F.lit(None).cast("long")
                ).alias("min_long"),
                (
                    F.col(f"max_{c}")
                    if c in _STATS_MINMAX
                    else F.lit(None).cast("long")
                ).alias("max_long"),
            )
            for c in _STATS_COLS
        ]
    )
    return wide.select(F.inline(entries)).orderBy("column")


def _table_stats_oracle() -> str:
    nulls = ", ".join(
        f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS nulls_{c}, count(DISTINCT {c}) AS ndv_{c}"
        for c in _STATS_COLS
    )
    minmax = ", ".join(
        f"min({c}) AS min_{c}, max({c}) AS max_{c}" for c in _STATS_MINMAX
    )
    rows = " UNION ALL ".join(
        f"SELECT '{c}' AS \"column\", n_rows, nulls_{c} AS n_nulls, ndv_{c} AS ndv, "
        + (
            f"min_{c} AS min_long, max_{c} AS max_long"
            if c in _STATS_MINMAX
            else "CAST(NULL AS BIGINT) AS min_long, CAST(NULL AS BIGINT) AS max_long"
        )
        + " FROM s"
        for c in _STATS_COLS
    )
    return f"""
        WITH s AS (
          SELECT count(*) AS n_rows, {nulls}, {minmax} FROM {_STATS_TABLE}
        )
        SELECT * FROM ({rows}) t ORDER BY "column"
    """


QUERIES = {"dq_checks": dq_checks, "dq_table_stats": dq_table_stats}

ORACLES = {
    "dq_checks": """
        WITH results AS (
          SELECT 'customer_duplicate_pk' AS check, count(*) AS violations
          FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING count(*) > 1) t
          UNION ALL
          SELECT 'orders_orphan_custkey', count(*)
          FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
          UNION ALL
          SELECT 'lineitem_orphan_orderkey', count(*)
          FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
          UNION ALL
          SELECT 'lineitem_nonpositive_price', count(*)
          FROM lineitem WHERE l_extendedprice <= 0
          UNION ALL
          SELECT 'lineitem_discount_out_of_range', count(*)
          FROM lineitem WHERE l_discount < 0 OR l_discount > 1
          UNION ALL
          SELECT 'events_unparseable_qty', count(*)
          FROM events
          WHERE TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) IS NULL
          UNION ALL
          SELECT 'documents_empty_text', count(*)
          FROM documents WHERE length(text) = 0
        )
        SELECT "check", violations FROM results ORDER BY "check"
    """,
}

ORACLES["dq_table_stats"] = _table_stats_oracle()
