"""SQL-entry-point queries: one ANSI text, two engines.

Everything else in the surface is the DataFrame API; these run through
``spark.sql`` over registered views (survey S8/P8 — the reference's only
query interface is SQL strings) with the SAME string serving as the DuckDB
oracle — the strongest possible dialect-parity statement, and it exercises
Catalyst's SQL front door: FILTER-clause aggregates (pivot shape) and a
correlated scalar subquery (decorrelated by Catalyst into an aggregate +
join — no per-row re-execution, which is what makes it viable at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import register_views

_PIVOT_SQL = """
    SELECT hour(ts) AS hr,
           count(*) FILTER (WHERE event_type = 'click') AS clicks,
           count(*) FILTER (WHERE event_type = 'view') AS views,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
           count(*) AS total
    FROM events GROUP BY hour(ts)
"""

_CORR_SQL = """
    SELECT o.o_custkey, count(*) AS n_big
    FROM orders o
    WHERE o.o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
                            FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    GROUP BY o.o_custkey
    ORDER BY n_big DESC, o_custkey
    LIMIT 20
"""


def sql_hourly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × event-type contingency via FILTER-clause aggregates
    (the portable pivot): one hash-aggregate, conditional counts map-side."""
    register_views(spark, sf_dir)
    return spark.sql(_PIVOT_SQL)


def sql_corr_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders > 1.5× their customer's average order value (correlated scalar
    subquery). Catalyst decorrelates to per-custkey aggregate + equi-join."""
    register_views(spark, sf_dir)
    return spark.sql(_CORR_SQL)


QUERIES = {
    "sql_hourly_pivot": sql_hourly_pivot,
    "sql_corr_subquery": sql_corr_subquery,
}

ORACLES = {
    "sql_hourly_pivot": _PIVOT_SQL,
    "sql_corr_subquery": _CORR_SQL,
}
