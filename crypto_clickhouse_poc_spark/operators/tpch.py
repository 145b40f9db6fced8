"""Join / aggregation / semi-join query surface (TPC-H-style).

The reference contains no joins (survey §2.3) — its engine (ClickHouse) has
them; ours gets them from Catalyst. These queries exercise the join surface a
user of the reference's engine would expect, on the driver's star schema:
broadcast-hash joins for dims, shuffled joins for facts, semi-joins
(EXISTS), multi-way join reordering, and the standard TPC-H aggregate shapes.

Scale notes (100 TB):
- dims (region/nation/customer/supplier/part) are explicitly ``broadcast()``
  — no shuffle of the fact side for dim enrichment; at real scale customer
  may exceed the threshold, at which point AQE's shuffled-hash/skew handling
  takes over (the hint degrades gracefully to a regular join).
- fact-fact joins (orders ⋈ lineitem) shuffle on the join key — both sides
  hash-partitioned on orderkey; in a managed deployment these tables are
  bucketed on orderkey (plans.layout) so this becomes a zero-shuffle
  sort-merge join.
- every query filters dates first → parquet row-group pruning before joins.

Float determinism vs the DuckDB oracle: aggregate sums are rounded (2 dp for
money sums, 6 dp for averages) in both systems so partial-aggregation order
cannot flip the value-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape): wide multi-aggregate GROUP BY.

    One hash-aggregate pass (partial+final); the scan reads only the 7
    referenced columns (Catalyst column pruning).
    """
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority (TPC-H Q3 shape): dim-filtered 3-way join + top-K.

    customer is broadcast (small dim side after the segment filter); orders ⋈
    lineitem shuffles on orderkey. Top-K via TakeOrderedAndProject.
    """
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): 6-way join incl. the
    c_nationkey = s_nationkey locality condition; all dims broadcast."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change (TPC-H Q6 shape): pure filter + global sum.

    All three predicates push to the parquet scan (PushedFilters); no shuffle
    at all — partial sums combine at the driver-side final aggregate.
    """
    l = load(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): EXISTS → left-semi join.

    The semi-join needs only key matching — Spark's LeftSemi avoids
    materializing lineitem columns; dedup of the probe side is implicit.
    """
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    matched = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): revenue lost to returns per customer."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function surface: each customer's single largest order.

    row_number over (custkey / totalprice desc) — one shuffle on custkey;
    at scale this is the standard argmax pattern (no self-join).
    """
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
    )


def nation_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-enrichment rollup: order count + value by region/nation (broadcast chain)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
        .orderBy("r_name", "n_name")
    )


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-shipment priority split (TPC-H Q12 shape, adapted: fixture has no
    shipmode/receiptdate — "late" = shipped >30 days after order date).

    orders ⋈ lineitem shuffles on orderkey; the CASE-conditional counts are
    map-side partial aggregates.
    """
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(late)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share (TPC-H Q14 shape): conditional-sum ratio.

    part is broadcast; the whole query is one broadcast join + one global
    aggregate — no shuffle of lineitem at all.
    """
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100 * F.sum(promo) / F.sum(rev), 6).alias("promo_revenue_pct")
        )
    )


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): HAVING-filtered aggregate
    driving a semi-join back into the fact tables.

    The qualifying-orderkey set (groupBy + having) is tiny → broadcast
    left-semi join prunes lineitem/orders before the final aggregate.
    """
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        l.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19 shape): disjunction of conjunctive
    brand/size/quantity predicates across the join.

    part is broadcast; the OR-of-ANDs stays a post-join filter (its p_ and
    l_ legs each push down to their own scans where splittable).
    """
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    c1 = (
        (F.col("p_brand") == "Brand#11")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    c2 = (
        (F.col("p_brand") == "Brand#22")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    c3 = (
        (F.col("p_brand") == "Brand#15")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 30))
    )
    return j.where(c1 | c2 | c3).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations (TPC-H Q7 shape): supplier nation
    × customer nation pair revenue by year.

    Two independent dim chains (supplier→nation, orders→customer→nation)
    enrich lineitem via broadcasts; the only fact shuffle is
    lineitem ⋈ orders on orderkey. The symmetric nation-pair predicate is a
    post-join filter on broadcast columns.
    """
    na, nb = "NATION_1", "NATION_2"
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = ((F.col("supp_nation") == na) & (F.col("cust_nation") == nb)) | (
        (F.col("supp_nation") == nb) & (F.col("cust_nation") == na)
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 shape): customers with
    above-average balance and no orders since 1998 — scalar subquery +
    anti-join (lapsed high-value customers).

    The scalar average is a broadcast single-row cross join (never a
    driver-side collect); the NOT EXISTS is a left-anti join on custkey,
    which needs only the orders key column after the date pushdown.
    """
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DERIVED ``partsupp`` (r16 — closes the env gap that blocked TPC-H
    q2/q9/q11/q16/q20: the fixture ships no partsupp parquet): each part
    gets 4 suppliers by dbgen's assignment formula adapted to the
    fixture's 0-based keys, with deterministic integer availqty and an
    integer-CENTS supplycost so threshold comparisons (q11/q20) are
    EXACT in both engines — the double ``ps_supplycost`` is
    cents/100.0, bit-identical in Spark and DuckDB. The oracle mirrors
    this derivation as a CTE (``_PS_SQL``), so the five queries carry
    full value-hash parity despite the missing fixture.

    Scale shape: |part| × 4 rows from one part scan cross-joined with a
    broadcast 4-row range — O(part), zero shuffles; at warehouse scale
    partsupp is ~4× the part dim and stays broadcastable where part is.
    The frame is bounded_cache'd per sf_dir (five queries share it) and
    the supplier-count scalar is memoized so repeat invocations fire no
    plan-build Spark job (r16 review).
    """
    from ..caching import bounded_cache

    s_count = _S_COUNT.get(sf_dir)
    if s_count is None:
        s_count = load(spark, sf_dir, "supplier").count()  # bounded dim scalar
        _S_COUNT[sf_dir] = s_count
    p = load(spark, sf_dir, "part").select("p_partkey")
    step = F.lit(s_count // 4) + F.expr(f"p_partkey div {s_count}")
    # r17: the 4-supplier fan-out is an IN-ROW array (array_distinct +
    # explode), not a crossJoin + DISTINCT — a duplicate (partkey,
    # suppkey) pair can only arise WITHIN one part's 4 assignments
    # (cross-part rows differ in ps_partkey by construction), so the
    # per-row dedup is exactly the old global distinct minus its full
    # shuffle. Removes one Exchange from all five derived-partsupp
    # queries (q2/q9/q11/q16/q20); the oracle's SELECT DISTINCT is
    # unchanged — same row set either way.
    supps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.lit(3)),
            # one-param lambda: a 2-arg transform lambda would be
            # (element, index) and silently change the formula
            lambda i: (F.col("p_partkey") + i.cast("bigint") * step)
            % s_count,
        )
    )
    derived = (
        p.select(
            F.col("p_partkey").alias("ps_partkey"),
            F.explode(supps).alias("ps_suppkey"),
        )
        .select(
            "ps_partkey",
            "ps_suppkey",
            ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 3) % 9999 + 1)
            .alias("ps_availqty"),
            ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 10000
             + 100).alias("ps_costcents"),
        )
        .withColumn(
            "ps_supplycost", F.col("ps_costcents").cast("double") / 100.0
        )
    )
    return bounded_cache(f"tpch_partsupp:{sf_dir}", derived)


_S_COUNT: dict[str, int] = {}


# the oracle's mirror of _partsupp — prefixed to each of the five
# queries' SQL as `WITH {_PS_SQL} ...`
_PS_SQL = """
ps0 AS (
  SELECT DISTINCT
    p_partkey AS ps_partkey,
    (p_partkey + t.i * ((SELECT count(*) FROM supplier) // 4
        + p_partkey // (SELECT count(*) FROM supplier)))
      % (SELECT count(*) FROM supplier) AS ps_suppkey
  FROM part, range(4) t(i)
),
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         (ps_partkey * 7 + ps_suppkey * 3) % 9999 + 1 AS ps_availqty,
         (ps_partkey * 31 + ps_suppkey * 17) % 10000 + 100 AS ps_costcents,
         CAST((ps_partkey * 31 + ps_suppkey * 17) % 10000 + 100 AS DOUBLE)
           / 100.0 AS ps_supplycost
  FROM ps0
)
"""


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape): region-scoped partsupp,
    correlated per-part MIN decorrelated to a groupBy + equality re-join
    (Catalyst's own decorrelation plan). All four dims broadcast; the
    min-cost equality compares the exact INTEGER cents column, so
    float rendering can never flip a row. Adapted filters: ``p_type``
    is a plain category here (equality, not LIKE '%BRASS')."""
    ps = _partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    from ..caching import bounded_cache

    # referenced twice below (candidates + per-part mins): one cache, so
    # the partsupp derivation and the three dim joins run once (r16
    # review — the uncached lineage executed twice)
    eur = bounded_cache(
        f"tpch_q2_eur:{sf_dir}",
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_costcents", "ps_supplycost",
                "s_acctbal", "s_name", "n_name"),
    )
    p = load(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
    )
    cand = eur.join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
    mins = eur.groupBy(F.col("ps_partkey").alias("m_partkey")).agg(
        F.min("ps_costcents").alias("min_cents")
    )
    return (
        cand.join(
            # |part|-bounded aggregate: broadcast keeps the candidate
            # side shuffle-free (was a sort-merge join)
            F.broadcast(mins),
            (F.col("ps_partkey") == F.col("m_partkey"))
            & (F.col("ps_costcents") == F.col("min_cents")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.round("ps_supplycost", 2).alias("ps_supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape): the 6-way join — profit =
    revenue − supply cost — grouped by nation and order year.

    partsupp is derived O(4×|part|) and broadcast with part/supplier/
    nation; orders ⋈ lineitem is the one fact-fact shuffle (orderkey);
    the final (nation, year) groupBy is map-side combined."""
    l = load(spark, sf_dir, "lineitem")
    ps = _partsupp(spark, sf_dir)
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(ps),
            (F.col("l_suppkey") == F.col("ps_suppkey"))
            & (F.col("l_partkey") == F.col("ps_partkey")),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock (TPC-H Q11 shape): per-part inventory value vs a
    fraction of the nation's total — the group-filter-by-global-scalar
    plan. Both the per-part value and the total accumulate the INTEGER
    cents column, and the threshold test is ``cents × 10000 > total``
    in pure integer arithmetic — exact in both engines regardless of
    summation order (the one place a float HAVING could flip a
    boundary row)."""
    ps = _partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    scoped = (
        ps.join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_costcents") * F.col("ps_availqty")).alias("v"),
        )
    )
    total = scoped.agg(F.sum("v").alias("total"))
    return (
        scoped.groupBy("ps_partkey")
        .agg(F.sum("v").alias("cents"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cents") * 10000 > F.col("total"))
        .select(
            "ps_partkey",
            F.round(F.col("cents").cast("double") / 100.0, 2).alias("value"),
        )
    )


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape): distinct-supplier
    counts per (brand, type, size) with a NOT-IN supplier exclusion —
    the count-distinct + broadcast anti-join plan. Adapted: the
    "customer complaints" exclusion keys on ``s_acctbal < 100`` (the
    fixture ships no s_comment)."""
    ps = _partsupp(spark, sf_dir)
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 49)
    )
    bad = load(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 100.0
    ).select("s_suppkey")
    return (
        ps.join(
            F.broadcast(bad),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (TPC-H Q20 shape): suppliers whose
    stock exceeds half a year's shipments of a part family — nested
    semi-joins with a correlated aggregate threshold, decorrelated to
    one (partkey, suppkey) aggregation + INNER join (matching SQL's
    NULL-excluding correlated comparison: a pair with no shipments has
    a NULL threshold and never qualifies). The threshold is exact:
    l_quantity is integral, so 0.5×sum is dyadic and the comparison
    with the integer availqty cannot wobble with summation order."""
    parts = load(spark, sf_dir, "part").where(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    shipped = (
        load(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg((0.5 * F.sum("l_quantity")).alias("half_qty"))
    )
    ps = _partsupp(spark, sf_dir).join(
        F.broadcast(parts.withColumnRenamed("p_partkey", "pp_partkey")),
        F.col("ps_partkey") == F.col("pp_partkey"),
        "left_semi",
    )
    qualified = (
        ps.join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .where(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(qualified),
            F.col("s_suppkey") == F.col("ps_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
    )


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): rows below 20% of
    their part's average quantity.

    The correlated per-part aggregate becomes an explicit groupBy + re-join
    (what Catalyst's decorrelation produces anyway); the per-part threshold
    table is small → broadcast, so lineitem is scanned once and never
    shuffled.
    """
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#11")
    thresh = (
        l.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((0.2 * F.avg("l_quantity")).alias("qty_thresh"))
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(thresh), F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): suppliers whose quarterly revenue
    equals the maximum — the aggregate-view + scalar-max self-comparison.

    The revenue view is computed once (one shuffle on suppkey); the scalar
    max and the supplier dim both broadcast against it. Revenue is rounded
    before the equality comparison in both engines so float summation order
    can't break the max-match.
    """
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape, adapted: "late" =
    shipped > 60 days after the order date; the fixture has no commit/
    receipt dates). A supplier is counted per order where it shipped late,
    at least one OTHER supplier shipped in the same order (EXISTS → left
    semi), and NO other supplier shipped late in it (NOT EXISTS → left
    anti).

    All three legs reuse one lineitem ⋈ orders pass for the lateness flag;
    the semi and anti joins run on (orderkey) with the supplier-inequality
    as a join-condition filter — never a fact-side shuffle beyond the
    orderkey partitioning they share.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        )
        .select("l_orderkey", "l_suppkey", "late")
    )
    l1 = l.where(F.col("late")).select("l_orderkey", "l_suppkey").distinct()
    others = l.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = l.where(F.col("late")).select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    cand = l1.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    s = load(spark, sf_dir, "supplier")
    return (
        cand.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): one nation's share of a
    region's revenue for one part type, by order year.

    The only fact-fact shuffle is lineitem ⋈ orders on orderkey — part
    (pre-filtered to one p_type, so it prunes lineitem early), supplier,
    customer, both nation roles, and region are all broadcast dims. The
    share itself is a conditional-sum ratio inside ONE hash aggregate on
    year; no second pass over the joined fact.
    """
    l = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n_cust = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n_supp = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("s_nk"))
        .withColumn("volume", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", F.col("volume"))
                    .otherwise(0.0)
                )
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): how many
    customers placed 0, 1, 2, … qualifying orders. (The fixture's orders
    table has no o_comment, so the classic not-like comment filter becomes
    a priority-class exclusion — same join/agg anatomy.)

    The orders filter lives in the JOIN condition, not a WHERE above it —
    a post-join WHERE would turn the LEFT OUTER inner and silently drop
    the 0-orders bucket. Shuffle story: one exchange on custkey shared by
    the join AND the per-customer count (same hash partitioning); the
    distribution re-agg runs over a tiny count-valued intermediate.
    """
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def region_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate: order count/value by (region, nation) with subtotal
    and grand-total rows — Spark's ``rollup`` ≡ ANSI GROUP BY ROLLUP.

    Same shuffle as the plain groupBy; the rollup levels are computed in the
    same hash-aggregate via grouping-set expansion.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
    )


QUERIES = {
    "tpch_q2": tpch_q2,
    "tpch_q9": tpch_q9,
    "tpch_q11": tpch_q11,
    "tpch_q16": tpch_q16,
    "tpch_q20": tpch_q20,
    "tpch_q1": tpch_q1,
    "tpch_q3": tpch_q3,
    "tpch_q4": tpch_q4,
    "tpch_q5": tpch_q5,
    "tpch_q6": tpch_q6,
    "tpch_q10": tpch_q10,
    "tpch_q7": tpch_q7,
    "tpch_q12": tpch_q12,
    "tpch_q14": tpch_q14,
    "tpch_q22": tpch_q22,
    "tpch_q15": tpch_q15,
    "tpch_q17": tpch_q17,
    "tpch_q18": tpch_q18,
    "tpch_q19": tpch_q19,
    "tpch_q21": tpch_q21,
    "tpch_q8": tpch_q8,
    "tpch_q13": tpch_q13,
    "top_order_per_customer": top_order_per_customer,
    "nation_order_rollup": nation_order_rollup,
    "region_nation_rollup": region_nation_rollup,
}

ORACLES = {
    # the five previously-blocked shapes run against the SAME derived
    # partsupp (the _PS_SQL CTE mirrors _partsupp exactly)
    "tpch_q2": f"""
        WITH {_PS_SQL},
        eur AS (
          SELECT ps_partkey, ps_suppkey, ps_costcents, ps_supplycost,
                 s_acctbal, s_name, n_name
          FROM partsupp, supplier, nation, region
          WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
            AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
               round(ps_supplycost, 2) AS ps_supplycost
        FROM part, eur
        WHERE p_partkey = ps_partkey AND p_size = 15 AND p_type = 'PROMO'
          AND ps_costcents = (SELECT min(e2.ps_costcents) FROM eur e2
                              WHERE e2.ps_partkey = p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
    "tpch_q9": f"""
        WITH {_PS_SQL}
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - ps_supplycost * l_quantity), 2) AS sum_profit
        FROM lineitem, partsupp, part, supplier, orders, nation
        WHERE ps_suppkey = l_suppkey AND ps_partkey = l_partkey
          AND p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%'
        GROUP BY n_name, year(o_orderdate) ORDER BY nation, o_year DESC
    """,
    "tpch_q11": f"""
        WITH {_PS_SQL},
        scoped AS (
          SELECT ps_partkey, ps_costcents * ps_availqty AS v
          FROM partsupp, supplier, nation
          WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
            AND n_name = 'NATION_7')
        SELECT ps_partkey, round(CAST(cents AS DOUBLE) / 100.0, 2) AS value
        FROM (SELECT ps_partkey, sum(v) AS cents FROM scoped
              GROUP BY ps_partkey)
        WHERE cents * 10000 > (SELECT sum(v) FROM scoped)
        ORDER BY value DESC, ps_partkey
    """,
    "tpch_q16": f"""
        WITH {_PS_SQL}
        SELECT p_brand, p_type, p_size,
               count(DISTINCT ps_suppkey) AS supplier_cnt
        FROM partsupp, part
        WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#1'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 7, 10, 15, 23, 45, 49)
          AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 100.0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "tpch_q20": f"""
        WITH {_PS_SQL}
        SELECT s_name, s_acctbal
        FROM supplier, nation
        WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
          AND s_suppkey IN (
            SELECT ps_suppkey FROM partsupp
            WHERE ps_partkey IN (SELECT p_partkey FROM part
                                 WHERE p_name LIKE 'small%')
              AND ps_availqty > (
                SELECT 0.5 * sum(l_quantity) FROM lineitem
                WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'))
        ORDER BY s_name
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "tpch_q3": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "tpch_q4": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "tpch_q5": """
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC
    """,
    "tpch_q6": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "tpch_q10": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "tpch_q7": """
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 2) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 year(l_shipdate) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier, lineitem, orders, customer, nation n1, nation n2
          WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
            AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
            AND c_nationkey = n2.n_nationkey
            AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "tpch_q22": """
        SELECT c_mktsegment, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1998-01-01')
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "tpch_q12": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem, orders
        WHERE l_orderkey = o_orderkey
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "tpch_q14": """
        SELECT round(100 * sum(CASE WHEN p_type = 'PROMO'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    "tpch_q15": """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    "tpch_q17": """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND p_brand = 'Brand#11'
          AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    "tpch_q18": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(sum(l_quantity), 2) AS total_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    "tpch_q19": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND ((p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20 AND 30))
    """,
    "tpch_q21": """
        WITH l AS (
          SELECT l_orderkey, l_suppkey,
                 l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        l1 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM l WHERE late)
        SELECT s_name, count(*) AS numwait
        FROM l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE EXISTS (SELECT 1 FROM l o2 WHERE o2.l_orderkey = l1.l_orderkey
                        AND o2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM l o3 WHERE o3.l_orderkey = l1.l_orderkey
                            AND o3.l_suppkey <> l1.l_suppkey AND o3.late)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "tpch_q8": """
        SELECT o_year,
               round(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume
                              ELSE 0.0 END) / sum(volume), 6) AS mkt_share
        FROM (
          SELECT year(o_orderdate) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS supp_nation
          FROM part, supplier, lineitem, orders, customer,
               nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01'
            AND p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year ORDER BY o_year
    """,
    "tpch_q13": """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "region_nation_rollup": """
        SELECT r_name, n_name, count(*) AS order_count,
               round(sum(o_totalprice), 2) AS total_value
        FROM orders, customer, nation, region
        WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
    "top_order_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        ) t WHERE rn = 1
    """,
    "nation_order_rollup": """
        SELECT r_name, n_name, count(*) AS order_count,
               round(sum(o_totalprice), 2) AS total_value
        FROM orders, customer, nation, region
        WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name
    """,
}
