"""Temporal join operators Spark lacks as built-ins: as-of join, range join.

Both are implemented as *compositions of built-in operators* chosen for their
scale shape (SURVEY.md §7 M5; the reference engine family — kdb/ClickHouse/
QuestDB — exposes these natively for exactly the crypto-trades workload the
reference repo targets):

- **as-of join** (``asof_last_click_price``): for each left event, the most
  recent right event at-or-before it, per key. The naive formulation is a
  range self-join (quadratic blowup, non-equi condition Spark executes as
  BNL). The scale-correct plan used here is the *union-tag sweep*: union
  both sides with a tag, one window sort per key, carry the right side's
  last-seen value forward with ``last(..., ignorenulls=True)``. Cost: ONE
  shuffle on the key + a per-partition sort — same as any windowed agg, no
  pair explosion, skew bounded by per-key row counts.

- **bounded range join** (``range_click_activity``): count right events
  inside a sliding window [ts - W, ts] anchored at each left event. Scale
  plan: time-bucket blocking — the left side explodes to the (few) buckets
  its window spans, the right side maps to its one bucket, equi-join on
  (key, bucket) + exact range filter. Shuffle is equi-partitioned; pair
  enumeration is bounded per bucket instead of per key-history.

Determinism: right-side candidates are first reduced to one row per
(key, ts) — latest event_id wins — so as-of tie-breaking is well-defined in
both engines (DuckDB ASOF JOIN's choice among equal timestamps is otherwise
unspecified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .trades import _events

RANGE_WINDOW = "1 HOUR"
_BUCKET_SEC = 3600


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Left = purchase events; right = click events deduped to one row per
    (user_id, ts) keeping the latest event_id (deterministic as-of target)."""
    e = _events(spark, sf_dir)
    left = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "price"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    right = (
        e.where(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "ts", F.col("price").alias("click_price"))
    )
    return left, right


def asof_last_click_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase annotated with the user's most recent click
    price at-or-before the purchase time (NULL if no prior click).

    Union-tag sweep: right rows sort before left rows at equal ts
    (tag 0 < 1), so an equal-timestamp click is visible to the purchase —
    the ``<=`` as-of semantics DuckDB's ASOF JOIN uses.
    """
    left, right = _sides(spark, sf_dir)
    tagged = right.select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("price"),
        "click_price",
        F.col("ts").alias("click_ts"),
    ).unionByName(
        left.select(
            "user_id",
            "ts",
            F.lit(1).alias("tag"),
            "event_id",
            "price",
            F.lit(None).cast("double").alias("click_price"),
            F.lit(None).cast("timestamp").alias("click_ts"),
        )
    )
    sweep = Window.partitionBy("user_id").orderBy("ts", "tag", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        tagged.withColumn("last_click_price", F.last("click_price", ignorenulls=True).over(sweep))
        .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(sweep))
        .where(F.col("tag") == 1)
        .select(
            "user_id",
            "ts",
            "event_id",
            "price",
            "last_click_price",
            "last_click_ts",
        )
    )


def range_click_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join: per purchase, the user's click count and max click
    price within the preceding hour (inclusive both ends).

    Bucket blocking: a 1-hour window spans ≤ 2 hour-buckets, so the left
    side fans out ×2, the right side not at all, and the join is a plain
    equi-join on (user_id, bucket) — shuffle-partitioned, no BNL. The exact
    [ts-1h, ts] predicate filters inside the joined partitions.
    """
    left, right = _sides(spark, sf_dir)
    lo = F.col("ts") - F.expr(f"INTERVAL {RANGE_WINDOW}")
    lb = left.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(lo) / _BUCKET_SEC),
                F.floor(F.unix_timestamp("ts") / _BUCKET_SEC),
            )
        ),
    )
    rb = right.select(
        "user_id",
        F.col("ts").alias("click_ts"),
        "click_price",
        F.floor(F.unix_timestamp("ts") / _BUCKET_SEC).alias("bucket"),
    )
    joined = lb.join(rb, ["user_id", "bucket"]).where(
        (F.col("click_ts") >= F.col("ts") - F.expr(f"INTERVAL {RANGE_WINDOW}"))
        & (F.col("click_ts") <= F.col("ts"))
    )
    counts = joined.groupBy("user_id", "ts", "event_id").agg(
        F.count("*").alias("n_clicks_1h"),
        F.max("click_price").alias("max_click_price"),
    )
    # left join back so zero-activity purchases appear with count 0
    return (
        left.join(counts, ["user_id", "ts", "event_id"], "left")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.coalesce("n_clicks_1h", F.lit(0)).alias("n_clicks_1h"),
            "max_click_price",
        )
    )


QUERIES = {
    "asof_last_click_price": asof_last_click_price,
    "range_click_activity": range_click_activity,
}

_EV = (
    "SELECT *, value AS price, CAST(json_extract_string(props, '$.k') AS DOUBLE) AS qty "
    "FROM events"
)

_SIDES_CTE = f"""
left_e AS (
  SELECT user_id, ts, event_id, price FROM ({_EV}) e WHERE event_type = 'purchase'
),
right_e AS (
  SELECT user_id, ts, price AS click_price
  FROM (
    SELECT user_id, ts, price,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM ({_EV}) e WHERE event_type = 'click'
  ) t WHERE rn = 1
)
"""

ORACLES = {
    "asof_last_click_price": f"""
        WITH {_SIDES_CTE}
        SELECT l.user_id, l.ts, l.event_id, l.price,
               r.click_price AS last_click_price, r.ts AS last_click_ts
        FROM left_e l
        ASOF LEFT JOIN right_e r
          ON l.user_id = r.user_id AND r.ts <= l.ts
    """,
    "range_click_activity": f"""
        WITH {_SIDES_CTE}
        SELECT l.user_id, l.ts, l.event_id,
               count(r.click_price) AS n_clicks_1h,
               max(r.click_price) AS max_click_price
        FROM left_e l
        LEFT JOIN right_e r
          ON l.user_id = r.user_id
         AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts
        GROUP BY l.user_id, l.ts, l.event_id
    """,
}
