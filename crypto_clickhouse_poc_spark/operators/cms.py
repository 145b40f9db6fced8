"""Count-Min sketch token frequencies (Cormode & Muthukrishnan 2005).

The mergeable POINT-FREQUENCY complement to the repo's other sketch
seats: Misra-Gries (``freq.py``) keeps the top-N heavy hitters but
forgets everything else; CMS answers "how often did THIS token occur"
for any token with a one-sided error bound (estimate >= truth always;
overcount <= eps * N with probability 1 - delta at D rows x W buckets).
The standard pipeline uses: per-shard CMS partials, element-wise sum to
merge (cells of independent shards add exactly), point queries at read
time — vocabulary-size state replaced by a constant D x W grid.

Dataflow shapes (all JVM built-ins, no UDFs):

- ``_cms_cells``: explode tokens -> D (row, bucket) pairs per token ->
  ONE hash aggregation. Map-side combine caps shuffle volume at
  D x W rows per partition regardless of corpus size — the sketch's
  constant-state property expressed as a Spark plan.
- ``corpus_cms_freq``: the exact top-20 tokens (the ``corpus_top_tokens``
  dataflow) probed against the sketch — estimate = min over the D cells
  each token hashes to, via a broadcast join on the tiny (<= D x W)
  cell grid. Integer-exact and deterministic (md5 bucket hashing shared
  with the oracle), so the WHOLE sketch is DuckDB-oracle-checked —
  unlike the HLL family (different engine registers), CMS's arithmetic
  is reproducible bit-for-bit across engines.

Reference parity anchor: the reference has no sketch surface
(ClickHouse's topK/uniq are hosted-engine built-ins, survey §2.9); this
is §8.2 extension territory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load, scan_parallel

CMS_D = 4  # independent hash rows
CMS_W = 256  # buckets per row (eps = e / W ~ 1.1%)


def _bucket(d: int, token: Column) -> Column:
    """Row-d bucket of a token: first 48 md5 bits of "d|token" mod W —
    deterministic and mirrored verbatim by the DuckDB oracle."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{d}|"), token)), 1, 12), 16, 10
        ).cast("long")
        % CMS_W
    )


def _fanout(token: Column) -> Column:
    """The D-row grid fan-out of one token — an explodable array of
    (d, bucket) structs. ONE definition shared by the batch cells, the
    probe, and the streaming seat, so the grid arithmetic can never
    desynchronize between them."""
    return F.array(
        *[
            F.struct(F.lit(d).alias("d"), _bucket(d, token).alias("bucket"))
            for d in range(CMS_D)
        ]
    )


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scan_parallel (r17, guide §2.5): a single-file corpus reads as ONE
    # scan partition, serializing the 4×md5 grid fan-out downstream — the
    # 10×-data core-scaling probe measured corpus_cms_freq FLAT at 8 vs 32
    # cores (7.98 vs 8.01 s) because of exactly this. No-op on a parallel
    # (production multi-file) scan.
    d = scan_parallel(
        load(spark, sf_dir, "documents").where(F.col("text").isNotNull()),
        spark,
    )
    return d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))


def _cms_cells(toks: DataFrame) -> DataFrame:
    """The sketch: (d, bucket, cnt) cells. One hash aggregation whose
    partial (map-side) combine bounds shuffle rows at D x W per
    partition — corpus size never reaches the exchange."""
    pair = F.explode(_fanout(F.col("token")))
    return (
        toks.select(pair.alias("p"))
        .select("p.d", "p.bucket")
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_point_estimates(cells: DataFrame, probes: DataFrame) -> DataFrame:
    """Point-query tokens (column ``token`` + any ride-along columns)
    against a cell grid: min over the D cells each token hashes to.
    The grid is broadcast (<= D x W rows by construction)."""
    ride = [c for c in probes.columns if c != "token"]
    fanned = probes.select(
        "token", *ride, F.explode(_fanout(F.col("token"))).alias("p")
    ).select("token", *ride, "p.d", "p.bucket")
    return (
        fanned.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("token", *ride)
        .agg(F.min("cnt").alias("cms_est"))
    )


def corpus_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 token frequencies probed against the CMS: per token
    the true count, the sketch estimate, and the (always >= 0)
    overcount. Two aggregations over one token explode + a broadcast
    probe join — nothing in the plan grows with vocabulary."""
    toks = _tokens(spark, sf_dir)
    top = (
        toks.groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(20)
    )
    est = cms_point_estimates(_cms_cells(toks), top)
    return est.select(
        "token",
        "freq",
        "cms_est",
        (F.col("cms_est") - F.col("freq")).alias("overcount"),
    )


QUERIES = {"corpus_cms_freq": corpus_cms_freq}

_CELLS_SQL = f"""
        toks AS (
          SELECT unnest(string_split(text, ' ')) AS token
          FROM documents WHERE text IS NOT NULL
        ),
        ds AS (SELECT unnest(range({CMS_D})) AS d),
        cells AS (
          SELECT d,
                 CAST(concat('0x', substring(md5(concat(d, '|', token)), 1, 12))
                      AS BIGINT) % {CMS_W} AS bucket,
                 count(*) AS cnt
          FROM toks, ds GROUP BY 1, 2
        )
"""

ORACLES = {
    "corpus_cms_freq": f"""
        WITH {_CELLS_SQL},
        top AS (
          SELECT token, count(*) AS freq FROM toks
          GROUP BY token ORDER BY freq DESC, token LIMIT 20
        ),
        est AS (
          SELECT t.token, t.freq, min(c.cnt) AS cms_est
          FROM top t
          CROSS JOIN ds
          JOIN cells c
            ON c.d = ds.d
           AND c.bucket = CAST(concat('0x',
                 substring(md5(concat(ds.d, '|', t.token)), 1, 12))
                 AS BIGINT) % {CMS_W}
          GROUP BY 1, 2
        )
        SELECT token, freq, cms_est, cms_est - freq AS overcount
        FROM est ORDER BY freq DESC, token
    """,
}
