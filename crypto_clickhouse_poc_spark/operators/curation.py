"""Training-corpus curation gates a large-scale pipeline runs between
cleaning and assembly: benchmark decontamination, repetition-based
quality rules, and PII pattern scanning.

All three follow the repo's scale doctrine:

- **Decontamination** — n-gram overlap between the training corpus and a
  benchmark/holdout set (the test-set-leakage check every serious
  training run performs; cf. the n-gram overlap protocol popularized by
  GPT-2/GPT-3 and The Pile). The holdout is tiny by construction
  (benchmark suites are KBs against a 100 TB corpus), so its distinct
  n-gram set BROADCASTS and the training side never shuffles: explode →
  broadcast-hash semi-join → distinct-doc rollup. One fact scan.
- **Repetition quality rules** — Gopher-style (Rae et al. 2021, §A1.1)
  per-document repetition ratios (duplicate-token fraction, top-token
  and top-bigram concentration). Everything is computed INSIDE the row
  with higher-order folds over the token array — zero shuffles, plan-
  locked, no per-doc explode+groupBy (which would shuffle 100 TB of
  tokens to compute per-doc maxima).
- **PII scan** — pattern-class counting (email / phone-like / IPv4) via
  ``regexp_count`` per row, aggregated per source: the
  report-before-redact accounting step. Pure per-row maps + one rollup.
  The fixture's word-soup corpus legitimately contains zero PII; the
  oracle checks exactly that (the zero is computed, not assumed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..tables import load, scan_parallel
from .dedup import shingles_from_tokens
from .sampling import _bucket16

# Decontamination n-gram order. Real pipelines use 8-13-gram overlap; the
# fixture's ~31-word vocabulary makes 8-grams collision-free at test scale
# (31^8 >> corpus grams), so 5 keeps the operator's positive path exercised
# while the dataflow is order-agnostic.
DECONTAM_NGRAM = 5
# Holdout = docs whose 16-bit md5 bucket falls below this threshold
# (~3.1%) — a deterministic stand-in for "the benchmark set".
HOLDOUT_BUCKETS = 2048

from .sampling import _B16  # the one 16-bit md5-bucket SQL idiom (stay in
# sync with sampling._bucket16 — a second copy here had already drifted
# into existence; review finding r6)

_HOLDOUT_SQL = f"{_B16} < {HOLDOUT_BUCKETS}"


def _is_holdout(doc_id: Column) -> Column:
    return _bucket16(doc_id) < HOLDOUT_BUCKETS


def holdout_grams(d: DataFrame) -> DataFrame:
    """The distinct DECONTAM_NGRAM-gram set of the holdout docs — the
    (tiny, broadcast) side of every decontamination join. ONE definition
    shared by corpus_decontaminate and corpus_assemble. ``d`` must carry
    (doc_id, text).

    NOT cached (r17): each consumer broadcasts this frame exactly ONCE
    per invocation — the r16 bounded_cache had zero intra-plan reuse and
    only memoised the materialization across invocations (the r16
    verdict's bench-artifact finding); with the bench clearing caches per
    timed run, the cache write was pure overhead."""
    return (
        d.where(_is_holdout(F.col("doc_id")))
        .withColumn("w", F.split(F.col("text"), " "))
        .select(
            F.explode(shingles_from_tokens(F.col("w"), DECONTAM_NGRAM)).alias("gram")
        )
        .distinct()
    )


def contaminated_ids(docs: DataFrame, hold: DataFrame) -> DataFrame:
    """doc_ids of ``docs`` sharing any n-gram with the (broadcast) holdout
    gram set — explode → broadcast semi-join → distinct ids; the doc side
    is never a shuffle side. ``docs`` must carry (doc_id, text)."""
    return (
        docs.withColumn("w", F.split(F.col("text"), " "))
        .select(
            "doc_id",
            F.explode(shingles_from_tokens(F.col("w"), DECONTAM_NGRAM)).alias("gram"),
        )
        .join(F.broadcast(hold), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )


def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language contamination accounting: training docs sharing any
    ``DECONTAM_NGRAM``-gram with the holdout set. The holdout n-gram set
    is distinct-ed (shuffles only holdout-sized data) and broadcast; the
    training side is explode → broadcast semi-join → distinct doc — the
    fact table is scanned once and never shuffled before the final
    per-language rollup. (scan_parallel — guide §2.5 — un-starves the
    single-file fixture scan so the n-gram explode parallelizes; no-op
    on a production multi-file scan.)"""
    d = scan_parallel(
        load(spark, sf_dir, "documents"), spark
    ).select("doc_id", "lang", "text")
    hold = holdout_grams(d)
    train = d.where(~_is_holdout(F.col("doc_id")))
    # survivors of the broadcast semi-join are contaminated (doc, gram)
    # hits — roll them straight up to per-language distinct-doc counts so
    # nothing fact-sized is ever a join side (this keeps lang fused into
    # the rollup, so it shares only the gram-side helper with
    # contaminated_ids, not the id-projection)
    cont_per_lang = (
        train.withColumn("w", F.split(F.col("text"), " "))
        .select(
            "doc_id",
            "lang",
            F.explode(shingles_from_tokens(F.col("w"), DECONTAM_NGRAM)).alias("gram"),
        )
        .join(F.broadcast(hold), "gram", "left_semi")
        .groupBy("lang")
        .agg(F.countDistinct("doc_id").alias("n_contaminated"))
    )
    avail = train.groupBy("lang").agg(F.count("*").alias("n_train"))
    return (
        avail.join(cont_per_lang, "lang", "left")
        .select(
            "lang",
            "n_train",
            F.coalesce(F.col("n_contaminated"), F.lit(0)).alias("n_contaminated"),
            F.round(
                F.coalesce(F.col("n_contaminated"), F.lit(0)) / F.col("n_train"), 6
            ).alias("contamination_rate"),
        )
    )


def _max_run(arr: Column) -> Column:
    """Highest element multiplicity in an array, via sort + one in-row
    fold (run-length over the sorted array). No explode, no shuffle —
    the whole computation stays inside the row."""
    step = lambda acc, t: F.struct(  # noqa: E731
        t.alias("prev"),
        F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    return F.aggregate(F.array_sort(arr), init, step, lambda acc: acc["best"])


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document repetition metrics: distinct-token
    ratio, top-token concentration, top-bigram concentration. All three
    are in-row HOF folds over the token array — a 100 TB corpus computes
    this as a pure map with zero shuffles (vs. the naive explode →
    groupBy(doc, token) → max, which shuffles every token). The in-row
    folds are the expensive leg — scan_parallel (guide §2.5) un-starves
    the single-file fixture scan so they run on every core; no-op on a
    production multi-file scan, keeping the ≤1-exchange lock honest at
    scale."""
    d = scan_parallel(
        load(spark, sf_dir, "documents"), spark
    ).select("doc_id", "text")
    d = d.withColumn("toks", T.tokens(F.col("text")))
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 2),
            lambda i: F.array_join(F.slice(F.col("toks"), i + 1, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = d.select(
        "doc_id",
        F.size("toks").alias("n_tok"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        _max_run(F.col("toks")).alias("max_tok"),
        _max_run(bigrams).alias("max_bigram"),
    )
    return d.select(
        "doc_id",
        "n_tok",
        F.round(F.col("n_distinct") / F.col("n_tok"), 6).alias("distinct_ratio"),
        F.round(F.col("max_tok") / F.col("n_tok"), 6).alias("top_token_frac"),
        F.when(
            F.col("n_tok") >= 2,
            F.round(F.col("max_bigram") / (F.col("n_tok") - 1), 6),
        ).alias("top_bigram_frac"),
    )
    # no presentation sort (r16 perf): the plan is a pure map with no
    # exchange, so an orderBy's range-bounds SAMPLING re-runs the whole
    # token/bigram fold a second time (the doc_hash_embed r9 lesson);
    # the parity harness and the driver canonicalize row order anyway


# pattern classes; Java regex and RE2 (DuckDB) read these identically
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"
PII_IPV4 = r"([0-9]{1,3}\.){3}[0-9]{1,3}"


def corpus_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII pattern accounting: docs flagged and total hits per
    pattern class. Per-row ``regexp_count`` maps + one rollup keyed by
    source — the scan-and-report step that precedes redaction.
    scan_parallel (guide §2.5): the three per-row regexp scans run on
    every core instead of the single fixture-scan partition."""
    d = scan_parallel(
        load(spark, sf_dir, "documents"), spark
    ).select("doc_id", "source", "text")
    counts = d.select(
        "source",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL)).alias("email_n"),
        F.regexp_count(F.col("text"), F.lit(PII_PHONE)).alias("phone_n"),
        F.regexp_count(F.col("text"), F.lit(PII_IPV4)).alias("ipv4_n"),
    )
    return (
        counts.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("email_n") > 0).cast("int")).alias("docs_with_email"),
            F.sum("email_n").alias("email_hits"),
            F.sum((F.col("phone_n") > 0).cast("int")).alias("docs_with_phone"),
            F.sum("phone_n").alias("phone_hits"),
            F.sum((F.col("ipv4_n") > 0).cast("int")).alias("docs_with_ipv4"),
            F.sum("ipv4_n").alias("ipv4_hits"),
        )
    )


QUERIES = {
    "corpus_decontaminate": corpus_decontaminate,
    "doc_repetition": doc_repetition,
    "corpus_pii_scan": corpus_pii_scan,
}

ORACLES = {
    "corpus_decontaminate": f"""
        WITH toks AS (
          SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
        ),
        ng AS (
          SELECT doc_id, lang,
                 array_to_string(t[i:i+{DECONTAM_NGRAM - 1}], ' ') AS gram
          FROM toks, UNNEST(range(1, len(t) - {DECONTAM_NGRAM - 2})) AS u(i)
          WHERE len(t) >= {DECONTAM_NGRAM}
        ),
        hold AS (
          SELECT DISTINCT gram FROM ng WHERE {_HOLDOUT_SQL}
        ),
        contaminated AS (
          SELECT DISTINCT g.doc_id
          FROM ng g JOIN hold USING (gram)
          WHERE NOT ({_HOLDOUT_SQL.replace("doc_id", "g.doc_id")})
        )
        SELECT d.lang,
               count(*) AS n_train,
               CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_contaminated,
               round(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS contamination_rate
        FROM documents d LEFT JOIN contaminated c USING (doc_id)
        WHERE NOT ({_HOLDOUT_SQL.replace("doc_id", "d.doc_id")})
        GROUP BY d.lang
        ORDER BY d.lang
    """,
    "doc_repetition": """
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        tok AS (
          SELECT doc_id, unnest(t) AS w FROM toks
        ),
        tfreq AS (
          SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w
        ),
        tagg AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
                 count(*) AS n_distinct, max(c) AS max_tok
          FROM tfreq GROUP BY doc_id
        ),
        bg AS (
          SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
          FROM toks, UNNEST(range(1, len(t))) AS u(i)
          WHERE len(t) >= 2
        ),
        bfreq AS (
          SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g
        ),
        bagg AS (
          SELECT doc_id, max(c) AS max_bigram FROM bfreq GROUP BY doc_id
        )
        SELECT a.doc_id,
               CAST(a.n_tok AS INTEGER) AS n_tok,
               round(a.n_distinct / CAST(a.n_tok AS DOUBLE), 6)
                 AS distinct_ratio,
               round(a.max_tok / CAST(a.n_tok AS DOUBLE), 6)
                 AS top_token_frac,
               CASE WHEN a.n_tok >= 2 THEN
                 round(b.max_bigram / CAST(a.n_tok - 1 AS DOUBLE), 6)
               END AS top_bigram_frac
        FROM tagg a LEFT JOIN bagg b USING (doc_id)
        ORDER BY a.doc_id
    """,
    "corpus_pii_scan": f"""
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN len(regexp_extract_all(text, '{PII_EMAIL}')) > 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
               CAST(sum(len(regexp_extract_all(text, '{PII_EMAIL}')))
                    AS BIGINT) AS email_hits,
               CAST(sum(CASE WHEN len(regexp_extract_all(text, '{PII_PHONE}')) > 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
               CAST(sum(len(regexp_extract_all(text, '{PII_PHONE}')))
                    AS BIGINT) AS phone_hits,
               CAST(sum(CASE WHEN len(regexp_extract_all(text, '{PII_IPV4}')) > 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_ipv4,
               CAST(sum(len(regexp_extract_all(text, '{PII_IPV4}')))
                    AS BIGINT) AS ipv4_hits
        FROM documents
        GROUP BY source
        ORDER BY source
    """,
}
