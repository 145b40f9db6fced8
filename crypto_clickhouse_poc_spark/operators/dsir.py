"""DSIR-style data selection: importance weights over hashed n-gram buckets.

Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" (arXiv:2302.03169): estimate how target-like each raw document
is by fitting two bag-of-hashed-ngrams unigram models — one on a TARGET
sample, one on the RAW corpus — and weighting every document by

    log w(x) = sum_b  count_b(x) * ( log p_target(b) - log p_raw(b) )

where ``b`` ranges over ``DSIR_BUCKETS`` hash buckets (the paper's hashed
n-gram features; unigrams here) and both models are add-1 smoothed. Docs
whose token distribution matches the target score high; selection then
keeps the top of the weight ranking (the paper resamples with Gumbel
noise — the deterministic top-k variant is the same ordering).

This is the data-selection operator the LLM-pipeline family otherwise
lacks: quality filters (doc_quality_verdict) judge documents in isolation;
DSIR judges them against a DISTRIBUTION ("more like Wikipedia, less like
raw crawl"). The target here is the fixture's ``lang = 'en'`` slice — the
stand-in for "the high-quality domain sample".

Spark shape (one explode + three map-side-combined aggregates, no UDFs):

1. tokens -> (doc, lang, bucket, n) partials — the ONLY data-sized
   shuffle, keyed (doc_id, bucket), map-side combined to the doc's
   distinct-bucket count (<= DSIR_BUCKETS per doc);
2. bucket stats: one <=DSIR_BUCKETS-row aggregate computing raw and
   target counts TOGETHER (the target model is a conditional sum — one
   pass, not two corpus scans over separate frames);
3. totals: a 1-row aggregate, broadcast back;
4. weights: per-doc sum of n * score(bucket) through a broadcast join of
   the <=DSIR_BUCKETS-row score table.

At 100 TB: stage 1 is the scan + one bounded-key shuffle; everything
after it is metadata-sized. The md5-prefix bucket arithmetic is the
repo's established SQL-replayable hashing (text.doc_hash_embed), so the
whole operator is DuckDB-oracle-EXACT — no other learned-encoder scoring
path in the pipeline family can claim that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import bounded_cache
from ..tables import load, scan_parallel

DSIR_BUCKETS = 64
DSIR_TARGET_LANG = "en"


def _bucket(col):
    return (
        F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("int")
        % DSIR_BUCKETS
    )


def dsir_weights_frame(
    docs: DataFrame, target_pred=None, text_col: str = "text"
) -> DataFrame:
    """(doc_id, dsir_logw) for an arbitrary documents frame.

    ``target_pred`` is the boolean Column selecting the target sample
    (default: ``lang = DSIR_TARGET_LANG``). Factored out of the query so
    the planted-shift gate can run it on synthetic corpora."""
    if target_pred is None:
        target_pred = F.col("lang") == DSIR_TARGET_LANG
    d = docs.select(
        "doc_id",
        target_pred.alias("_tgt"),
        F.coalesce(
            F.split(F.col(text_col), " "), F.array().cast("array<string>")
        ).alias("w"),
    )
    # explode_outer keeps token-less docs as one NULL-token row, so every
    # doc surfaces in the output (weight 0) without a join-back later
    toks = d.select("doc_id", "_tgt", F.explode_outer("w").alias("t"))
    per = toks.groupBy(
        "doc_id",
        "_tgt",
        F.when(F.col("t").isNotNull(), _bucket(F.col("t"))).alias("b"),
    ).agg(F.count("t").alias("n"))  # count(t) skips the NULL-token rows
    # three consumers reference this subplan (bucket stats, totals, the
    # per-doc weights) — uncached, Catalyst re-derives it per branch and
    # the corpus is SCANNED THREE TIMES (observed in the generated plan).
    # bounded_cache is the repo's LSH-established answer: at most one
    # live cache per call site, ≤ DSIR_BUCKETS rows per doc cached.
    per = bounded_cache("dsir_per", per)
    stats = (
        per.where(F.col("b").isNotNull())
        .groupBy("b")
        .agg(
            F.sum("n").alias("raw_n"),
            F.sum(F.when(F.col("_tgt"), F.col("n")).otherwise(F.lit(0))).alias(
                "tgt_n"
            ),
        )
    )
    tot = stats.agg(
        F.sum("raw_n").alias("raw_tot"), F.sum("tgt_n").alias("tgt_tot")
    )
    score = stats.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("tgt_n") + 1) / (F.col("tgt_tot") + DSIR_BUCKETS))
            - F.log((F.col("raw_n") + 1) / (F.col("raw_tot") + DSIR_BUCKETS))
        ).alias("s"),
    )
    return (
        per.join(F.broadcast(score), "b", "left")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("s"), F.lit(0.0)) * F.col("n")), 6
            ).alias("dsir_logw")
        )
    )


def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weight against the ``lang='en'``
    target slice. Higher = more target-like; feed to top-k selection or
    weighted sampling (``corpus_mix``-style threshold pass).
    scan_parallel (r17, guide §2.5): the per-doc n-gram scoring fold runs
    on every core instead of the single fixture-scan partition; no-op on
    a production multi-file scan."""
    return dsir_weights_frame(
        scan_parallel(load(spark, sf_dir, "documents"), spark)
    )


DSIR_SELECT_N = 100


def corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selection step: the ``DSIR_SELECT_N`` most target-like docs by
    importance weight (deterministic tie-break on doc_id — the paper
    resamples with Gumbel noise; the top-k variant is the same ordering
    and is SQL-replayable). One broadcast-sized TakeOrdered over the
    weights frame joined back to the doc metadata; the heavy lifting is
    all in :func:`dsir_weights_frame`."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    w = dsir_weights_frame(load(spark, sf_dir, "documents"))
    return (
        w.join(docs, "doc_id")
        .orderBy(F.col("dsir_logw").desc(), "doc_id")
        .limit(DSIR_SELECT_N)
    )


DSIR_KEEP_FRAC = 0.2  # keep the top-20% most target-like docs per stratum


def corpus_dsir_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted mixing: within each language stratum, keep the
    docs whose DSIR weight clears the stratum's 1-``DSIR_KEEP_FRAC``
    percentile — ``corpus_mix``'s stratified downsampling with the
    random hash order replaced by the importance ranking (the paper's
    selection step applied per stratum). Output is the per-stratum
    accounting: available, kept, the threshold, and the kept mean weight.

    Threshold via EXACT ``F.percentile`` for oracle parity (the repo's
    ev_price_quantiles precedent); at 100 TB swap to
    ``approx_percentile`` or the two-pass exact selection
    (ev_price_quantiles_twopass) — the rest of the plan is map-side
    aggregates and one ≤|strata|-row broadcast."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    w = dsir_weights_frame(load(spark, sf_dir, "documents")).join(docs, "doc_id")
    thr = w.groupBy("lang").agg(
        F.percentile("dsir_logw", 1.0 - DSIR_KEEP_FRAC).alias("thr"),
        F.count("*").alias("n_avail"),
    )
    kept = w.join(F.broadcast(thr), "lang").where(
        F.col("dsir_logw") >= F.col("thr")
    )
    return (
        kept.groupBy("lang", "n_avail", "thr")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.avg("dsir_logw"), 6).alias("kept_avg_logw"),
        )
        .select(
            "lang",
            "n_avail",
            "n_kept",
            F.round("thr", 6).alias("thr"),
            "kept_avg_logw",
        )
    )


QUERIES = {
    "corpus_dsir_weights": corpus_dsir_weights,
    "corpus_dsir_select": corpus_dsir_select,
    "corpus_dsir_mix": corpus_dsir_mix,
}

ORACLES = {
    "corpus_dsir_weights": f"""
        WITH docs AS (
          SELECT doc_id, lang = '{DSIR_TARGET_LANG}' AS tgt,
                 CASE WHEN text IS NULL THEN []
                      ELSE string_split(text, ' ') END AS w
          FROM documents
        ),
        toks AS (SELECT doc_id, tgt, unnest(w) AS t FROM docs),
        per AS (
          SELECT doc_id, tgt,
                 CAST(concat('0x', substring(md5(t), 1, 4)) AS INTEGER)
                   % {DSIR_BUCKETS} AS b,
                 count(*) AS n
          FROM toks GROUP BY 1, 2, 3
        ),
        stats AS (
          SELECT b, sum(n) AS raw_n,
                 sum(CASE WHEN tgt THEN n ELSE 0 END) AS tgt_n
          FROM per GROUP BY 1
        ),
        tot AS (
          SELECT sum(raw_n) AS raw_tot, sum(tgt_n) AS tgt_tot FROM stats
        ),
        score AS (
          SELECT b,
                 ln((tgt_n + 1.0) / (tgt_tot + {DSIR_BUCKETS}))
               - ln((raw_n + 1.0) / (raw_tot + {DSIR_BUCKETS})) AS s
          FROM stats CROSS JOIN tot
        ),
        dw AS (
          SELECT doc_id, sum(s * n) AS lw
          FROM per JOIN score USING (b) GROUP BY 1
        )
        SELECT d.doc_id, round(coalesce(dw.lw, 0.0), 6) AS dsir_logw
        FROM documents d LEFT JOIN dw ON d.doc_id = dw.doc_id
    """,
}

# the selection query's oracle reuses the weights oracle as a CTE
ORACLES["corpus_dsir_select"] = f"""
    WITH weights AS ( {ORACLES["corpus_dsir_weights"]} )
    SELECT w.doc_id, w.dsir_logw, d.lang, d.n_chars
    FROM weights w JOIN documents d ON w.doc_id = d.doc_id
    ORDER BY w.dsir_logw DESC, w.doc_id
    LIMIT {DSIR_SELECT_N}
"""

# DuckDB quantile_cont == Spark's exact interpolating F.percentile (the
# ev_price_quantiles parity precedent)
ORACLES["corpus_dsir_mix"] = f"""
    WITH weights AS ( {ORACLES["corpus_dsir_weights"]} ),
    w AS (
      SELECT weights.doc_id, weights.dsir_logw, d.lang
      FROM weights JOIN documents d ON weights.doc_id = d.doc_id
    ),
    thr AS (
      SELECT lang, quantile_cont(dsir_logw, {1.0 - DSIR_KEEP_FRAC}) AS thr,
             count(*) AS n_avail
      FROM w GROUP BY lang
    )
    SELECT w.lang, thr.n_avail, count(*) AS n_kept,
           round(thr.thr, 6) AS thr,
           round(avg(w.dsir_logw), 6) AS kept_avg_logw
    FROM w JOIN thr ON w.lang = thr.lang
    WHERE w.dsir_logw >= thr.thr
    GROUP BY w.lang, thr.n_avail, thr.thr
"""
