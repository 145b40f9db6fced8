"""Bloom-filter membership sketch over document digests — the constant-
space half of the exact-dedup family.

``dedup_exact`` finds duplicates INSIDE a corpus (digest shuffle);
``dedup_incremental_lsh`` joins a new batch against the corpus for
near-dups. What's missing between them is the cheapest production
primitive: "has this exact content been ingested before?" answered
WITHOUT joining against the corpus at all. A Bloom filter over content
hashes is that primitive (Bloom, CACM 1970; the same role Spark's own
runtime bloom-filter join pruning and every warehouse's ingest-dedup
path use): ~``BLOOM_BITS`` bits total, false-positive-only, and
MERGEABLE — per-partition bitmaps OR together, so the build is one
hash-aggregate over ``BLOOM_WORDS`` rows per partition, never a shuffle
of the documents.

Representation: (word, bits) rows — ``BLOOM_WORDS`` 32-bit words
(32, not 64: DuckDB's checked shift overflows on ``1 << 63``), word
``w`` holding bits ``[32w, 32w+32)`` of the filter. Row form (not one
array) keeps the merge a plain ``groupBy(word).bit_or(bits)`` — the
same shape the compaction family uses for flush partials.

Everything is md5-prefix arithmetic (``h_j(text) = int(md5(j || ':' ||
text)[:8], 16) % BLOOM_BITS``), so unlike most Bloom implementations the
filter content is EXACTLY replayable in SQL: both queries carry full
DuckDB oracles — bit-for-bit, not just statistically. False-positive
rate is the classical (1 - e^{-kn/m})^k: with n=500 sf0.01 docs,
m=16384 bits, k=4 it is ~2e-4. A deployment sizes BLOOM_WORDS to its
corpus (~10 bits/element for ~1% FP; the layout and every cost here are
linear in it — at 100 TB/10¹¹ docs the filter is ~125 GB, which is when
you shard it by a digest prefix into per-range filters, each still a
(word, bits) frame under the same algebra).

Reference parity note: the reference repo has no membership sketch;
this extends SURVEY.md §8.2's dedup family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

BLOOM_WORDS = 512  # words in the filter (16384 bits ≈ 2 KB)
WORD_BITS = 32  # bits per word: 32, not 64 — DuckDB's checked left shift
#                 overflows on 1::BIGINT << 63, so the portable word is
#                 the half that both engines shift without sign games
BLOOM_BITS = BLOOM_WORDS * WORD_BITS
BLOOM_HASHES = 4  # k independent salted-md5 hash functions


def bloom_positions(text: Column, bits: int = BLOOM_BITS) -> Column:
    """``BLOOM_HASHES`` bit positions for one document's content: salted
    md5 prefixes reduced mod ``bits`` — deterministic, engine-portable
    integer arithmetic (8 hex digits < 2^32 fits BIGINT exactly in both
    engines). The default size is the corpus filter's; callers sizing a
    filter to their own element count (the per-file snapshot index)
    pass their own ``bits`` — a filter holding n keys wants ~10n bits,
    and an undersized one silently saturates into all-maybe."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{j}:"), text)), 1, 8), 16, 10
            ).cast("long")
            % bits
            for j in range(BLOOM_HASHES)
        ]
    )


def _word_bits(positions_df: DataFrame) -> DataFrame:
    """(…, pos) → (…, word, one-hot bits): the word index and the set bit
    as a 64-bit mask, ready for ``bit_or`` aggregation."""
    return positions_df.select(
        *positions_df.columns[:-1],
        (F.col("pos") / WORD_BITS).cast("int").alias("word"),
        # F.shiftleft takes a literal shift; the per-row shift needs the
        # SQL form (same JVM expression, still codegen'd)
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))"
        ).alias("bits"),
    )


def bloom_build(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The filter for a document frame: ≤ BLOOM_WORDS (word, bits) rows.
    One explode of k positions per doc + one hash aggregate — map-side
    partial ``bit_or`` means each partition ships ≤ BLOOM_WORDS rows."""
    pos = docs.where(F.col(text_col).isNotNull()).select(
        F.explode(bloom_positions(F.col(text_col))).alias("pos")
    )
    return _word_bits(pos).groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(docs: DataFrame, filt: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document membership verdict against a built filter:
    ``maybe_dup`` iff EVERY hash bit is set (Bloom's no-false-negative
    side), else ``novel``. The probe groups its own positions per
    (doc, word) and broadcast-joins the ≤ BLOOM_WORDS filter rows — no
    corpus access at all, which is the point."""
    req = (
        _word_bits(
            docs.where(F.col(text_col).isNotNull()).select(
                "doc_id", F.explode(bloom_positions(F.col(text_col))).alias("pos")
            )
        )
        .groupBy("doc_id", "word")
        .agg(F.bit_or("bits").alias("req_bits"))
    )
    hit = req.join(F.broadcast(filt), "word", "left").withColumn(
        "ok",
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("req_bits"))
        == F.col("req_bits"),
    )
    return hit.groupBy("doc_id").agg(
        F.when(F.bool_and("ok"), F.lit("maybe_dup"))
        .otherwise(F.lit("novel"))
        .alias("status")
    )


def corpus_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents corpus's Bloom filter as (word, bits) rows —
    partitioning-independent (OR is associative/commutative), hence
    oracle-exact unlike the MG/HLL summaries."""
    d = load(spark, sf_dir, "documents")
    return bloom_build(d).orderBy("word")


def corpus_bloom_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-gate simulation: build the filter from the even-doc_id half
    (the 'already-ingested corpus'), probe the odd half, and count
    verdicts. Probing costs k hashes + a ≤ BLOOM_WORDS broadcast join
    per doc — the corpus itself is never read on the probe side. The
    fixture's halves share no text, so every honest answer is 'novel';
    any 'maybe_dup' row IS the filter's false-positive rate made visible
    (deterministic here, and replayed exactly by the oracle)."""
    d = load(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") % 2 == 0)
    probe = d.where(F.col("doc_id") % 2 == 1)
    verdicts = bloom_probe(probe, bloom_build(corpus))
    return (
        verdicts.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _bloom_positions_sql(text_expr: str) -> list[str]:
    return [
        f"CAST(concat('0x', substring(md5(concat('{j}:', {text_expr})), 1, 8)) "
        f"AS BIGINT) % {BLOOM_BITS}"
        for j in range(BLOOM_HASHES)
    ]


def _filter_oracle() -> str:
    pos_rows = " UNION ALL ".join(
        f"SELECT {p} AS pos FROM documents WHERE text IS NOT NULL"
        for p in _bloom_positions_sql("text")
    )
    return f"""
        SELECT CAST(pos // {WORD_BITS} AS INTEGER) AS word,
               bit_or(1::BIGINT << CAST(pos % {WORD_BITS} AS INTEGER)) AS bits
        FROM ({pos_rows})
        GROUP BY 1 ORDER BY word
    """


def _novelty_oracle() -> str:
    probe_pos = " UNION ALL ".join(
        f"SELECT doc_id, {p} AS pos FROM documents "
        f"WHERE text IS NOT NULL AND doc_id % 2 = 1"
        for p in _bloom_positions_sql("text")
    )
    corpus_pos = " UNION ALL ".join(
        f"SELECT {p} AS pos FROM documents "
        f"WHERE text IS NOT NULL AND doc_id % 2 = 0"
        for p in _bloom_positions_sql("text")
    )
    return f"""
        WITH filt AS (
          SELECT CAST(pos // {WORD_BITS} AS INTEGER) AS word,
                 bit_or(1::BIGINT << CAST(pos % {WORD_BITS} AS INTEGER)) AS bits
          FROM ({corpus_pos}) GROUP BY 1
        ),
        req AS (
          SELECT doc_id, CAST(pos // {WORD_BITS} AS INTEGER) AS word,
                 bit_or(1::BIGINT << CAST(pos % {WORD_BITS} AS INTEGER)) AS req_bits
          FROM ({probe_pos}) GROUP BY 1, 2
        ),
        verdict AS (
          SELECT r.doc_id,
                 CASE WHEN bool_and((coalesce(f.bits, 0) & r.req_bits) = r.req_bits)
                      THEN 'maybe_dup' ELSE 'novel' END AS status
          FROM req r LEFT JOIN filt f ON f.word = r.word
          GROUP BY r.doc_id
        )
        SELECT status, count(*) AS n FROM verdict GROUP BY status ORDER BY status
    """


QUERIES = {
    "corpus_bloom_filter": corpus_bloom_filter,
    "corpus_bloom_novelty": corpus_bloom_novelty,
}

ORACLES = {
    "corpus_bloom_filter": _filter_oracle(),
    "corpus_bloom_novelty": _novelty_oracle(),
}
