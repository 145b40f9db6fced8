"""Training-data curation operators: deterministic sampling, corpus
mixing, shard assignment, and sequence packing over ``documents``.

The three dataset-assembly steps a large-scale training pipeline runs
after cleaning/dedup (``text.corpus_prepare*``), each in its scale shape:

- **Stratified sampling** — keep each stratum (language) at its own rate.
  Selection is a pure per-row hash test (md5 bucket < rate·2¹⁶): zero
  shuffles for the selection itself, reproducible across engines and runs
  (no RNG), and stable under re-partitioning — the properties
  ``DataFrame.sample`` cannot give (partition-order dependent, and not
  replayable in SQL for the oracle).
- **Weighted mixing** — hit target language proportions exactly, limited
  by availability: the feasible total is min over strata of
  (available / weight); each stratum keeps its ``floor(weight · total)``
  smallest-(md5, doc_id) docs. Selection is two-pass hash-threshold
  (distributed selection), NOT a per-stratum global rank: with a handful
  of language strata, ``row_number() OVER (PARTITION BY lang)`` would
  funnel each stratum's FULL row set through one task's sort — a
  single-task straggler at 100 TB. Instead pass 1 histograms the 16-bit
  md5 bucket per stratum (one well-distributed aggregate keyed by
  (lang, bucket)), locates the quota boundary bucket from the ≤65 536-row
  histogram, and pass 2 keeps rows below the boundary via a per-row
  comparison — only the boundary bucket itself (≤ n/65 536 of the
  stratum) is ever ranked. Identical keep-set to the rank formulation,
  bit-for-bit (md5 hex is fixed-length, so lexicographic (md5, doc_id)
  order refines bucket order).
- **Sharding** — output-file assignment by hash bucket modulo shard
  count: per-row map + one accounting aggregate; balance is verifiable
  from the rollup (and is a property test below the oracle gate).

All three are oracle-exact (the md5-bucket idiom matches DuckDB
bit-for-bit, as in ``text.doc_split``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as T
from ..tables import load

# per-language target sampling rates (stratified sampling); unlisted
# languages fall back to DEFAULT_RATE
SAMPLE_RATES = {"en": 1.0, "de": 0.5, "fr": 0.25}
DEFAULT_RATE = 0.1

# target mixture proportions (weighted mixing); must sum to 1
MIX_WEIGHTS = {"en": 0.5, "de": 0.3, "fr": 0.2}

N_SHARDS = 16


def _bucket16(doc_id: Column) -> Column:
    """Deterministic 16-bit hash bucket of a doc id (0..65535) — the
    md5-prefix idiom shared with text.doc_split, replayable in DuckDB."""
    return F.conv(
        F.substring(F.md5(doc_id.cast("string")), 1, 4), 16, 10
    ).cast("int")


def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic hash sampling with per-stratum rates;
    output is the per-language accounting rollup (available, sampled,
    achieved rate). The keep-test is a per-row map — at 100 TB the sample
    materializes with zero shuffles; only this summary aggregates."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    rate = F.lit(DEFAULT_RATE)
    for lang, r in sorted(SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    kept = (_bucket16(F.col("doc_id")) < (rate * 65536.0)).cast("int")
    return (
        d.withColumn("kept", kept)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").alias("n_sampled"),
            F.round(F.sum("kept") / F.count("*"), 6).alias("achieved_rate"),
        )
        .orderBy("lang")
    )


def mix_weight_col() -> Column:
    """The MIX_WEIGHTS lang→weight CASE expression — ONE definition shared
    by corpus_mix and corpus_assemble (a second copy of the loop had
    already appeared and was folded back here; review finding r7)."""
    weight = F.lit(None).cast("double")
    for lang, wt in sorted(MIX_WEIGHTS.items()):
        weight = F.when(F.col("lang") == lang, F.lit(wt)).otherwise(weight)
    return weight


def _mix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixing candidate set: docs in a weighted language, with their
    target weight and 16-bit hash bucket attached (all per-row maps)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    d = d.where(F.col("lang").isin(sorted(MIX_WEIGHTS)))
    return d.withColumn("weight", mix_weight_col()).withColumn(
        "bkt", _bucket16(F.col("doc_id"))
    )


def _mix_bounds(d: DataFrame) -> DataFrame:
    """Pass 1 of the two-pass threshold selection: per stratum, the bucket
    histogram, quota, full-keep prefix, boundary bucket, and the residual
    count to take from the boundary bucket. One (lang, bkt)-keyed
    aggregate over the data; everything after runs on the ≤65 536-row
    per-stratum histogram. Output is one row per stratum (broadcastable).
    """
    hist = d.groupBy("lang", "weight", "bkt").agg(F.count("*").alias("c"))
    wb = (
        Window.partitionBy("lang")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(wb))
    avail = cum.groupBy("lang", "weight").agg(F.sum("c").alias("n_avail"))
    total = avail.agg(
        F.min(F.floor(F.col("n_avail") / F.col("weight"))).alias("feasible_total")
    )
    quota = avail.crossJoin(F.broadcast(total)).select(
        "lang",
        "weight",
        "n_avail",
        F.floor(F.col("weight") * F.col("feasible_total")).alias("quota"),
    )
    # cum is monotone in bkt within a stratum, so {bkt : cum <= quota} is a
    # prefix: full_max = last fully-kept bucket, boundary_bkt = the single
    # partially-kept bucket, remaining = rows still owed from it.
    return (
        cum.join(F.broadcast(quota), ["lang", "weight"])
        .groupBy("lang", "weight", "n_avail", "quota")
        .agg(
            F.max(F.when(F.col("cum") <= F.col("quota"), F.col("bkt"))).alias(
                "full_max"
            ),
            F.max(F.when(F.col("cum") <= F.col("quota"), F.col("cum"))).alias(
                "cum_full"
            ),
            F.min(F.when(F.col("cum") > F.col("quota"), F.col("bkt"))).alias(
                "boundary_bkt"
            ),
        )
        .withColumn(
            "remaining", F.col("quota") - F.coalesce(F.col("cum_full"), F.lit(0))
        )
    )


def _mix_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pass 2: the kept doc set. The per-stratum bounds (ONE row per
    stratum — 3 here, never more than the number of languages being
    mixed) are collected and inlined as literals, the same
    bounded-collect pattern as the IVF centroid fold (similarity.py):
    pass 1 runs exactly once, and the full-keep branch becomes a pure
    per-row comparison — no Join, no Exchange, nothing to recompute per
    plan branch. ONLY the boundary bucket's rows (≤ n/65 536 of each
    stratum) go through the (md5, doc_id) rank. Same keep-set as ranking
    the whole stratum, without ever sorting it."""
    return _mix_kept_from(_mix_docs(spark, sf_dir))


def _mix_kept_from(d: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Two-pass selection over a prepared (doc_id, lang, weight, bkt)
    frame. Equivalent to ranking each stratum by (bkt, md5(doc_id),
    doc_id) and keeping the first quota rows; with the real ``_bucket16``
    column that order IS (md5, doc_id) order. The property test forces
    bucket collisions with a tiny synthetic bkt space to exercise the
    boundary-bucket partial rank, which real 16-bit buckets only hit at
    scale.

    ``extra_cols`` ride through unchanged — downstream stages (e.g.
    corpus_assemble's packer needs per-doc token counts) carry their
    columns INSIDE the selection instead of join-ing the kept set back
    against the fact table (which would add a fact-sized shuffle)."""
    bounds = _mix_bounds(d).collect()  # bounded: one row per stratum
    full_cond = F.lit(False)
    boundary_cond = F.lit(False)
    remaining = F.lit(0).cast("bigint")
    n_avail = F.lit(None).cast("bigint")
    for b in sorted(bounds, key=lambda r: r["lang"]):
        is_lang = F.col("lang") == b["lang"]
        full_max = -1 if b["full_max"] is None else int(b["full_max"])
        full_cond = F.when(
            is_lang, F.col("bkt") <= F.lit(full_max)
        ).otherwise(full_cond)
        if b["boundary_bkt"] is not None and b["remaining"] > 0:
            boundary_cond = F.when(
                is_lang, F.col("bkt") == F.lit(int(b["boundary_bkt"]))
            ).otherwise(boundary_cond)
        remaining = F.when(is_lang, F.lit(int(b["remaining"]))).otherwise(remaining)
        n_avail = F.when(is_lang, F.lit(int(b["n_avail"]))).otherwise(n_avail)
    d = d.withColumn("n_avail", n_avail)
    full = d.where(full_cond)
    wp = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    partial = (
        d.where(boundary_cond)
        .withColumn("rk", F.row_number().over(wp))
        .where(F.col("rk") <= remaining)
    )
    cols = ["doc_id", "lang", "weight", "n_avail", *extra_cols]
    return full.select(*cols).unionByName(partial.select(*cols))


def corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: downsample each language to hit the
    MIX_WEIGHTS proportions exactly, capped by availability.

    feasible_total = min over strata of floor(available / weight); each
    stratum keeps its floor(weight · feasible_total) smallest-(md5,
    doc_id) docs via two-pass hash-threshold selection (see module
    docstring and ``_mix_bounds``/``_mix_kept`` — no full-stratum sort
    anywhere). Output: per-language accounting (weight, available, kept,
    achieved share of the mixture).
    """
    kept = _mix_kept(spark, sf_dir)
    per_lang = kept.groupBy("lang", "weight", "n_avail").agg(
        F.count("*").alias("n_kept")
    )
    grand = per_lang.agg(F.sum("n_kept").alias("n_total"))
    return (
        per_lang.crossJoin(F.broadcast(grand))
        .select(
            "lang",
            "weight",
            "n_avail",
            "n_kept",
            F.round(F.col("n_kept") / F.col("n_total"), 6).alias("achieved_share"),
        )
        .orderBy("lang")
    )


def corpus_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard assignment for output writing: shard = hash bucket mod
    N_SHARDS (per-row map), with the per-shard accounting a writer needs
    (docs, whitespace tokens). At 100 TB the assignment column feeds
    ``partitionBy("shard")`` directly; only this rollup shuffles."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    shard = (_bucket16(F.col("doc_id")) % N_SHARDS).alias("shard")
    return (
        d.select(shard, F.size(T.tokens(F.col("text"))).alias("n_tok"))
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
        .orderBy("shard")
    )


PACK_BUDGET = 2048  # whitespace tokens per training pack


def corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs to fixed-token-budget training packs.

    Deterministic streaming-order convention (the Spark-shaped version of
    greedy packing): within each shard, docs are laid out in (md5, doc_id)
    order and a doc belongs to the pack where its starting offset falls —
    ``pack_id = floor((cumsum_tokens - n_tok) / budget)`` via one window
    cumulative sum per shard (a doc that straddles a boundary counts
    toward the pack it starts in; real writers pad or split the tail —
    an I/O convention, not a dataflow change). One shuffle keyed by
    shard; output is the per-(shard, pack) accounting a writer consumes.
    At 100 TB packing parallelizes per shard and each shard's window is
    independent — no global ordering anywhere.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    d = d.select(
        "doc_id",
        (_bucket16(F.col("doc_id")) % N_SHARDS).alias("shard"),
        F.size(T.tokens(F.col("text"))).alias("n_tok"),
    )
    return pack_accounting(d)


def pack_accounting(d: DataFrame) -> DataFrame:
    """The packing dataflow over any prepared (doc_id, shard, n_tok)
    frame: per-shard (md5, doc_id)-ordered cumulative sum → pack_id →
    per-(shard, pack) rollup. ONE definition shared by corpus_pack and
    corpus_assemble — the budget, ordering, and straddle convention must
    stay identical or the two oracles drift."""
    w = (
        Window.partitionBy("shard")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.withColumn(
        "pack_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(PACK_BUDGET)),
    )
    return (
        packed.groupBy("shard", "pack_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )


def corpus_chunk_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing over CHUNKS instead of whole docs — the step
    after ``text.doc_chunks``: a long doc's 64-token windows are the
    packing units, so no training sequence ever truncates more than a
    window boundary (the standard chunk-then-pack pipeline). Same shared
    ``pack_accounting`` dataflow and conventions as ``corpus_pack``;
    the unit id is the synthetic ``doc_id * 1_000_000 + chunk_id`` (a
    collision needs a 48M-token doc) and every chunk SHARDS WITH ITS
    PARENT doc (md5 of the parent id), keeping one document's windows in
    one writer's stream. One generate + one shard-keyed window shuffle
    at any corpus size."""
    from .text import doc_chunks

    ch = doc_chunks(spark, sf_dir)
    units = ch.select(
        (_bucket16(F.col("doc_id")) % N_SHARDS).alias("shard"),
        (F.col("doc_id") * 1_000_000 + F.col("chunk_id")).alias("doc_id"),
        F.col("n_chunk_tokens").alias("n_tok"),
    )
    return pack_accounting(units)


def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every doc gets an
    exact position in a reproducible pseudo-random order (rank by
    (md5('shuffle:'||doc_id), doc_id)) — the step that decorrelates
    curriculum order from source/crawl order before packing.

    Scale shape: an exact GLOBAL rank without a global sort. A naive
    ``row_number() OVER (ORDER BY h)`` funnels the entire corpus through
    one task — the straggler class corpus_mix's fix eliminated. Instead
    the two-pass pattern generalizes from threshold selection to full
    rank assignment: pass 1 histograms the 16-bit hash bucket (one
    well-distributed aggregate, ≤65 536 rows) and turns it into per-bucket
    starting offsets (a window over the tiny histogram, then a broadcast
    join back); pass 2 ranks WITHIN each bucket (65 536-way parallel
    windows, ~n/65 536 rows each) and adds the offset. Bucket order is the
    hash's own prefix order, so offset + within-bucket rank IS the global
    rank, bit-for-bit — which is exactly what the oracle's row_number
    computes.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    h = F.md5(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
    d = d.withColumn("h", h).withColumn(
        "bucket", F.conv(F.substring(F.col("h"), 1, 4), 16, 10).cast("long")
    )
    hist = d.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    offsets = hist.withColumn(
        "offset",
        F.sum("n").over(
            Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).select("bucket", F.coalesce("offset", F.lit(0)).alias("offset"))
    w = Window.partitionBy("bucket").orderBy("h", "doc_id")
    return (
        d.join(F.broadcast(offsets), "bucket")
        .withColumn("pos", F.col("offset") + F.row_number().over(w) - 1)
        .select("doc_id", "lang", "pos")
        .orderBy("pos")
    )


def split_of_cluster(cluster: Column) -> Column:
    """80/10/10 split from a cluster label: md5 bucket mod 100 — ONE copy
    of the idiom, shared by the batch split and its append-time twin (the
    two must agree bit-for-bit or an anchored inheritance would drift
    from the batch reconciliation)."""
    bkt = (
        F.conv(F.substring(F.md5(cluster.cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    return (
        F.when(bkt < 80, "train").when(bkt < 90, "validation").otherwise("test")
    )


def corpus_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/validation/test assignment: the split unit is
    the NEAR-DUP CLUSTER, not the document, so two near-copies can never
    straddle a split boundary (per-doc hashing puts ~10% of every dup
    cluster's members in eval — the classic train/test contamination an
    eval suite exists to prevent; cf. the decontamination practice in
    Brown et al. 2020 §4 / Rae et al. 2021 appendix).

    Composition of already-scale-shaped stages: the verified LSH pair
    graph → min-label connected components (``dedup.min_label_clusters``:
    driver union-find under the edge cap, distributed pointer jumping
    above) → split = md5 bucket of the CLUSTER label mod 100 (80/10/10).
    Deterministic, engine-portable (the md5-prefix idiom shared with the
    samplers, replayed exactly by the DuckDB oracle), and one extra
    per-row map over the cluster labeling — no shuffle beyond what the
    components already paid. Singleton docs are their own cluster, so the
    non-duplicated bulk still splits ~uniformly."""
    from .dedup import _lsh_pairs, min_label_clusters

    docs = load(spark, sf_dir, "documents").select("doc_id")
    pairs = _lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    lbl = min_label_clusters(docs, pairs).select("doc_id", "cluster")
    return lbl.select(
        "doc_id", "cluster", split_of_cluster(F.col("cluster")).alias("split")
    )


QUERIES = {
    "corpus_sample_stratified": corpus_sample_stratified,
    "corpus_mix": corpus_mix,
    "corpus_shard": corpus_shard,
    "corpus_pack": corpus_pack,
    "corpus_chunk_pack": corpus_chunk_pack,
    "corpus_shuffle": corpus_shuffle,
    "corpus_split_leakage_safe": corpus_split_leakage_safe,
}

_B16 = (
    "CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)"
)

_RATE_CASE = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {r}" for lang, r in sorted(SAMPLE_RATES.items())
) + f" ELSE {DEFAULT_RATE} END"

_WEIGHT_CASE = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {wt}" for lang, wt in sorted(MIX_WEIGHTS.items())
) + " END"

_MIX_LANGS = ", ".join(f"'{lang}'" for lang in sorted(MIX_WEIGHTS))

ORACLES = {
    "corpus_sample_stratified": f"""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN {_B16} < ({_RATE_CASE}) * 65536.0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
               round(sum(CASE WHEN {_B16} < ({_RATE_CASE}) * 65536.0
                              THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE),
                     6) AS achieved_rate
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    "corpus_mix": f"""
        WITH d AS (
          SELECT doc_id, lang, CAST({_WEIGHT_CASE} AS DOUBLE) AS weight
          FROM documents WHERE lang IN ({_MIX_LANGS})
        ),
        avail AS (
          SELECT lang, weight, count(*) AS n_avail FROM d GROUP BY lang, weight
        ),
        total AS (
          SELECT min(CAST(floor(n_avail / weight) AS BIGINT)) AS feasible_total
          FROM avail
        ),
        quota AS (
          SELECT lang, weight, n_avail,
                 CAST(floor(weight * feasible_total) AS BIGINT) AS quota
          FROM avail, total
        ),
        ranked AS (
          SELECT doc_id, lang,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM d
        ),
        kept AS (
          SELECT r.lang, q.weight, q.n_avail
          FROM ranked r JOIN quota q ON r.lang = q.lang
          WHERE r.rk <= q.quota
        ),
        per_lang AS (
          SELECT lang, weight, n_avail, count(*) AS n_kept
          FROM kept GROUP BY lang, weight, n_avail
        ),
        grand AS (SELECT sum(n_kept) AS n_total FROM per_lang)
        SELECT lang, weight, n_avail, n_kept,
               round(n_kept / CAST(n_total AS DOUBLE), 6) AS achieved_share
        FROM per_lang, grand
        ORDER BY lang
    """,
    "corpus_shard": f"""
        SELECT {_B16} % {N_SHARDS} AS shard,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY shard
        ORDER BY shard
    """,
    "corpus_pack": f"""
        WITH d AS (
          SELECT doc_id,
                 {_B16} % {N_SHARDS} AS shard,
                 len(string_split(text, ' ')) AS n_tok
          FROM documents
        ),
        packed AS (
          SELECT shard, n_tok,
                 CAST(floor(
                   (sum(n_tok) OVER (
                      PARTITION BY shard
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_tok) / {PACK_BUDGET}.0) AS BIGINT) AS pack_id
          FROM d
        )
        SELECT shard, pack_id, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM packed
        GROUP BY shard, pack_id
        ORDER BY shard, pack_id
    """,
    # the global rank the two-pass bucket-offset + within-bucket rank
    # must reproduce bit-for-bit (bucket order is the hash prefix order)
    "corpus_shuffle": """
        SELECT doc_id, lang,
               CAST(row_number() OVER (
                 ORDER BY md5('shuffle:' || CAST(doc_id AS VARCHAR)), doc_id
               ) - 1 AS BIGINT) AS pos
        FROM documents
        ORDER BY pos
    """,
}


def _split_oracle() -> str:
    # cluster labels via the same transitive-closure CTE as
    # dedup_clusters' oracle (see the clique-sensitivity note there);
    # split = md5 bucket of the CLUSTER label, the samplers' idiom
    from .dedup import ORACLES as _DEDUP

    return f"""
        WITH RECURSIVE pairs AS ({_DEDUP["dedup_minhash_lsh"]}),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        lbl AS (
          SELECT d.doc_id,
                 least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster
          FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
          GROUP BY d.doc_id
        )
        SELECT doc_id, cluster,
               CASE WHEN bkt < 80 THEN 'train'
                    WHEN bkt < 90 THEN 'validation'
                    ELSE 'test' END AS split
        FROM (
          SELECT doc_id, cluster,
                 CAST(concat('0x', substring(md5(CAST(cluster AS VARCHAR)), 1, 4))
                      AS INTEGER) % 100 AS bkt
          FROM lbl
        ) t
        ORDER BY doc_id
    """


def _chunk_pack_oracle() -> str:
    """The doc_chunks oracle chained into the pack SQL: units are the
    synthetic chunk ids, sharded by the PARENT doc's md5 bucket."""
    from .text import ORACLES as _TEXT_ORACLES

    return f"""
        WITH chunks AS ({_TEXT_ORACLES["doc_chunks"]}),
        units AS (
          SELECT {_B16} % {N_SHARDS} AS shard,
                 doc_id * 1000000 + chunk_id AS unit,
                 n_chunk_tokens AS n_tok
          FROM chunks
        ),
        packed AS (
          SELECT shard, n_tok,
                 CAST(floor(
                   (sum(n_tok) OVER (
                      PARTITION BY shard
                      ORDER BY md5(CAST(unit AS VARCHAR)), unit
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_tok) / {PACK_BUDGET}.0) AS BIGINT) AS pack_id
          FROM units
        )
        SELECT shard, pack_id, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM packed
        GROUP BY shard, pack_id
        ORDER BY shard, pack_id
    """


ORACLES["corpus_chunk_pack"] = _chunk_pack_oracle()
ORACLES["corpus_split_leakage_safe"] = _split_oracle()


def corpus_split_assign_new(
    spark: SparkSession, sf_dir: str, base_assignment: DataFrame | None = None
) -> DataFrame:
    """Incremental leakage-safe split: assign a NEW batch of documents to
    train/validation/test CONSISTENTLY with an existing corpus's split —
    the append-time twin of :func:`corpus_split_leakage_safe`, the same
    way ``dedup_incremental_lsh`` twins the symmetric pair scan (fixture
    convention shared with it: doc_id >= ``dedup.INCREMENT_SPLIT`` is the
    new batch).

    The rule that keeps BOTH leak directions closed:

    - new docs are clustered among THEMSELVES (min-label components over
      the new-new pair graph) — a new-new near-dup pair can never
      straddle;
    - a new cluster with ANY member near-dupping an existing doc inherits
      that doc's split (anchor = min matched base doc_id, base split =
      the base-only leakage-safe split) — a new copy of a train doc can
      never land in eval;
    - an unanchored cluster hashes its own label, the batch analog of the
      full recompute.

    Per-append cost: the cross pair probe is the incremental band join
    (probe side = batch only) and the new-new closure runs on the BATCH.
    The base split is looked up from ``base_assignment`` when the caller
    passes the persisted ``(doc_id, split)`` table (the production append
    pattern — only the anchor rows are joined, nothing rescans the base
    corpus); without it, this FIXTURE recomputes the base-only clustering
    from the shared pair graph so the driver-checkable query stays
    self-contained on the static tables. The known incremental
    approximation (shared with every anchor-based scheme): a new doc
    bridging TWO base clusters that the full recompute would merge takes
    the min anchor's split; the batch path
    (:func:`corpus_split_leakage_safe` over everything) is the periodic
    reconciliation."""
    from ..caching import bounded_cache
    from .dedup import INCREMENT_SPLIT, _lsh_pairs, min_label_clusters

    docs = load(spark, sf_dir, "documents").select("doc_id")
    # the pair frame feeds THREE filters (base-base, new-new, cross) plus
    # two eagerly-checkpointed closures — cache it once or the whole LSH
    # dataflow re-runs per reference (the duplicate-rate-bounded pair
    # list is tiny; bounded_cache caps the site at one live copy)
    pairs = bounded_cache(
        "sampling.split_pairs", _lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    )
    s = F.lit(INCREMENT_SPLIT)
    base_docs = docs.where(F.col("doc_id") < s)
    new_docs = docs.where(F.col("doc_id") >= s)
    # pairs come doc_a < doc_b and the batch is the high id range, so
    # cross pairs are always (base=doc_a, new=doc_b)
    base_pairs = pairs.where((F.col("doc_a") < s) & (F.col("doc_b") < s))
    new_pairs = pairs.where((F.col("doc_a") >= s) & (F.col("doc_b") >= s))
    cross = pairs.where((F.col("doc_a") < s) & (F.col("doc_b") >= s)).select(
        F.col("doc_b").alias("doc_new"), F.col("doc_a").alias("doc_base")
    )

    if base_assignment is not None:
        base_split = base_assignment.select(
            F.col("doc_id").alias("anchor"), F.col("split").alias("anchor_split")
        )
    else:
        base_split = min_label_clusters(base_docs, base_pairs).select(
            F.col("doc_id").alias("anchor"),
            split_of_cluster(F.col("cluster")).alias("anchor_split"),
        )
    new_lbl = min_label_clusters(new_docs, new_pairs).select("doc_id", "cluster")
    anchors = (
        cross.join(new_lbl, cross.doc_new == new_lbl.doc_id)
        .groupBy("cluster")
        .agg(F.min("doc_base").alias("anchor"))
    )
    # resolve the (few) anchors' splits FIRST — broadcasting the anchor
    # list into the (possibly corpus-sized, when persisted) assignment
    # keeps the lookup anchor-proportional, and the doc-level join then
    # broadcasts only one row per anchored cluster
    anchored = base_split.join(F.broadcast(anchors), "anchor")
    return (
        new_lbl.join(F.broadcast(anchored), "cluster", "left")
        .select(
            "doc_id",
            "cluster",
            "anchor",
            F.coalesce(
                F.col("anchor_split"), split_of_cluster(F.col("cluster"))
            ).alias(
                "split"
            ),
        )
        .orderBy("doc_id")
    )


QUERIES["corpus_split_assign_new"] = corpus_split_assign_new


def _split_assign_oracle() -> str:
    from .dedup import INCREMENT_SPLIT as _S
    from .dedup import ORACLES as _DEDUP

    bucket = (
        "CAST(concat('0x', substring(md5(CAST({c} AS VARCHAR)), 1, 4)) "
        "AS INTEGER) % 100"
    )
    case = (
        "CASE WHEN " + bucket + " < 80 THEN 'train' "
        "WHEN " + bucket + " < 90 THEN 'validation' ELSE 'test' END"
    )
    return f"""
        WITH RECURSIVE pairs AS ({_DEDUP["dedup_minhash_lsh"]}),
        bedges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          WHERE doc_a < {_S} AND doc_b < {_S}
          UNION SELECT doc_b, doc_a FROM pairs
          WHERE doc_a < {_S} AND doc_b < {_S}
        ),
        breach(a, b) AS (
          SELECT a, b FROM bedges
          UNION
          SELECT r.a, e.b FROM breach r JOIN bedges e ON r.b = e.a
        ),
        blbl AS (
          SELECT d.doc_id,
                 least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster
          FROM documents d LEFT JOIN breach r ON r.a = d.doc_id
          WHERE d.doc_id < {_S}
          GROUP BY d.doc_id
        ),
        bsplit AS (
          SELECT doc_id, {case.format(c="cluster")} AS split FROM blbl
        ),
        nedges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          WHERE doc_a >= {_S} AND doc_b >= {_S}
          UNION SELECT doc_b, doc_a FROM pairs
          WHERE doc_a >= {_S} AND doc_b >= {_S}
        ),
        nreach(a, b) AS (
          SELECT a, b FROM nedges
          UNION
          SELECT r.a, e.b FROM nreach r JOIN nedges e ON r.b = e.a
        ),
        nlbl AS (
          SELECT d.doc_id,
                 least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster
          FROM documents d LEFT JOIN nreach r ON r.a = d.doc_id
          WHERE d.doc_id >= {_S}
          GROUP BY d.doc_id
        ),
        anchors AS (
          SELECT n.cluster, min(p.doc_a) AS anchor
          FROM pairs p JOIN nlbl n ON p.doc_b = n.doc_id
          WHERE p.doc_a < {_S} AND p.doc_b >= {_S}
          GROUP BY n.cluster
        )
        SELECT n.doc_id, n.cluster, a.anchor,
               coalesce(bs.split, {case.format(c="n.cluster")}) AS split
        FROM nlbl n
        LEFT JOIN anchors a ON a.cluster = n.cluster
        LEFT JOIN bsplit bs ON bs.doc_id = a.anchor
        ORDER BY n.doc_id
    """


ORACLES["corpus_split_assign_new"] = _split_assign_oracle()
