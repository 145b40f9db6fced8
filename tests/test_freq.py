"""Misra-Gries frequent-items gates: the sketch's deterministic
guarantees checked against the EXACT token counts (stronger than a
cross-engine value diff, which the partitioning-dependent summary content
can't support — same policy as the HLL/PQ tiers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.functions import text as T
from crypto_clickhouse_poc_spark.operators import freq as FQ
from crypto_clickhouse_poc_spark.tables import load
from tests.conftest import SF_CORRECT


def _exact_counts(spark) -> dict[str, int]:
    d = load(spark, SF_CORRECT, "documents").select(
        F.explode(T.tokens(F.col("text"))).alias("token")
    )
    return {
        r["token"]: r["c"]
        for r in d.groupBy("token").agg(F.count("*").alias("c")).collect()
    }


def _merged(spark):
    d = load(spark, SF_CORRECT, "documents").select(
        T.tokens(F.col("text")).alias("toks")
    )
    parts = FQ.mg_partials(d).collect()
    return FQ._merged_summary(parts)


def test_mg_bounds_hold_for_every_token(spark):
    """est ≤ true ≤ est + D for every token in the summary, and
    true ≤ D for every token ABSENT from it (no heavy hitter can hide)."""
    exact = _exact_counts(spark)
    counters, d_total, n_total = _merged(spark)
    assert n_total == sum(exact.values())
    assert d_total <= n_total // (FQ.MG_K + 1)
    for t, est in counters.items():
        assert est <= exact[t] <= est + d_total, t
    for t, c in exact.items():
        if t not in counters:
            assert c <= d_total, (t, c, d_total)


def test_mg_query_top_matches_exact_top_within_bounds(spark):
    """Every exact top token whose count clears the error bound by a
    margin must appear in the sketch's top list, and the emitted
    est/err_bound columns carry the real interval."""
    exact = _exact_counts(spark)
    rows = FQ.corpus_top_tokens_mg(spark, SF_CORRECT).collect()
    assert 0 < len(rows) <= FQ.MG_TOP_N
    d_total = rows[0]["err_bound"]
    got = {r["token"] for r in rows}
    for r in rows:
        assert r["est"] <= exact[r["token"]] <= r["est"] + d_total
    # exact top tokens separated from the top-N cutoff by > 2D cannot be
    # displaced by sketch error
    ranked = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))
    cutoff = ranked[FQ.MG_TOP_N - 1][1] if len(ranked) >= FQ.MG_TOP_N else 0
    for t, c in ranked[: FQ.MG_TOP_N]:
        if c > cutoff + 2 * d_total:
            assert t in got, (t, c)


def test_mg_merge_is_partitioning_independent_in_bounds(spark):
    """Different partitionings give different summaries but the SAME
    guarantees: both merges bound the same exact counts, and their
    err_bounds both respect n/(k+1)."""
    exact = _exact_counts(spark)
    base = load(spark, SF_CORRECT, "documents").select(
        T.tokens(F.col("text")).alias("toks")
    )
    for nparts in (1, 3, 17):
        parts = FQ.mg_partials(base.repartition(nparts)).collect()
        counters, d_total, n_total = FQ._merged_summary(parts)
        assert d_total <= n_total // (FQ.MG_K + 1)
        for t, est in counters.items():
            assert est <= exact[t] <= est + d_total, (nparts, t)


def test_hash_embed_null_text_yields_zero_vector(spark, duck):
    """doc_hash_embed on NULL text must emit the zero vector like its
    oracle's per-element coalesce — not 32 NULLs (r7 review finding)."""
    import os

    from crypto_clickhouse_poc_spark.operators import text as TX

    df = spark.createDataFrame(
        [(1, "alpha beta", "en", "s", 10), (2, None, "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    import tempfile

    sf = tempfile.mkdtemp()
    df.write.parquet(os.path.join(sf, "documents.parquet"))
    rows = {r["doc_id"]: list(r["embedding"])
            for r in TX._hash_embed_frame(spark, sf).collect()}
    assert rows[2] == [0] * TX.HASH_EMBED_DIM
    assert any(v != 0 for v in rows[1])
    duck.execute("DROP VIEW IF EXISTS documents_nulltext")
    duck.execute(
        f"CREATE VIEW documents_nulltext AS SELECT * FROM "
        f"'{os.path.join(sf, 'documents.parquet')}/*.parquet'"
    )
    sql = TX._HASH_EMBED_VEC_SQL.replace("FROM documents", "FROM documents_nulltext")
    want = {r[0]: list(r[1]) for r in duck.sql(sql).fetchall()}
    assert rows == want
    # and the DECLARED (exploded) shape carries the same zero rows: the
    # r9 driver-hashable projection must not drop the NULL-text doc
    flat = {(r["doc_id"], r["dim"]): r["value"]
            for r in TX.doc_hash_embed(spark, sf).collect()}
    assert all(flat[(2, i)] == 0 for i in range(TX.HASH_EMBED_DIM))
    assert len(flat) == 2 * TX.HASH_EMBED_DIM


def test_mg_distributed_merge_equals_driver_loop(spark):
    """mg_merge_topn (the production path) must be bit-identical to the
    driver-loop merge over the SAME partial rows — the uncompressed
    pointwise sum guarantees it, and this gate pins the round-8 rewrite
    (r7 verdict #1: the collect()-based merge grew with partition count)."""
    d = load(spark, SF_CORRECT, "documents").select(
        T.tokens(F.col("text")).alias("toks")
    )
    rows = FQ.mg_partials(d).collect()
    counters, d_total, n_total = FQ._merged_summary(rows)
    want = [
        (t, int(c), int(d_total), int(n_total))
        for t, c in sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))[
            : FQ.MG_TOP_N
        ]
    ]
    parts_df = spark.createDataFrame(rows, "token string, est long, d long, n long")
    got = [
        (r["token"], r["est"], r["err_bound"], r["n_tokens"])
        for r in FQ.mg_merge_topn(parts_df, FQ.MG_TOP_N).collect()
    ]
    assert got == want


def test_mg_query_path_has_no_driver_collect(spark):
    """Plan lock for r7 verdict #1: the declared query's merge is
    distributed — no collect()/toLocalIterator in its source, and the
    physical plan ends in TakeOrderedAndProject over the partials (only
    the final top-N rows reach the driver)."""
    import inspect

    src = inspect.getsource(FQ.corpus_top_tokens_mg) + inspect.getsource(
        FQ.mg_merge_topn
    )
    assert ".collect(" not in src and "toLocalIterator" not in src
    d = load(spark, SF_CORRECT, "documents").select(
        T.tokens(F.col("text")).alias("toks")
    )
    plan = str(
        FQ.mg_merge_topn(FQ.mg_partials(d))._jdf.queryExecution().executedPlan()
    )
    assert "TakeOrderedAndProject" in plan
    assert "MapInPandas" in plan  # partials still feed it lazily, one job


def test_mg_partials_plan_is_map_only(spark):
    d = load(spark, SF_CORRECT, "documents").select(
        T.tokens(F.col("text")).alias("toks")
    )
    plan = str(FQ.mg_partials(d)._jdf.queryExecution().executedPlan())
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_mg_compression_exercised_on_wide_vocabulary(spark):
    """The fixture's ~31-token vocabulary never overflows k=256, so this
    planted Zipf corpus (2000-token vocabulary, k=64) forces real
    compression (D > 0) and checks the guarantees where they actually
    bite: planted heavy hitters survive, bounds hold, absent tokens are
    provably light."""
    import random

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(2000)]
    heavy = vocab[:5]
    docs = []
    for _ in range(300):
        toks = [rng.choice(heavy) for _ in range(20)] + [
            rng.choice(vocab) for _ in range(60)
        ]
        docs.append((toks,))
    df = spark.createDataFrame(docs, "toks array<string>").repartition(7)

    exact: dict = {}
    for (toks,) in docs:
        for t in toks:
            exact[t] = exact.get(t, 0) + 1
    k = 64
    parts = FQ.mg_partials(df, k=k).collect()
    counters, d_total, n_total = FQ._merged_summary(parts)
    assert n_total == sum(exact.values())
    assert 0 < d_total <= n_total // (k + 1)  # compression really happened
    for t, est in counters.items():
        assert est <= exact[t] <= est + d_total, t
    for t, c in exact.items():
        if t not in counters:
            assert c <= d_total, (t, c, d_total)
    # every planted heavy hitter clears D by construction and must appear
    for t in heavy:
        assert t in counters and counters[t] > 0, t


def test_mg_null_token_arrays_are_skipped(spark):
    """NULL text upstream (split(NULL) → NULL array) contributes nothing —
    the exact twin's explode drops such rows too (r7 review: the kernel
    crashed on len(None))."""
    df = spark.createDataFrame(
        [(["a", "b", "a"],), (None,), (["b"],)], "toks array<string>"
    )
    parts = FQ.mg_partials(df, k=8).collect()
    counters, d_total, n_total = FQ._merged_summary(parts)
    assert n_total == 4 and d_total == 0
    assert counters == {"a": 2, "b": 2}


def test_mg_kernel_memory_is_capped_not_vocabulary_sized(spark):
    """A partition whose vocabulary far exceeds the cap must still honor
    the interval bounds — intermediate compressions sum into D (and the
    running counter demonstrably compresses: D > 0 with k=4)."""
    rows = [([f"u{i}"],) for i in range(6000)] + [(["hot"] * 50,)] * 20
    df = spark.createDataFrame(rows, "toks array<string>").coalesce(1)
    k = 4  # cap = 4096 < 6000 distinct → in-kernel compression must fire
    parts = FQ.mg_partials(df, k=k).collect()
    counters, d_total, n_total = FQ._merged_summary(parts)
    assert n_total == 6000 + 1000
    assert 0 < d_total <= n_total // (k + 1)
    exact = {f"u{i}": 1 for i in range(6000)}
    exact["hot"] = 1000
    for t, est in counters.items():
        assert est <= exact[t] <= est + d_total, t
    assert "hot" in counters  # 1000 >> D: the heavy hitter must survive


def test_mg_single_partition_equals_classic_mg_of_whole_stream(spark):
    """On ONE partition the summary is exactly top-k of the true counts
    minus the (k+1)-th count — the Agarwal et al. §3 identity the
    per-partition kernel claims to implement."""
    exact = _exact_counts(spark)
    base = load(spark, SF_CORRECT, "documents").select(
        T.tokens(F.col("text")).alias("toks")
    )
    parts = FQ.mg_partials(base.coalesce(1)).collect()
    counters, d_total, _ = FQ._merged_summary(parts)
    ranked = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))
    sub = ranked[FQ.MG_K][1] if len(ranked) > FQ.MG_K else 0
    want = {t: c - sub for t, c in ranked[: FQ.MG_K] if c - sub > 0}
    assert d_total == sub
    assert counters == want
