"""corpus_assemble stage-interaction and plan-shape gates (the value-level
parity vs the chained DuckDB oracle runs in tests/test_oracle_parity.py
like every other oracle-backed query)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.operators import assemble as A
from crypto_clickhouse_poc_spark.operators import curation as C
from crypto_clickhouse_poc_spark.operators.sampling import MIX_WEIGHTS
from crypto_clickhouse_poc_spark.tables import load
from tests.conftest import SF_CORRECT


def test_assemble_plan_shape(spark):
    """No stage may introduce an extra fact-sized shuffle: the chain's
    only exchanges are the documented ones (digest dedup, LSH bands,
    cluster fixpoint, mix histogram/boundary, shard window, final
    rollup+order). Decontamination's gram joins and the contaminated
    anti-join must be BROADCAST (the fact side never becomes a join
    shuffle side), and there must be no sort-merge join, no broadcast
    nested loop, no cartesian product anywhere."""
    # cache=False: inspect the full un-truncated chain (the production
    # path caches the tiny pre-mix survivor frame, which would hide the
    # upstream joins behind an InMemoryTableScan here)
    plan = str(
        A.corpus_assemble(spark, SF_CORRECT, cache=False)
        ._jdf.queryExecution()
        .executedPlan()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # every join in the chain is broadcast — the fact side is NEVER a
    # shuffled join side; this (not the exchange count) is the real
    # "no extra fact-sized shuffle" invariant
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    # the un-cached plan TEXT inlines the shared canonical subtree at each
    # of its references, multiplying exchange occurrences (the production
    # path computes it once through the cache), so the occurrence count is
    # only a coarse runaway guard
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 16, plan.count(
        "Exchange"
    )
    # r17: ZERO range exchanges — the one that was here was the terminal
    # presentation sort (orderBy(shard, pack_id)), removed because every
    # consumer (driver hash, parity gate) canonicalizes row order
    assert len(re.findall(r"Exchange rangepartitioning", plan)) == 0
    assert "Exchange SinglePartition" not in plan


def test_assembled_docs_unique_decontaminated_and_mixed(spark):
    """Interaction invariants on the survivor set: unique doc ids, no
    holdout docs, only weighted languages, exact-dedup holds (no two
    survivors share a content digest), and the mix quotas land within
    floor-rounding of the weight proportions."""
    kept = A.assembled_docs(spark, SF_CORRECT).cache()
    rows = kept.collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert kept.where(C._is_holdout(F.col("doc_id"))).count() == 0
    langs = {r["lang"] for r in rows}
    assert langs <= set(MIX_WEIGHTS)

    docs = load(spark, SF_CORRECT, "documents").select("doc_id", "text")
    joined = kept.join(docs, "doc_id").select(F.md5("text").alias("h"))
    assert joined.distinct().count() == joined.count()

    per_lang = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # n_l = floor(w_l * T) for one common T  =>  n_l / w_l in [T - 1/w_l, T]
    ratios = [per_lang[l] / w for l, w in MIX_WEIGHTS.items() if l in per_lang]
    assert len(ratios) == len(MIX_WEIGHTS)
    assert max(ratios) - min(ratios) <= 1.0 / min(MIX_WEIGHTS.values())
    kept.unpersist()


def test_assemble_accounting_matches_survivor_set(spark):
    """The packed accounting must conserve the survivor set exactly:
    Σ n_docs == |assembled_docs| and Σ n_tokens == Σ n_tok."""
    kept = A.assembled_docs(spark, SF_CORRECT)
    want_docs = kept.count()
    want_toks = kept.agg(F.sum("n_tok")).collect()[0][0]
    out = A.corpus_assemble(spark, SF_CORRECT).agg(
        F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    assert out["d"] == want_docs
    assert out["t"] == want_toks


def test_assemble_repetition_gate_is_live(spark, tmp_path):
    """END-TO-END: a doc that passes the quality gate but exceeds the
    repetition cap must be absent from assembled_docs, while a clean
    control doc from the same corpus survives — proving the drop is the
    repetition gate's, not holdout/contamination/mix fallout."""
    import hashlib
    import os

    from crypto_clickhouse_poc_spark.operators.text import quality_gated

    def b16(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)

    # non-holdout ids only: with no holdout docs the decontamination stage
    # removes nothing, isolating the gates
    ids = [i for i in range(1, 400) if b16(i) >= C.HOLDOUT_BUCKETS][:8]
    spam_id, control_id = ids[0], ids[1]
    # spam: 42 distinct tokens + one token 18x -> n=60, quality
    # 0.4 + 0.3*(43/60) + 0.3 ≈ 0.92 (passes), rep 18/60 = 0.3 (fails)
    spam_text = " ".join([f"filler{i}" for i in range(42)] + ["spamtok"] * 18)
    rows = [(spam_id, spam_text, "en", "s", len(spam_text))]
    for k, i in enumerate(ids[1:]):
        txt = " ".join(f"w{k}x{j}" for j in range(30))  # distinct vocab per doc
        rows.append((i, txt, "en", "s", len(txt)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    sf = str(tmp_path / "repgate")
    df.write.parquet(os.path.join(sf, "documents.parquet"))

    # the spam doc passes the QUALITY gate…
    gq = {r["doc_id"] for r in quality_gated(df).select("doc_id").collect()}
    assert spam_id in gq
    # …but never reaches the assembled output, while the control doc does
    kept = {r["doc_id"] for r in A.assembled_docs(spark, sf, cache=False).collect()}
    assert spam_id not in kept
    assert control_id in kept
