#!/usr/bin/env python
"""Regenerate PLANS.md: live `.explain('formatted')` output at sf0.01 for
the headline queries whose physical shapes the docs discuss (and
tests/test_plans.py locks)."""

from __future__ import annotations

SECTIONS = [
    (
        "tpch_q3",
        "dim filter pushed to the customer scan; two BroadcastHashJoins; "
        "TakeOrderedAndProject top-K.",
    ),
    (
        "tpch_q19",
        "each OR-of-ANDs leg split and pushed to BOTH scans (PushedFilters on "
        "part and lineitem).",
    ),
    (
        "ev_ohlcv_1m",
        "single hash-aggregate pass (partial/final) over a pruned 5-column "
        "scan; broadcast single-row anchor.",
    ),
    (
        "asof_last_click_price",
        "NO join operator: union-tag sweep = one user_id shuffle + window.",
    ),
    (
        "dedup_minhash_summary",
        "4 first-collision band joins (hash joins, never BNL); cached "
        "signature table (InMemoryTableScan); no pair-set shuffle.",
    ),
    (
        "dedup_embedding_lsh",
        "SRP sketch as per-row literal-array dot folds; 4 int-keyed band "
        "hash joins (never BNL); cosine verify is a map-side projection.",
    ),
    (
        "ev_layout_pruned",
        "month-partitioned read path: PartitionFilters on p_month (directory "
        "pruning) + PushedFilters on ts (row-group skipping) + single-key "
        "window dedup.",
    ),
    (
        "mm_byte_features",
        "shuffle-free: scan -> project -> MapInPandas, nothing else.",
    ),
    (
        "ann_ivf_assign",
        "r5 shuffle-free assign: per-row fold over inlined centroid "
        "literals (no crossJoin, no window); the only Exchange is the "
        "final contingency groupBy.",
    ),
    (
        "ann_ivf_pq_probe_pruned",
        "r5 IVF-PQ serving path: PartitionFilters on p_cluster (probe "
        "reads ~nprobe/k of the persisted index), ADC lookup fold, "
        "broadcast query side, exact rerank on the shortlist only.",
    ),
    (
        "doc_dup_spans",
        "r6 exact substring dedup: spans explode to 64-bit xxhash64 inside "
        "the Generate; every Exchange partitions on (hash, doc_id) ints — "
        "span text never shuffles; the per-span doc count joins back via "
        "an AQE-skew-splittable equi-join, not a hot-key window.",
    ),
    (
        "corpus_bm25_topk",
        "r6 BM25: term frequencies are map-side array folds (no Generate); "
        "corpus stats are ONE single-row aggregate broadcast back over the "
        "scan; top-20 is TakeOrderedAndProject.",
    ),
    (
        "ev_user_hll",
        "r6 DataSketches HLL: partial hll_sketch_agg below the Exchange "
        "(ObjectHashAggregate) — shuffle volume is groups x 4KB sketch, "
        "not rows.",
    ),
    (
        "corpus_hybrid_rrf",
        "r8 hybrid retrieval: BM25 branch (two scans + 1-row broadcast) "
        "and map-only integer-cosine branch, each ending in a TakeOrdered; "
        "fusion is a Union + hash agg over <= 2N rows — no Generate, no "
        "cartesian, no SMJ.",
    ),
    (
        "dedup_semantic",
        "r8 SemDeDup: assignment is the shuffle-free centroid-literal fold; "
        "the pair stage is an equi-join ON THE CLUSTER ID (hash join, "
        "AQE-splittable) — pair work sum(|cluster|^2), never n^2.",
    ),
    (
        "doc_bpe_tokens",
        "r8 learned-BPE token counts: corpus-side work is one explode + "
        "broadcast vocabulary join + hash agg; segmentation cost lives on "
        "the DISTINCT-word table, not the corpus.",
    ),
    (
        "doc_chunks",
        "r10-declared context-window chunking: ONE scan + posexplode with "
        "the token array riding along — zero exchanges end to end.",
    ),
    (
        "corpus_dsir_weights",
        "r10 DSIR importance weights: one explode + (doc,bucket)-keyed "
        "map-side-combined agg; the bucket stats/totals/scores are "
        "<=64-row broadcasts, so the only data-sized stage is the scan.",
    ),
]


def main() -> None:
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from crypto_clickhouse_poc_spark import operators
    from crypto_clickhouse_poc_spark.session import get_spark

    spark = get_spark("gen-plans")
    qs = operators.library_queries()
    out = [
        "# PLANS — generated physical plans (sf0.01, `.explain('formatted')`)",
        "",
        "Regenerate: `python tools/gen_plans.py` — each section is the live",
        "`queryExecution().explainString('formatted')` at sf0.01.",
        "",
    ]
    for name, note in SECTIONS:
        df = qs[name](spark, "/root/testdata/sf0.01")
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", f"*{note}*", "```", plan.rstrip(), "```", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SECTIONS)} sections)")


if __name__ == "__main__":
    main()
