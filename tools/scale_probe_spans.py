#!/usr/bin/env python
"""Span-dedup scale probe: multiply the documents fixture N× (disjoint
doc_id spaces; each copy's text is token-permuted by a per-copy rotation so
cross-copy spans don't all collide into one giant dup group) and compare
wall-clock at 1× vs N× for the substring-dedup family. Dev tool (like
tools/scale_probe_ann.py); results recorded in PERF.md's scale-probe
section.

What linearity means here: doc_dup_spans is explode + two hash shuffles +
a rollup — all O(span positions) — so N× docs should cost ~N× work spread
over the same 32 cores: wall-clock growth well UNDER N× until cores
saturate, and never superlinear. A quadratic pair blow-up (the failure
mode this family is designed to avoid) would show immediately as >>N×.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("SCALE_PROBE_MULT", "10"))
QUERIES = [
    "doc_dup_spans",
    "corpus_dup_spans",
    "dup_span_clusters",
    # dataset assembly + retrieval over the same multiplied corpus: the r6
    # corpus_mix two-pass threshold selection and the zero-explode BM25
    # should both stay ~flat (map-dominated) at 10×
    "corpus_sample_stratified",
    "corpus_mix",
    "corpus_bm25_topk",
]


def main() -> None:
    spark = get_spark("scale-probe-spans")
    from crypto_clickhouse_poc_spark import operators

    qs = operators.library_queries()

    big_dir = tempfile.mkdtemp(prefix="span_scale_")
    try:
        d = spark.read.parquet(os.path.join(SF, "documents.parquet"))
        n = d.count()
        shift = n * 10
        # rotate each copy's token order by k: copies keep the same token
        # multiset (same span count, same language stats) but different
        # k-gram spans, so the dup-group size distribution stays fixture-
        # like instead of every span becoming an N-way dup
        toks = F.split(F.col("text"), " ")
        parts = []
        for k in range(MULT):
            # rotate by k mod size: guards docs shorter than MULT tokens
            # (a raw size-k slice length would go negative and error)
            kk = F.pmod(F.lit(k), F.size(toks))
            rot = F.concat(
                F.slice(toks, kk + 1, F.size(toks) - kk),
                F.slice(toks, 1, kk),
            )
            parts.append(
                d.withColumn("doc_id", F.col("doc_id") + F.lit(k * shift)).withColumn(
                    "text", F.array_join(rot, " ")
                )
            )
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(os.path.join(big_dir, "documents.parquet"))
        print(f"# {n} -> {n * MULT} docs", flush=True)

        for label, sfd in (("1x", SF), (f"{MULT}x", big_dir)):
            for name in QUERIES:
                qs[name](spark, sfd).collect()  # warmup (JIT), untimed
                t0 = time.perf_counter()
                rows = len(qs[name](spark, sfd).collect())
                dt = time.perf_counter() - t0
                print(f"# [{label}] {name}: {dt:.2f}s ({rows} rows)", flush=True)
    finally:
        shutil.rmtree(big_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
