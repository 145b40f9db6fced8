"""Unigram-LM perplexity gates: value parity is covered by
tests/test_oracle_parity.py; these check the scorer actually ranks
off-distribution text as such (the property the gate exists for)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.operators import text as TX
from crypto_clickhouse_poc_spark.tables import load
from tests.conftest import SF_CORRECT


def test_off_distribution_doc_scores_highest_ppl(spark):
    """Plant one gibberish doc into the fixture corpus: trained on the
    mixture, the LM must assign it the highest perplexity (every one of
    its tokens is a hapax; real docs share the corpus vocabulary)."""
    d = load(spark, SF_CORRECT, "documents")
    planted = spark.createDataFrame(
        [(999999, "qzx vbn wrt plm kjh dfg", "xx", "synthetic", 23)],
        d.schema,
    )
    sf = tempfile.mkdtemp()
    d.unionByName(planted).write.parquet(os.path.join(sf, "documents.parquet"))
    rows = TX.doc_unigram_logppl(spark, sf).collect()
    top = max(rows, key=lambda r: r["ppl"])
    assert top["doc_id"] == 999999
    # and it is not a photo-finish: gibberish ppl beats the in-distribution
    # maximum by a wide margin
    second = max(r["ppl"] for r in rows if r["doc_id"] != 999999)
    assert top["ppl"] > 2 * second


def test_n_tokens_matches_doc_stats(spark):
    """The scorer's token accounting agrees with doc_stats' (same split)."""
    ppl = {
        r["doc_id"]: r["n_tokens"]
        for r in TX.doc_unigram_logppl(spark, SF_CORRECT).collect()
    }
    stats = {
        r["doc_id"]: r["n_tokens"]
        for r in TX.doc_stats(spark, SF_CORRECT).collect()
        if r["n_tokens"] is not None
    }
    assert ppl == {k: v for k, v in stats.items() if k in ppl}
