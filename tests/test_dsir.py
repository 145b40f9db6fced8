"""DSIR importance-weighting gates (operators/dsir).

- oracle parity is auto-covered by test_oracle_parity (QUERIES/ORACLES);
  here: the PLANTED-distribution-shift gate — documents drawn from the
  target vocabulary must rank strictly above documents drawn from a
  disjoint raw vocabulary, with mixed docs in between;
- every doc surfaces exactly once (token-less docs at weight 0);
- the weight is a per-token sum: duplicating a target-like doc's text
  scales its weight up (count features, not presence features).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.operators import dsir
from tests.conftest import SF_CORRECT

TGT_WORDS = "alpha beta gamma delta epsilon"
RAW_WORDS = "zork quux fnord blarg wibble"


def _planted(spark):
    rows = []
    # 10 target docs (lang en) over the target vocabulary
    for i in range(10):
        rows.append((i, f"{TGT_WORDS} {TGT_WORDS.split()[i % 5]}", "en"))
    # 10 raw-only docs over a disjoint vocabulary
    for i in range(10, 20):
        rows.append((i, f"{RAW_WORDS} {RAW_WORDS.split()[i % 5]}", "zz"))
    # 3 mixed docs
    for i in range(20, 23):
        rows.append((i, f"{TGT_WORDS} {RAW_WORDS}", "zz"))
    # 1 token-less doc
    rows.append((23, None, "zz"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_planted_shift_ranks_target_like_docs_first(spark):
    docs = _planted(spark)
    w = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir.dsir_weights_frame(docs).collect()
    }
    assert len(w) == 24  # every doc surfaces, incl. the token-less one
    assert w[23] == 0.0
    tgt = [w[i] for i in range(10)]
    raw = [w[i] for i in range(10, 20)]
    mixed = [w[i] for i in range(20, 23)]
    # strict separation: every target doc above every mixed doc above
    # every raw doc — the selection ordering DSIR promises
    assert min(tgt) > max(mixed) > max(raw)
    assert min(tgt) > 0 > max(raw)


def test_weights_are_count_features_not_presence(spark):
    docs = _planted(spark)
    doubled = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") == 0, F.concat_ws(" ", "text", "text")
        ).otherwise(F.col("text")),
    )
    w0 = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir.dsir_weights_frame(docs).collect()
    }
    w1 = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir.dsir_weights_frame(doubled).collect()
    }
    # doubling a target-like doc's text ~doubles its (positive) weight
    # (not exactly 2x: the doc itself shifts the raw model a little)
    assert w1[0] > 1.5 * w0[0] > 0


def test_fixture_run_is_deterministic_and_total(spark):
    a = dsir.corpus_dsir_weights(spark, SF_CORRECT)
    import duckdb

    n_docs = duckdb.connect().execute(
        f"SELECT count(*) FROM '{SF_CORRECT}/documents.parquet'"
    ).fetchone()[0]
    rows = a.collect()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
