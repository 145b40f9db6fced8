"""Incremental ANN index gates (round-8, the FAISS add() pattern):

- appended-index search == full-rebuild search with the SAME frozen
  models (encoding is a pure function of vector + models),
- the append plan scans ONLY the new batch (no corpus or index re-read),
- the drift probe reads ~1.0 for an in-distribution batch and flags
  retraining for a shifted one,
- the persisted read path stays partition-pruned after appends.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.operators import annindex as AX
from crypto_clickhouse_poc_spark.operators import similarity as S


@pytest.fixture(scope="module")
def split_corpus(spark, tmp_path_factory):
    """A training fixture dir (1000 vectors, the 'corpus at index-build
    time') plus an in-distribution append batch (200 more from the same
    generator, fresh ids). Anisotropic like the OPQ corpus so the
    quantizers have structure to drift FROM."""
    rng = np.random.default_rng(29)
    n_a, n_b, d = 1000, 200, 64
    lam = 0.93 ** np.arange(d)
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    x = (rng.standard_normal((n_a + n_b, d)) * np.sqrt(lam)) @ q.T
    sf = str(tmp_path_factory.mktemp("ann_sf"))
    rows = [
        (i, [float(v) for v in x[i]], int(i % 10)) for i in range(n_a)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(2).write.parquet(f"{sf}/embeddings.parquet")
    batch_dir = str(tmp_path_factory.mktemp("ann_batch"))
    spark.createDataFrame(
        [
            (n_a + j, [float(v) for v in x[n_a + j]], int(j % 10))
            for j in range(n_b)
        ],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.parquet(f"{batch_dir}/batch.parquet")
    return sf, f"{batch_dir}/batch.parquet"


def _frozen(spark, sf):
    coarse = S._train_kmeans(spark, sf)
    books = S._train_pq(spark, sf)
    return coarse, books


def test_append_equals_rebuild_with_same_models(spark, split_corpus, tmp_path):
    sf, batch_path = split_corpus
    coarse, books = _frozen(spark, sf)
    base = AX.vectors_from_embeddings(
        spark.read.parquet(f"{sf}/embeddings.parquet")
    )
    batch = AX.vectors_from_embeddings(spark.read.parquet(batch_path))

    inc = str(tmp_path / "inc_index")
    AX.index_build(inc, base, coarse, books)
    AX.index_append(inc, batch, coarse, books)

    full = str(tmp_path / "full_index")
    AX.index_build(full, base.unionAll(batch), coarse, books)

    got = sorted(map(tuple, AX.index_search(spark, sf, inc, books).collect()))
    want = sorted(map(tuple, AX.index_search(spark, sf, full, books).collect()))
    assert got == want and got
    # appended rows really landed (and in the partition directories)
    n_inc = spark.read.parquet(inc).count()
    assert n_inc == base.count() + batch.count()


def test_append_plan_scans_only_the_new_batch(spark, split_corpus, tmp_path):
    """No full-corpus re-encode: the frozen-model encode plan for the
    append references the batch file only — neither the training corpus
    nor the existing index appears in any scan."""
    sf, batch_path = split_corpus
    coarse, books = _frozen(spark, sf)
    batch = AX.vectors_from_embeddings(spark.read.parquet(batch_path))
    enc = AX.encode_for_index(batch, coarse, books)
    plan = str(enc._jdf.queryExecution().executedPlan())
    assert "batch.parquet" in plan
    assert "embeddings.parquet" not in plan
    assert "inc_index" not in plan
    assert "Exchange" not in plan  # map-only, like the bulk encode


def test_drift_probe_flags_shifted_batch(spark, split_corpus):
    sf, batch_path = split_corpus
    coarse, books = _frozen(spark, sf)
    base = AX.vectors_from_embeddings(
        spark.read.parquet(f"{sf}/embeddings.parquet")
    )
    train_err, n_train = AX.quantization_error(base, coarse, books)
    assert n_train == 1000 and train_err > 0

    import tempfile

    batch = AX.vectors_from_embeddings(spark.read.parquet(batch_path))
    with tempfile.TemporaryDirectory() as tmp:
        info = AX.index_append(
            f"{tmp}/idx", batch, coarse, books, train_err=train_err
        )
        assert info["n_appended"] == 200
        # in-distribution: quantizes about as well as the training corpus
        assert info["drift_ratio"] < AX.DRIFT_RETRAIN_RATIO
        assert not info["retrain_due"]

        # shifted batch: same vectors pushed off-distribution
        shifted = batch.withColumn(
            "v", F.transform(F.col("v"), lambda x: x * 3.0 + 2.0)
        ).withColumn("nrm", AX.V.norm(F.col("v")))
        info2 = AX.index_append(
            f"{tmp}/idx2", shifted, coarse, books, train_err=train_err
        )
        assert info2["drift_ratio"] > AX.DRIFT_RETRAIN_RATIO
        assert info2["retrain_due"]


def test_search_after_append_stays_partition_pruned(spark, split_corpus, tmp_path):
    sf, batch_path = split_corpus
    coarse, books = _frozen(spark, sf)
    base = AX.vectors_from_embeddings(
        spark.read.parquet(f"{sf}/embeddings.parquet")
    )
    batch = AX.vectors_from_embeddings(spark.read.parquet(batch_path))
    path = str(tmp_path / "idx")
    AX.index_build(path, base, coarse, books)
    AX.index_append(path, batch, coarse, books)
    out = AX.index_search(spark, sf, path, books)
    plan = str(out._jdf.queryExecution().executedPlan())
    assert "PartitionFilters" in plan
    assert "p_cluster" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
