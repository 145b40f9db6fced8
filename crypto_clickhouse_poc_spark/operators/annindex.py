"""Incremental maintenance of the persisted IVF-PQ/OPQ index.

``dedup_incremental_lsh`` covers the production append pattern for text;
this module covers it for the vector tier. Retraining the coarse
centroids + codebooks on every batch of new vectors would re-encode the
whole corpus — at 100 TB that is a full index rebuild per ingest cycle.
The standard alternative (FAISS's ``IndexIVFPQ.add()``): FREEZE the
trained models and

1. encode ONLY the new batch against the frozen coarse centroids +
   codebooks (the same Arrow kernel the bulk build uses — map-only over
   the batch, nothing else is scanned),
2. append the encoded rows to the persisted cluster-partitioned index
   (parquet append into the ``p_cluster=`` directories — readers see the
   new codes through the same PartitionFilters probe, no rewrite),
3. emit a DRIFT PROBE: the batch's mean quantization error vs the
   frozen models' training-corpus error. Frozen quantizers are only
   valid while new data resembles the training distribution; a drifting
   corpus quantizes progressively worse and silently degrades recall.
   The ratio makes that visible and flags when retraining is due —
   the monitoring half of the FAISS add() contract that add() itself
   doesn't give you.

Append correctness is exact, not approximate: encoding is a pure
function of (vector, frozen models), so append-then-search equals
rebuild-with-the-same-models-then-search bit-for-bit (pytest-gated in
``tests/test_annindex.py``, along with the no-full-corpus-re-encode plan
lock and the drift probe's behavior on an in-distribution batch vs a
shifted one).

Like the PQ/OPQ tiers there is no SQL oracle (frozen-model encode is an
argmin over trained float codebooks); the gates compare Spark against
Spark (append vs rebuild) and numpy (error values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vectors as V
from .similarity import PQ_M, _pq_adc_rerank, _pq_encode, _pq_query_side

#: batch-error / training-error ratio above which retraining is flagged.
#: 1.0 = batch quantizes exactly as well as the training corpus; the
#: headroom absorbs sampling noise of a small batch.
DRIFT_RETRAIN_RATIO = 1.5


def vectors_from_embeddings(df: DataFrame) -> DataFrame:
    """(vec_id, embedding) → the (vec_id, v, nrm) frame every ANN kernel
    consumes (same shape as ``similarity._vectors`` without the fixture
    load)."""
    return df.select(
        "vec_id", V.as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", V.norm(F.col("v")))


def quantization_error(
    e: DataFrame,
    coarse: list[tuple],
    books: list[list[list[float]]],
    rotation: list[list[float]] | None = None,
) -> tuple[float, int]:
    """Mean L2² PQ quantization error of ``e``'s vectors against FROZEN
    (coarse, books), measured against the EXACT encoding the index stores:
    the assignment/rotation/argmin all come from ``_pq_encode`` itself
    (one shared kernel — the r8 review found an earlier hand-rolled copy
    that could silently diverge from the stored codes if the encode
    convention ever changed), and this pass just sums ‖r_sub − B[code]‖²
    over the emitted (r, code) rows. One extra Arrow map stage with a
    (err_sum, n) partial per partition — O(1) rows out per partition."""

    enc = _pq_encode(e, coarse, books, with_residual=True, rotation=rotation)

    def kernel(batches):
        import numpy as np
        import pandas as pd

        B = [np.array(b, dtype=np.float64) for b in books]
        sub_d = B[0].shape[1]
        err, n = 0.0, 0
        for pdf in batches:
            if not len(pdf):
                continue
            R = np.array(pdf["r"].tolist(), dtype=np.float64)
            codes = np.array(pdf["code"].tolist(), dtype=np.int64)
            for m in range(PQ_M):
                sub = R[:, m * sub_d : (m + 1) * sub_d]
                err += float(((sub - B[m][codes[:, m]]) ** 2).sum())
            n += len(pdf)
        if n:
            yield pd.DataFrame({"err_sum": [err], "n": [n]})

    parts = (
        enc.select("r", "code")
        .mapInPandas(kernel, "err_sum double, n long")
        .groupBy()
        .agg(F.sum("err_sum").alias("e"), F.sum("n").alias("n"))
        .collect()[0]
    )
    n = int(parts["n"] or 0)
    return (float(parts["e"]) / n if n else 0.0), n


def encode_for_index(
    vectors: DataFrame,
    coarse: list[tuple],
    books: list[list[list[float]]],
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """Frozen-model encode of a vector frame in the persisted-index schema
    (adds the ``p_cluster`` partition column). Map-only over ``vectors``
    — the plan scans nothing else (locked in tests)."""
    return _pq_encode(vectors, coarse, books, rotation=rotation).withColumn(
        "p_cluster", F.col("cluster")
    )


def index_build(
    path: str,
    vectors: DataFrame,
    coarse: list[tuple],
    books: list[list[list[float]]],
    rotation: list[list[float]] | None = None,
) -> None:
    """Bulk-build the cluster-partitioned index at ``path`` (the
    explicit-path sibling of ``similarity._pq_table``'s cached fixture
    index, for deployments that manage their own index locations)."""
    encode_for_index(vectors, coarse, books, rotation).write.mode(
        "overwrite"
    ).partitionBy("p_cluster").parquet(path)


def index_append(
    path: str,
    new_vectors: DataFrame,
    coarse: list[tuple],
    books: list[list[list[float]]],
    rotation: list[list[float]] | None = None,
    train_err: float | None = None,
) -> dict:
    """The FAISS ``add()`` pattern: frozen-model-encode ONLY ``new_vectors``
    and append into the index's partition directories, then report drift.

    Returns ``{"n_appended", "batch_err", "train_err", "drift_ratio",
    "retrain_due"}``; ``train_err`` is the frozen models' mean
    quantization error on their training corpus (pass the value recorded
    at training time; at 100 TB you do NOT want to rescan the corpus per
    append — ``quantization_error`` over the training set computes it
    once). With no ``train_err`` the drift fields are None (append still
    happens — monitoring is optional, appending is not)."""
    enc = encode_for_index(new_vectors, coarse, books, rotation)
    enc.write.mode("append").partitionBy("p_cluster").parquet(path)
    batch_err, n = quantization_error(new_vectors, coarse, books, rotation)
    ratio = None if train_err in (None, 0.0) else batch_err / train_err
    return {
        "n_appended": n,
        "batch_err": batch_err,
        "train_err": train_err,
        "drift_ratio": ratio,
        "retrain_due": bool(ratio is not None and ratio > DRIFT_RETRAIN_RATIO),
    }


def index_search(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    books: list[list[list[float]]],
    rotation: list[list[float]] | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """Probe an explicit-path persisted index (built + appended above):
    partition-pruned read of the probed clusters, then the shared ADC →
    exact-rerank dataflow."""
    _, _, probed = _pq_query_side(spark, sf_dir, nprobe, books, rotation)
    index = spark.read.parquet(path).where(F.col("p_cluster").isin(probed))
    return _pq_adc_rerank(
        spark, sf_dir, index, nprobe=nprobe, books=books, rotation=rotation
    )


# Citation note: the reference repo (crypto-clickhouse-POC) has no vector
# tier; this extends SURVEY.md §8.2. The add()+drift pattern follows the
# public FAISS IndexIVF contract (add encodes against the frozen
# quantizer; retraining cadence is the operator's problem).
