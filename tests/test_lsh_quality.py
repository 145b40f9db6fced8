"""Algorithmic quality of the MinHash-LSH pipeline on a NON-degenerate
corpus (the fixture's word-soup docs all look alike; this synthesizes a
realistic one): planted near-duplicates must be recovered (recall) and
unrelated docs must not pair (precision is exact by construction — the
pipeline verifies true jaccard, so any emitted pair IS >= the threshold;
what LSH can lose is recall)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    lsh_pairs_from_shingles,
    shingles,
)


def _corpus(seed: int, n_base: int = 60, n_dups: int = 20, vocab: int = 2000):
    """Base docs of ~80 distinct tokens from a large vocab (near-disjoint
    pairs), plus perturbed copies at ~95% overlap (true jaccard ≈ 0.9)."""
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs, truth = [], set()
    for i in range(n_base):
        toks = rng.sample(words, 80)
        docs.append((i, " ".join(toks)))
    for k in range(n_dups):
        src = k  # perturb the first n_dups base docs
        toks = docs[src][1].split()
        keep = toks[:]
        for _ in range(4):  # swap 4 of 80 tokens (~0.905 jaccard)
            keep[rng.randrange(len(keep))] = rng.choice(words)
        dup_id = 1000 + k
        docs.append((dup_id, " ".join(keep)))
        truth.add((src, dup_id))
    return docs, truth


@pytest.mark.parametrize("seed", [1, 2])
def test_lsh_finds_planted_near_dups(spark, seed):
    docs, truth = _corpus(seed)
    df = spark.createDataFrame(docs, "doc_id long, text string").select(
        "doc_id", shingles(F.col("text")).alias("toks")
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_pairs_from_shingles(df).collect()
    }
    # every emitted pair is exact-verified >= threshold (precision exact);
    # planted dups may fall below threshold if perturbation overshoots, so
    # score recall only on planted pairs whose TRUE jaccard >= threshold
    toks = {r["doc_id"]: set(r["toks"]) for r in df.collect()}
    eligible = {
        (a, b)
        for (a, b) in truth
        if len(toks[a] & toks[b]) / len(toks[a] | toks[b]) >= JACCARD_THRESHOLD
    }
    assert len(eligible) >= 10  # the corpus actually plants hard positives
    found = eligible & pairs
    recall = len(found) / len(eligible)
    assert recall >= 0.9, f"LSH recall {recall:.2f} below 0.9"
    # no unrelated base pair sneaks in (true jaccard ~0 on a 2000-word vocab)
    false_pairs = {p for p in pairs if p not in truth}
    assert not false_pairs


def _vec_corpus(seed: int, n_base: int = 60, n_dups: int = 20, dim: int = 64):
    """Random unit-ish gaussian vectors (unrelated pairs concentrate near
    cosine 0 at dim 64), plus noise-perturbed copies at cosine ~0.97."""
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    rows, truth = [], set()
    for i in range(n_base):
        rows.append((i, [float(x) for x in base[i]]))
    for k in range(n_dups):
        noisy = base[k] + 0.15 * rng.standard_normal(dim)  # cos ≈ 0.97-0.99
        dup_id = 1000 + k
        rows.append((dup_id, [float(x) for x in noisy]))
        truth.add((k, dup_id))
    return rows, truth


@pytest.mark.parametrize("seed", [1, 2])
def test_srp_lsh_finds_planted_near_dup_vectors(spark, seed):
    import numpy as np

    from crypto_clickhouse_poc_spark.operators.dedup import (
        COSINE_THRESHOLD,
        srp_pairs,
    )

    rows, truth = _vec_corpus(seed)
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    pairs = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in srp_pairs(df).collect()}

    vecs = {i: np.array(v) for i, v in rows}

    def cos(a, b):
        return float(
            vecs[a] @ vecs[b] / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))
        )

    # precision is exact by construction: every emitted pair's TRUE cosine
    # passes the threshold (the band join only proposes, the verify decides)
    for (a, b), c in pairs.items():
        assert cos(a, b) >= COSINE_THRESHOLD - 1e-9, (a, b, c)

    # recall on the planted strong pairs (cosine ~0.97 ⇒ SRP collision
    # probability ≈ 0.99 with 4 bands of 4 bits)
    found = truth & pairs.keys()
    recall = len(found) / len(truth)
    assert recall >= 0.85, f"SRP-LSH recall {recall:.2f} below 0.85"


def test_phash_finds_planted_perturbed_images(spark):
    """dHash near-dup pairs on planted perturbations: byte payloads with a
    few flipped bytes must pair with their originals at small hamming;
    unrelated random payloads must not (verify is exact, so precision is
    by construction — what banding can lose is recall)."""
    import random

    from crypto_clickhouse_poc_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        phash_pairs,
    )

    rng = random.Random(5)
    rows, truth = [], set()
    for i in range(40):
        base = bytes(rng.randrange(256) for _ in range(400))
        rows.append((i, base))
        if i < 15:  # planted near-dup: flip 3 bytes slightly
            b = bytearray(base)
            for _ in range(3):
                p = rng.randrange(len(b))
                b[p] = (b[p] + 4) % 256
            rows.append((1000 + i, bytes(b)))
            truth.add((i, 1000 + i))
    images = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in phash_pairs(images).collect()
    }
    assert all(h <= PHASH_HAMMING_MAX for h in got.values())
    recall = len(truth & got.keys()) / len(truth)
    assert recall >= 0.85, f"phash recall {recall:.2f}"
    # no unrelated base pairs sneak in (they differ in ~half their bits)
    unrelated = [(a, b) for (a, b) in got if a < 1000 and b < 1000]
    assert not unrelated, unrelated

    # clustering over the same planted graph: each recovered pair collapses
    # into one cluster with the base id as canonical
    from crypto_clickhouse_poc_spark.operators.dedup import min_label_clusters
    from pyspark.sql import functions as F

    pairs_df = phash_pairs(images).select(
        F.col("media_a").alias("doc_a"), F.col("media_b").alias("doc_b")
    )
    nodes = images.select(F.col("media_id").alias("doc_id"))
    cl = {r["doc_id"]: r["cluster"] for r in min_label_clusters(nodes, pairs_df).collect()}
    for a, b in truth & got.keys():
        assert cl[b] == cl[a] == a  # dup joins its base's cluster, base canonical


def test_kmeans_training_improves_objective(spark):
    """Lloyd rounds must improve the spherical k-means objective (mean
    cosine of each vector to its assigned centroid) over the raw seeds,
    and the trained assignment must populate more than one cluster."""
    from crypto_clickhouse_poc_spark.functions import vectors as V
    from crypto_clickhouse_poc_spark.operators import similarity as S
    from tests.conftest import SF_SMOKE as _SF

    def objective(rounds: int) -> tuple[float, int]:
        cent = S._kmeans_centroids(spark, _SF, rounds=rounds)
        e = S._vectors(spark, _SF)
        cos = V.dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm"))
        best = (
            e.crossJoin(F.broadcast(cent))
            .withColumn("cos_c", cos)
            .groupBy("vec_id")
            .agg(F.max("cos_c").alias("best"), F.max_by("cid", "cos_c").alias("cid"))
        )
        row = best.agg(
            F.avg("best").alias("obj"), F.countDistinct("cid").alias("k_used")
        ).collect()[0]
        return float(row["obj"]), int(row["k_used"])

    obj_seed, _ = objective(0)
    obj_trained, k_used = objective(S.KMEANS_ROUNDS)
    assert obj_trained > obj_seed
    assert k_used > 1


def test_repeated_invocations_keep_storage_bounded(spark):
    """The per-invocation caches inside the LSH/SRP queries must not
    accumulate: each call-site keeps at most ONE live cached RDD, so a
    long-lived session (serving, bench) has flat storage memory no matter
    how many times the queries run."""
    from crypto_clickhouse_poc_spark import caching
    from crypto_clickhouse_poc_spark.operators import dedup, similarity
    from tests.conftest import SF_SMOKE as _SF

    def n_persistent() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    baseline = n_persistent()
    live_baseline = caching.live_cache_count()
    for _ in range(3):
        dedup.dedup_minhash_lsh(spark, _SF).count()
        dedup.dedup_embedding_lsh(spark, _SF).count()
        similarity.ann_srp_search(spark, _SF).count()
    # one live cache per call site, not per invocation (delta-based: other
    # queries' call sites — e.g. corpus_assemble's — may hold their one
    # live cache from earlier tests in the session)
    assert n_persistent() - baseline <= 3
    assert caching.live_cache_count() - live_baseline <= 3


def test_repeated_identical_invocations_keep_the_cache_alive(spark):
    """The r10 self-eviction find: an IDENTICAL re-invocation's cache()
    dedupes to the same CacheManager entry, so unpersisting the 'previous'
    handle killed the entry the new handle adopted — every warm repeat of
    a bounded_cache query (bench's median-of-3, serving) ran uncached.
    bounded_cache now keeps semantically-equal entries; gate: the frame is
    still cached after a repeat call."""
    from crypto_clickhouse_poc_spark import caching
    from tests.conftest import SF_SMOKE as _SF

    d = spark.read.parquet(f"{_SF}/region.parquet")
    first = caching.bounded_cache("test_same_key", d.select("r_name"))
    first.count()  # materialize the entry
    second = caching.bounded_cache("test_same_key", d.select("r_name"))
    assert second.storageLevel.useMemory  # entry survived the repeat
    assert first.storageLevel.useMemory  # shared entry, not re-created
    # a DIFFERENT plan under the same key still evicts the old one
    third = caching.bounded_cache("test_same_key", d.select("r_regionkey"))
    third.count()
    assert not first.storageLevel.useMemory
    third.unpersist()
    caching._LIVE.pop("test_same_key", None)


def test_pq_training_reduces_quantization_error(spark):
    """Lloyd rounds on the sub-codebooks must reduce mean L2 quantization
    error of the residuals vs the raw seed codebooks (rounds=0)."""
    from crypto_clickhouse_poc_spark.operators import similarity as S
    from tests.conftest import SF_SMOKE as _SF

    import numpy as np

    coarse = S._train_kmeans(spark, _SF)
    rows = S._vectors(spark, _SF).select("vec_id", "v", "nrm").collect()
    Vm = np.array([list(r["v"]) for r in rows])
    C = np.array([c[1] for c in coarse])
    cn = np.array([c[2] for c in coarse])
    nrm = np.array([r["nrm"] for r in rows])
    R = Vm - C[np.argmax((Vm @ C.T) / np.outer(nrm, cn), axis=1)]
    sub_d = 64 // S.PQ_M

    def err(books) -> float:
        total = 0.0
        for m, book in enumerate(books):
            sub = R[:, m * sub_d : (m + 1) * sub_d]
            B = np.array(book)
            d2 = ((sub[:, None, :] - B[None, :, :]) ** 2).sum(-1)
            total += d2.min(axis=1).sum()
        return total / len(R)

    e_seed = err(S._train_pq(spark, _SF, rounds=0))
    e_trained = err(S._train_pq(spark, _SF))
    assert e_trained < e_seed


def test_ivf_pq_rerank_is_exact_and_recalls_probed_topk(spark):
    """IVF-PQ contract: (a) emitted cosines are EXACT (the rerank recomputes
    full-precision cosine, so every (query, neighbor) pair it shares with
    the brute-force baseline carries the identical score); (b) ADC
    truncation loses little vs the exact probed search (recall >= 0.8 —
    same probed cluster, only the shortlist differs)."""
    from crypto_clickhouse_poc_spark.operators import similarity as S
    from tests.conftest import SF_SMOKE as _SF

    pq_rows = S.ann_ivf_pq_search(spark, _SF).collect()
    assert len(pq_rows) > 0
    pq = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in pq_rows}
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in S.ann_topk_brute(spark, _SF).collect()
    }
    overlap = pq.keys() & brute.keys()
    assert overlap and all(abs(pq[k] - brute[k]) < 1e-12 for k in overlap)
    ivf = {(r["query_id"], r["neighbor_id"]) for r in S.ann_ivf_search(spark, _SF).collect()}
    recall = len(ivf & pq.keys()) / len(ivf)
    assert recall >= 0.8, f"IVF-PQ recall {recall:.2f} vs exact probed search"
    # nprobe=2: recall vs the EXACT top-k must not drop below nprobe=1
    # (more probed clusters can only widen the candidate pool)
    brute_pairs = set(brute.keys())
    mp = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ann_ivf_pq_search_multiprobe(spark, _SF).collect()
    }
    r1 = len(brute_pairs & pq.keys()) / len(brute_pairs)
    r2 = len(brute_pairs & mp) / len(brute_pairs)
    assert r2 >= r1, f"multi-probe recall {r2:.2f} below single-probe {r1:.2f}"


def test_kmeans_memo_is_deterministic(spark):
    """The memoized trained index rebuilds byte-identically to a fresh
    training run (memo cleared between the two)."""
    from crypto_clickhouse_poc_spark.operators import similarity as S
    from tests.conftest import SF_SMOKE as _SF

    S._CENTROID_MEMO.clear()
    first = sorted(map(tuple, S._kmeans_centroids(spark, _SF).collect()))
    memod = sorted(map(tuple, S._kmeans_centroids(spark, _SF).collect()))
    S._CENTROID_MEMO.clear()
    retrained = sorted(map(tuple, S._kmeans_centroids(spark, _SF).collect()))
    assert first == memod == retrained
