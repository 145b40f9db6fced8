"""SemDeDup (k-means-bucketed semantic dedup, Abbas et al. 2023) gates.

DuckDB value parity runs in test_oracle_parity; these tests pin the
semantic contracts: subset-of-brute-force, planted-strong-dup recall,
keep-policy arithmetic, and the plan shape (equi-join blocking, never a
cartesian pair scan)."""

from __future__ import annotations

import math

import pytest

from crypto_clickhouse_poc_spark.operators import dedup as D
from tests.conftest import SF_SMOKE

from tests.test_lsh_quality import _vec_corpus


def test_semantic_pairs_subset_of_brute_force(spark):
    """Every SemDeDup pair is a brute-force pair with the IDENTICAL cosine:
    clustering only blocks, the verify arithmetic is shared."""
    brute = {(r.vec_a, r.vec_b): r.cosine for r in D.dedup_embedding(spark, SF_SMOKE).collect()}
    sem = {(r.vec_a, r.vec_b): r.cosine for r in D.dedup_semantic(spark, SF_SMOKE).collect()}
    assert sem, "no within-cluster pairs on the fixture"
    assert set(sem) <= set(brute)
    for p, c in sem.items():
        assert math.isclose(c, brute[p], abs_tol=1e-9)


@pytest.mark.parametrize("seed", [1, 2])
def test_semantic_recall_on_planted_strong_dups(spark, seed):
    """Near-identical vectors (cosine ≈ 0.97) co-assign to the same
    centroid for essentially any centroid set, so planted strong dups are
    recovered — the paper's premise. Centroids: 4 of the base vectors
    (deterministic); recall floor 0.9 (a planted pair is missed only when
    base vector and its perturbation straddle a cluster boundary)."""
    import numpy as np

    rows, truth = _vec_corpus(seed)
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = []
    for cid, (vid, v) in enumerate(rows[:4]):
        cents.append((cid, v, float(np.linalg.norm(np.array(v)))))
    pairs = {
        (r.vec_a, r.vec_b)
        for r in D.semantic_pairs(df, cents)
        .where("cosine >= 0.9")
        .collect()
    }
    recall = len(truth & pairs) / len(truth)
    assert recall >= 0.9, f"SemDeDup recall {recall:.2f} below 0.9"


def test_keep_policy_removes_the_centroid_closer_member(spark):
    """The verdict recomputes from the pairs: per pair the member with the
    HIGHER centroid cosine (tie → higher vec_id) is removed, so no pair
    survives with both endpoints kept, and the removed set is exactly the
    union of per-pair losers."""
    raw = D._semantic_pairs(spark, SF_SMOKE).collect()
    want_removed = set()
    for r in raw:
        if r.accos > r.bccos or (r.accos == r.bccos and r.vec_a > r.vec_b):
            want_removed.add(r.vec_a)
        else:
            want_removed.add(r.vec_b)
    verdict = {r.vec_id: r.removed for r in D.dedup_semantic_keep(spark, SF_SMOKE).collect()}
    members = {v for r in raw for v in (r.vec_a, r.vec_b)}
    assert set(verdict) == members
    assert {v for v, rm in verdict.items() if rm} == want_removed
    for r in raw:  # no surviving pair
        assert verdict[r.vec_a] or verdict[r.vec_b]


def test_semantic_plan_blocks_via_cid_equi_join(spark):
    """Assignment is a shuffle-free fold over inlined centroid literals;
    the pair stage is an equi-join ON THE CLUSTER ID — never a cartesian
    or broadcast-nested-loop pair scan, and no Python kernels."""
    df = D.dedup_semantic(spark, SF_SMOKE)
    plan = str(df._jdf.queryExecution().executedPlan())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "cid" in plan  # the blocking key is in the join
