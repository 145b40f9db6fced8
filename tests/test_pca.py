"""PCA / whitening family (operators/embed.py): numpy ground-truth parity,
basis invariants, partitioning invariance, and the projection plan shape.

PCA isn't SQL-expressible (no eigensolver in DuckDB), so this file IS the
correctness gate for the family — the distributed moment pass is checked
against a single-machine numpy PCA on the identical data, which is exactly
the oracle role DuckDB plays elsewhere.
"""

from __future__ import annotations

import numpy as np
import pytest

from crypto_clickhouse_poc_spark.operators import embed, similarity
from crypto_clickhouse_poc_spark.tables import load
from tests.conftest import SF_CORRECT, SF_SMOKE


@pytest.fixture(scope="module")
def fixture_matrix(spark):
    e = load(spark, SF_CORRECT, "embeddings").select("vec_id", "embedding").collect()
    e = sorted(e, key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in e])
    x = np.array([r["embedding"] for r in e], dtype=np.float64)
    return ids, x


@pytest.fixture(scope="module")
def model(spark):
    return embed.pca_fit(load(spark, SF_CORRECT, "embeddings"))


def _numpy_pca(x: np.ndarray, k: int):
    mu = x.mean(axis=0)
    c = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(c)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, vals[order], comps, float(np.trace(c))


def test_moments_match_numpy_ground_truth(model, fixture_matrix):
    _, x = fixture_matrix
    mu, vals, comps, tvar = _numpy_pca(x, embed.PCA_K)
    assert np.allclose(model.mean, mu, atol=1e-9)
    assert np.allclose(model.eigvals, vals, atol=1e-9)
    assert np.allclose(model.total_var, tvar, atol=1e-9)
    # eigenvectors match up to the shared sign convention; near-degenerate
    # eigenvalues can rotate within their eigenspace, so compare via the
    # projector W'W (basis-invariant) rather than row-by-row
    w_d = np.array(model.components)
    w_n = comps
    assert np.allclose(w_d.T @ w_d, w_n.T @ w_n, atol=1e-7)


def test_components_orthonormal_and_evr_descending(model):
    w = np.array(model.components)
    assert np.allclose(w @ w.T, np.eye(len(w)), atol=1e-9)
    evr = model.explained_variance_ratio()
    assert all(a >= b - 1e-12 for a, b in zip(evr, evr[1:]))
    assert 0.0 < sum(evr) <= 1.0 + 1e-9


def test_model_invariant_to_partitioning(spark, model):
    e = load(spark, SF_CORRECT, "embeddings")
    m7 = embed.pca_fit(e.repartition(7))
    assert np.allclose(model.mean, m7.mean, atol=1e-9)
    assert np.allclose(model.eigvals, m7.eigvals, atol=1e-9)


def test_projection_matches_numpy(spark, model, fixture_matrix):
    ids, x = fixture_matrix
    e = load(spark, SF_CORRECT, "embeddings").select("vec_id", "embedding")
    rows = embed.pca_project(e, model).collect()
    got = {r["vec_id"]: np.array(r["proj"]) for r in rows}
    w = np.array(model.components)
    mu = np.array(model.mean)
    want = (x - mu) @ w.T
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], want[i], atol=1e-9)


def test_whitened_projection_has_unit_variance(spark, model):
    e = load(spark, SF_CORRECT, "embeddings").select("vec_id", "embedding")
    rows = embed.pca_project(e, model, whiten=True).collect()
    p = np.array([r["proj"] for r in rows])
    var = p.var(axis=0)
    assert np.allclose(var, 1.0, atol=1e-6)


def test_projection_plan_is_map_only(spark, model):
    e = load(spark, SF_CORRECT, "embeddings").select("vec_id", "embedding")
    plan = str(embed.pca_project(e, model)._jdf.queryExecution().executedPlan())
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_reconstruction_error_equals_dropped_eigenvalues(model, fixture_matrix):
    """The PCA optimality identity: mean squared reconstruction error of a
    k-component basis equals the sum of the dropped eigenvalues. Exact (to
    float tolerance) for the true covariance eigenbasis — a wrong basis,
    wrong centering, or wrong normalization all break it."""
    _, x = fixture_matrix
    w = np.array(model.components)
    mu = np.array(model.mean)
    proj = (x - mu) @ w.T
    recon = proj @ w + mu
    mse = float(np.mean(np.sum((x - recon) ** 2, axis=1)))
    dropped = model.total_var - sum(model.eigvals)
    assert abs(mse - dropped) < 1e-8 * max(1.0, model.total_var)


def test_pca_topk_recall_on_planted_low_rank(spark):
    """On data that actually IS low-rank (rank-8 basis + 1% noise in 64-d),
    the distributed fit + reduced-space top-10 recovers the exact
    full-space top-10 with mean recall ≥ 0.9. The fixture's own flat
    spectrum makes it a non-test for recall (see emb_pca_topk docstring),
    hence the planted corpus."""
    rng = np.random.default_rng(7)
    n, d, r = 400, 64, 8
    basis = rng.standard_normal((r, d))
    coef = rng.standard_normal((n, r))
    x = coef @ basis + 0.01 * rng.standard_normal((n, d))
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(5)
    m = embed.pca_fit(df, "embedding", embed.PCA_K)
    p = embed.pca_project(df, m, "embedding", "proj").collect()
    proj = np.zeros((n, embed.PCA_K))
    for row in p:
        proj[row["vec_id"]] = row["proj"]

    def topk(mat, qidx, k=10):
        nm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = nm[qidx] @ nm.T
        out = []
        for i, q in enumerate(qidx):
            s = sims[i].copy()
            s[q] = -2
            out.append(set(np.argsort(-s)[:k]))
        return out

    q = np.arange(5)
    exact, reduced = topk(x, q), topk(proj, q)
    recalls = [len(a & b) / 10 for a, b in zip(exact, reduced)]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_emb_pca_topk_query_runs_and_is_well_formed(spark):
    """The registry query itself: right shape, exactly TOPK rows per query
    vector, rank contiguous — value-level recall is gated on the planted
    corpus above."""
    rows = embed.emb_pca_topk(spark, SF_CORRECT).collect()
    per: dict[int, list] = {}
    for r in rows:
        per.setdefault(r["query_id"], []).append(r["rank"])
    assert sorted(per) == list(range(similarity.N_QUERY_VECS))
    for q, ranks in per.items():
        assert sorted(ranks) == list(range(1, similarity.TOPK + 1)), q


def test_variance_profile_smoke(spark):
    df = embed.emb_pca_variance(spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) == embed.PCA_K
    assert rows[0]["component"] == 0
    assert abs(rows[-1]["cum_evr"] - sum(r["evr"] for r in rows)) < 1e-4
