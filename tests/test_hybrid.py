"""Hybrid retrieval (BM25 ∪ hash-embedding cosine, RRF fusion) gates.

The DuckDB value-parity gate runs in test_oracle_parity; these tests pin the
SEMANTIC invariants (rank arithmetic, dense-branch exactness vs numpy) and
the plan shape (no pair blow-up, constant-size fusion)."""

from __future__ import annotations

import math
import re

from crypto_clickhouse_poc_spark.operators import text as TX
from tests.conftest import SF_CORRECT, SF_SMOKE


def _fused(spark, sf=SF_CORRECT):
    return TX.corpus_hybrid_rrf(spark, sf).collect()


def test_rrf_score_recomputes_from_branch_ranks(spark):
    """rrf == Σ 1/(K + rank) over the non-null branch ranks, rows ordered
    by (rrf desc, doc_id asc), and every row appears in >= 1 branch."""
    rows = _fused(spark)
    assert 0 < len(rows) <= TX.HYBRID_N
    prev = None
    for r in rows:
        assert r.lex_rank is not None or r.sem_rank is not None
        want = sum(
            1.0 / (TX.RRF_K + rank)
            for rank in (r.lex_rank, r.sem_rank)
            if rank is not None
        )
        assert math.isclose(r.rrf, round(want, 6), abs_tol=1e-9)
        key = (-r.rrf, r.doc_id)
        assert prev is None or prev <= key, "not ordered by (rrf desc, doc_id)"
        prev = key


def test_branch_ranks_are_valid_permutation_prefixes(spark):
    """Within the fused rows, each branch's non-null ranks are distinct and
    within [1, HYBRID_N] — i.e. genuine positions in a top-N list."""
    rows = _fused(spark)
    for attr in ("lex_rank", "sem_rank"):
        ranks = [getattr(r, attr) for r in rows if getattr(r, attr) is not None]
        assert len(ranks) == len(set(ranks))
        assert all(1 <= rk <= TX.HYBRID_N for rk in ranks)


def test_dense_branch_matches_numpy_cosine(spark):
    """The sem_rank positions agree with a brute-force numpy recompute of
    the hash-embedding cosine ranking (integer dot/norms, doc_id ties)."""
    import numpy as np

    qv = np.array(TX._hash_embed_py(TX.BM25_QUERY), dtype=np.int64)
    emb = TX._hash_embed_frame(spark, SF_SMOKE).collect()
    scored = []
    for r in emb:
        v = np.array(r.embedding, dtype=np.int64)
        ss = int(v @ v)
        if ss == 0:
            continue
        cos = float(v @ qv) / math.sqrt(ss * int(qv @ qv))
        scored.append((-cos, r.doc_id))
    scored.sort()
    want = {doc: i + 1 for i, (_, doc) in enumerate(scored[: TX.HYBRID_N])}

    rows = TX.corpus_hybrid_rrf(spark, SF_SMOKE).collect()
    seen = {r.doc_id: r.sem_rank for r in rows if r.sem_rank is not None}
    assert seen, "no dense-branch hits in the fused top-N"
    for doc, rank in seen.items():
        assert want.get(doc) == rank, (doc, rank, want.get(doc))


def test_hybrid_plan_is_two_scan_branches_no_pair_blowup(spark):
    """Both branches stay scan-shaped: no explode (Generate), no cartesian
    or sort-merge pair join — the only join is BM25's 1-row broadcast stats
    crossJoin; fusion is a Union + hash agg over <= 2N rows."""
    df = TX.corpus_hybrid_rrf(spark, SF_CORRECT)
    plan = str(df._jdf.queryExecution().executedPlan())
    assert "Generate" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "Union" in plan
    assert "BroadcastExchange" in plan  # the 1-row BM25 stats side
    # no join other than the 1-row-broadcast BNL crossJoin from BM25
    assert len(re.findall(r"BroadcastNestedLoopJoin", plan)) == 1
