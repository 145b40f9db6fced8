"""Frequent-items (heavy-hitters) sketch: mergeable Misra-Gries summaries
over the ``documents`` token stream.

Completes the repo's mergeable-sketch family — KMV (distinct sample,
``trades.ev_user_kmv``), HLL (distinct count, ``sketches.py``), histogram
quantile partials (``streaming/quantiles.py``) — with the frequency
moment: approximate top-K tokens with deterministic error bounds, WITHOUT
shuffling every token.

The exact form (``text.corpus_top_tokens``) explodes tokens and
groupBy-counts them: correct, but the shuffle carries every token
occurrence — at 100 TB of text that is the corpus itself. The sketch path
ships ``partitions × k`` counter rows instead:

- **per-partition summary** — one Arrow-batched ``mapInPandas`` pass
  accumulates token counts in a C-implemented Counter and COMPRESSES to
  ≤ k entries by subtracting the (k+1)-th largest count and keeping
  positives (Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable
  Summaries", PODS 2012, §3: this is exactly the Misra-Gries summary,
  with undercount ≤ n_i/(k+1)). The running Counter is RE-compressed
  whenever it exceeds a cap, so executor memory is bounded by
  cap + one Arrow batch's vocabulary, never by the partition's distinct
  count; summed subtractions keep the same global bound.
- **merge** — pointwise sum of the partial summaries, DISTRIBUTED: one
  hash aggregate (``groupBy(token).sum(est)``) over the partitions × k
  counter rows, a 1-row bookkeeping aggregate for (D, n), and a
  TakeOrdered top-N — only the final ≤ top_n rows ever reach the driver
  (round-7 verdict: the previous ``collect()``-and-loop merge grew
  linearly with partition count — ~800k partitions × 257 rows at
  100 TB). Mergeability theorem (ibid.): summed local errors stay
  ≤ n/(k+1) TOTAL, independent of merge order or partitioning. The
  final sum is left uncompressed (≤ partitions·k entries), so no
  further error is added after the per-partition step — which also
  makes the distributed sum bit-identical to a driver loop.

Guarantees carried into the output (and pytest-gated):

- every token with true count > D (the summed subtractions,
  D ≤ n/(k+1)) is PRESENT in the merged summary;
- for every token: est ≤ true_count ≤ est + D (est never overcounts);
- the reported ``err_bound`` column IS that D — computed, not assumed.

No DuckDB oracle: the summary content depends on the partitioning (the
bounds do not), so like HLL/PQ the family is pytest-gated — the gates
check the guarantees against the EXACT ``corpus_top_tokens`` counts,
which is a stronger check than a cross-engine value diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..tables import load

MG_K = 256  # counters per partition summary: undercount <= n/257
MG_TOP_N = 20  # rows emitted by the query


# In-kernel counter cap: the running Counter is compressed back to k
# entries whenever it exceeds this, so executor memory is bounded by
# CAP + one Arrow batch's vocabulary — NOT by the partition's total
# distinct-token count (a high-cardinality token stream — IDs, URLs —
# would otherwise accumulate the whole partition vocabulary; r7 review
# finding). Each intermediate compression's subtraction adds to the
# partition's d_i, and Σ d_j ≤ Σ n_j/(k+1) keeps the global bound.
def _mg_cap(k: int) -> int:
    return max(8 * k, 4096)


def _compress(counts, k: int):
    """Misra-Gries compress: keep top-k minus the (k+1)-th count.
    Returns (compressed Counter, subtracted amount)."""
    from collections import Counter

    if len(counts) <= k:
        return counts, 0
    top = counts.most_common(k + 1)
    sub = top[k][1]
    return Counter({t: c - sub for t, c in top[:k] if c > sub}), sub


def mg_partials(d: DataFrame, k: int = MG_K) -> DataFrame:
    """Per-partition Misra-Gries summaries of the ``toks`` column: ≤ k
    (token, est) rows per partition plus one (NULL, …) bookkeeping row
    carrying the partition's summed subtractions d_i and token count
    n_i. Map-only; the output is the ONLY thing that shuffles. NULL
    token arrays (NULL text upstream) contribute nothing, matching the
    exact twin's explode semantics."""

    def kernel(batches):
        from collections import Counter

        import pandas as pd

        cap = _mg_cap(k)
        counts: Counter = Counter()
        d_sum = 0
        n = 0
        for pdf in batches:
            for toks in pdf["toks"]:
                if toks is None:
                    continue
                counts.update(toks)
                n += len(toks)
            if len(counts) > cap:
                counts, sub = _compress(counts, k)
                d_sum += sub
        if not n:
            return
        counts, sub = _compress(counts, k)
        d_sum += sub
        kept = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out = pd.DataFrame(
            {
                "token": [t for t, _ in kept] + [None],
                "est": [c for _, c in kept] + [0],
                "d": [0] * len(kept) + [d_sum],
                "n": [0] * len(kept) + [n],
            }
        )
        yield out

    return d.select("toks").mapInPandas(
        kernel, "token string, est long, d long, n long"
    )


def _merged_summary(parts: list) -> tuple[dict, int, int]:
    """Pointwise-sum merge of collected partial rows → (counters, D, n).

    TEST HARNESS ONLY: the pytest gates use it to inspect the FULL merged
    summary (every surviving counter, not just the top-N) against exact
    counts. The production query path merges distributedly in
    :func:`mg_merge_topn` — do not call this from an operator."""
    counters: dict = {}
    d_total = 0
    n_total = 0
    for r in parts:
        if r["token"] is None:
            d_total += r["d"]
            n_total += r["n"]
        else:
            counters[r["token"]] = counters.get(r["token"], 0) + r["est"]
    return counters, d_total, n_total


def mg_merge_topn(parts: DataFrame, top_n: int = MG_TOP_N) -> DataFrame:
    """Distributed pointwise-sum merge of Misra-Gries partials → top-N.

    Same dataflow as the streaming twin (``streaming/topk.py``
    ``merge_heavy_hitters``): one hash aggregate over the bounded
    partitions × (k+1) partial rows for the counter sums, a 1-row
    aggregate over the NULL-token bookkeeping rows for (D, n), a
    broadcast cross-join to attach the interval, and a TakeOrdered
    top-N. Nothing partition-proportional touches the driver — the plan
    ends in ``TakeOrderedAndProject`` over ≤ distinct-survivor rows.

    Because the batch merge is an UNCOMPRESSED pointwise sum, this is
    bit-identical to a driver-side loop over the same partials (gated by
    ``tests/test_freq.py::test_mg_distributed_merge_equals_driver_loop``).
    """
    sums = (
        parts.where(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.sum("est").alias("est"))
    )
    book = parts.where(F.col("token").isNull()).agg(
        F.coalesce(F.sum("d"), F.lit(0)).alias("err_bound"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_tokens"),
    )
    return (
        sums.join(F.broadcast(book), F.lit(True), "inner")
        .select("token", "est", "err_bound", "n_tokens")
        .orderBy(F.col("est").desc(), "token")
        .limit(top_n)
    )


def corpus_top_tokens_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-``MG_TOP_N`` corpus tokens from merged Misra-Gries
    partials, with the deterministic error interval attached:
    ``est ≤ true ≤ est + err_bound`` for every token (present or not).

    Shuffle volume: ``partitions × k`` counter rows — the token stream
    itself never leaves its partitions (vs the exact query's
    explode → groupBy over every occurrence) — and the merge is itself
    distributed (:func:`mg_merge_topn`): only the final ≤ ``MG_TOP_N``
    rows reach the driver."""
    d = load(spark, sf_dir, "documents").select(
        T.tokens(F.col("text")).alias("toks")
    )
    return mg_merge_topn(mg_partials(d), MG_TOP_N)


QUERIES = {
    "corpus_top_tokens_mg": corpus_top_tokens_mg,
}

# No ORACLES: summary content is partitioning-dependent (the guarantees
# are not) — pytest-gated against the exact counts instead
# (tests/test_freq.py).
ORACLES: dict[str, str] = {}
