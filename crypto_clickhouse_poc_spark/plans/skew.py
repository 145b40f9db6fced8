"""Skew mitigation for joins on hot keys.

Two tiers, matching how Spark deployments actually handle skew:

- **AQE skew-join** (first choice, already on session-wide —
  ``session.py``: ``spark.sql.adaptive.skewJoin.enabled``): at runtime
  AQE splits oversized shuffle partitions of a sort-merge join and
  replicates the matching side. Zero code changes; verified working in
  ``tests/test_skew.py`` against a synthesized 90%-one-key fact table.
- **Static salting** (this module) for the plans AQE cannot re-plan:
  stream-stream joins, jobs that must pre-partition deterministically,
  or engines running with AQE off. ``salted_join`` splits every key into
  ``buckets`` sub-keys: the big side salts each row deterministically
  (hash of all its columns — no RNG, so replays and retries produce the
  same partitioning), the small side is exploded ``buckets``× so every
  (key, salt) pair finds its match. Join semantics are EXACTLY those of
  the unsalted equi-join (parity-tested); the hot key's rows now spread
  across ``buckets`` tasks instead of one straggler.

The big-side salt hashes whole rows, so it spreads a hot KEY as long as
the rows under it differ somewhere — true for real fact tables (ids,
timestamps). A pathological table whose hot-key rows are bit-identical
duplicates stays skewed under any deterministic salt; use AQE (which
splits by partition size, not value) for that shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the key salted into
    ``buckets`` sub-keys. Result columns equal the plain join's (the salt
    is internal). ``how`` supports inner/left — the shapes where the big
    side's row set drives the output."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if SALT_COL in big.columns or SALT_COL in small.columns:
        raise ValueError(
            f"input already has a {SALT_COL!r} column — salting would "
            "silently overwrite and then drop it"
        )
    bs = big.withColumn(SALT_COL, F.pmod(F.xxhash64(*big.columns), F.lit(buckets)))
    ss = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = bs.join(ss, [on, SALT_COL], how)
    return out.drop(SALT_COL)


# ---------------------------------------------------------------------------
# Runtime bloom-filter join reduction (the third runtime-replan lever,
# beside AQE skew-split and salting): for a selective-dim ⋈ big-fact
# sort-merge join, Catalyst injects a bloom-filter aggregate on the
# SELECTIVE side and applies `bloom_filter_might_contain` to the fact scan
# BEFORE the shuffle — the shuffle then carries only probably-matching
# rows. This is ClickHouse's "JOIN with a prefilter" / semi-join reduction
# as a pure optimizer behavior: zero query changes.
#
# The thresholds exist for 100 TB reasons: building a bloom filter costs a
# pass over the creation side (only worth it if it is small —
# creationSideThreshold) and only pays if the application side is scan-
# dominant (applicationSideScanSizeThreshold, default 10 GB — our test
# fixtures sit far below it, so the demo lowers it; a real cluster keeps
# the defaults and gets the filter exactly when it matters).
# ---------------------------------------------------------------------------

_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # let small fixtures qualify as the "big" application side
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # keep the join a shuffle join — a broadcast join already prunes the
    # stream side with its build-side hash table, no bloom needed
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


class runtime_bloom_demo:
    """Context manager: enable runtime bloom-filter injection at fixture
    scale (runtime SQL confs only — session-safe, restored on exit)."""

    def __init__(self, spark):
        self.spark = spark
        self._saved: dict[str, str | None] = {}

    def __enter__(self):
        for k, v in _BLOOM_CONFS.items():
            try:
                self._saved[k] = self.spark.conf.get(k)
            except Exception:
                self._saved[k] = None
            self.spark.conf.set(k, v)
        return self.spark

    def __exit__(self, *exc):
        for k, v in self._saved.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)
        return False
