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
