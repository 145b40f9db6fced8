"""Bounded per-query DataFrame caching.

Some queries cache a mid-plan DataFrame that their own plan references many
times (the LSH band joins reference the signature subplan 8×). A bare
``.cache()`` per invocation leaks: the query function returns a lazy
DataFrame, so it can never unpersist its own cache, and repeated
invocations in a long-lived session (serving, bench, pytest) accumulate
executor storage without bound.

``bounded_cache`` keeps AT MOST ONE live cache per call-site key: creating
the new cache unpersists the previous invocation's. Unpersisting a
DataFrame a consumer still holds is always safe in Spark — the plan simply
recomputes — so the bound trades at worst one recompute of a stale handle
for a hard O(#call-sites) storage ceiling.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LIVE: dict[str, DataFrame] = {}
_LOCK = threading.Lock()  # serving runs queries from concurrent threads


def bounded_cache(key: str, df: DataFrame) -> DataFrame:
    """Cache ``df`` under a call-site key, unpersisting the key's previous
    cache (non-blocking) so a session never holds more than one live cache
    per site. Thread-safe: concurrent callers with the same key must not
    race the pop/assign, or the loser's cache leaks untracked.

    When the new frame is semantically IDENTICAL to the previous one (the
    repeated-invocation case: bench warm runs, serving the same query),
    Spark's CacheManager dedupes ``cache()`` to the SAME entry — so
    unpersisting the old handle would kill the entry the new handle just
    adopted, and every repeat invocation would run UNCACHED (self-evicted;
    found by the r10 DSIR plan lock failing only after a prior identical
    run). ``sameSemantics`` keeps the shared entry alive; the per-key
    bound is intact either way — identical plans ARE one cache."""
    cached = df.cache()
    with _LOCK:
        prev = _LIVE.get(key)
        _LIVE[key] = cached
    if prev is not None and prev is not cached and not prev.sameSemantics(cached):
        prev.unpersist()
    return cached


def live_cache_count() -> int:
    """Number of live bounded caches (for tests / introspection)."""
    return len(_LIVE)
