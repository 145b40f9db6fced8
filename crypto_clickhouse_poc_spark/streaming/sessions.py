"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The streaming counterpart of ``operators.trades.ev_sessionize``: per-user
sessions close when no event arrives within GAP seconds. Spark's built-in
session windows cover the aggregate case; this operator demonstrates the
*arbitrary* per-key state API — a Pandas-batched state function holding
(session start, last ts, event count) per user, emitting a row per CLOSED
session — the hook for stateful logic the built-ins can't express
(inventory tracking, order books, CEP patterns).

State per key is O(1), so state size tracks active users, not stream
length. Two eviction modes: ``use_timeout=False`` (default; a user's final
session closes only when a later event opens the next one — deterministic,
replay-friendly, what the parity test checks) and ``use_timeout=True``
(ProcessingTimeTimeout flushes idle sessions after the gap — the live-
deployment mode; wall-clock dependent, so not used in tests).
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SEC = 1800

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, dur_sec long"
)
STATE_SCHEMA = "start long, last long, n long"


def _session_row(user_id: int, start: int, last: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start, unit="s")],
            "session_end": [pd.Timestamp(last, unit="s")],
            "n_events": [n],
            "dur_sec": [last - start],
        }
    )


def _make_tracker(use_timeout: bool) -> Callable:
    def track_sessions(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if use_timeout and state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                state.remove()
                yield _session_row(user_id, start, last, n)
            return

        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(t.value // 1_000_000_000) for t in pdf["ts"])
        ts_list.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        out = []
        for t in ts_list:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > SESSION_GAP_SEC:
                out.append(_session_row(user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        if use_timeout:
            state.setTimeoutDuration(SESSION_GAP_SEC * 1000)
        for row in out:
            yield row

    return track_sessions


def sessionize_stream(events: DataFrame, use_timeout: bool = False) -> DataFrame:
    """events (user_id, ts) stream → closed-session rows."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_tracker(use_timeout),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def sessionize_builtin(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """JVM-native session windows: ``F.session_window`` + watermark — the
    scale-DEFAULT sessionizer (state merging, eviction, and emission all
    inside the streaming aggregation engine; no Python boundary).

    Semantics vs the custom tracker above: Spark's session window ``end``
    is ``last event + gap`` (exclusive bound), the tracker's
    ``session_end`` is the last event itself — so
    ``end == session_end + gap`` for the same session, with identical
    ``session_start`` / ``n_events`` (cross-implementation equivalence is
    test-locked). Works identically as a BATCH aggregation, which is what
    the streaming parity test compares against.
    """
    from pyspark.sql import functions as F

    gap = F.lit(f"{SESSION_GAP_SEC} seconds")
    return (
        events.select("user_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end_excl"),
            "n_events",
        )
    )
