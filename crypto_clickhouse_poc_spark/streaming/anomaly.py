"""Custom stateful streaming operator: per-symbol online EWMA price
anomalies with ``applyInPandasWithState``.

A second ``§2.8``-family operator beside the sessionizer
(``streaming/sessions.py``): per key the state is a constant-size
(ewma mean, ewma variance, count) triple updated online (RiskMetrics-style
exponentially weighted moments), and a trade is flagged when its price
sits more than ``z`` EWMA standard deviations from the mean *as of the
previous trade* — the streaming shape of real-time data-quality /
surveillance checks where the built-in windowed aggregates can't express
the per-row look-back-then-update recurrence.

Determinism: trades are folded in (ts, trade_id) order within each batch
and the state carries exact across micro-batches, so the emitted anomaly
set is independent of batch boundaries — the property the parity test
locks (1-batch run == 3-batch run == driver-side pandas fold).

State per key is O(1); state size tracks distinct symbols, not stream
length — the only stateful shape that survives an unbounded stream.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_ALPHA = 0.1  # weight of the newest observation
Z_THRESHOLD = 3.0
WARMUP = 10  # flag nothing until this many trades seeded the moments

OUTPUT_SCHEMA = (
    "symbol string, trade_id long, ts timestamp, price double, "
    "ewma double, zscore double"
)
STATE_SCHEMA = "mean double, var double, n long"


def ewma_step(
    mean: float, var: float, n: int, price: float, alpha: float = EWMA_ALPHA
) -> tuple[float, float, int, float | None]:
    """One online update. Returns (mean', var', n', zscore-before-update);
    zscore is None during warmup or while variance is zero."""
    z = None
    if n >= WARMUP and var > 0.0:
        z = (price - mean) / (var**0.5)
    if n == 0:
        mean, var = price, 0.0
    else:
        delta = price - mean
        # RiskMetrics EW moments: the variance sees the PRE-update mean
        var = (1.0 - alpha) * (var + alpha * delta * delta)
        mean = mean + alpha * delta
    return mean, var, n + 1, z


def _fold_batch(
    symbol: str, rows: pd.DataFrame, mean: float, var: float, n: int
) -> tuple[pd.DataFrame | None, float, float, int]:
    """The per-key recurrence over one sorted batch. The walk reads plain
    numpy scalars from a pre-extracted price array — the recurrence is
    inherently order-dependent so the LOOP stays, but there is no per-row
    pandas Series construction (iterrows) on the hot path, and the flagged
    output frame is built in one vectorized `.iloc` selection."""
    prices = rows["price"].to_numpy(dtype=float)
    flagged: list[int] = []
    ewmas: list[float] = []
    zscores: list[float] = []
    for i in range(len(prices)):
        price = prices[i]
        prior_mean = mean
        mean, var, n, z = ewma_step(mean, var, n, price)
        if z is not None and abs(z) > Z_THRESHOLD:
            flagged.append(i)
            ewmas.append(prior_mean)
            zscores.append(z)
    if not flagged:
        return None, mean, var, n
    sel = rows.iloc[flagged]
    out = pd.DataFrame(
        {
            "symbol": symbol,
            "trade_id": sel["trade_id"].to_numpy(),
            "ts": sel["ts"].to_numpy(),
            "price": prices[flagged],
            "ewma": ewmas,
            "zscore": zscores,
        }
    )
    return out, mean, var, n


def _flag_anomalies(
    key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (symbol,) = key
    chunks = [p for p in pdfs if len(p)]
    if not chunks:  # pd.concat([]) raises; possible under state timeouts
        return
    rows = pd.concat(chunks, ignore_index=True)
    rows = rows.sort_values(["ts", "trade_id"])
    mean, var, n = state.get if state.exists else (0.0, 0.0, 0)
    out, mean, var, n = _fold_batch(symbol, rows, mean, var, n)
    state.update((mean, var, n))
    if out is not None:
        yield out


def flag_price_anomalies(trades: DataFrame) -> DataFrame:
    """trades (symbol, trade_id, ts, price) stream → anomaly rows."""
    return (
        trades.select("symbol", "trade_id", "ts", "price")
        .groupBy("symbol")
        .applyInPandasWithState(
            _flag_anomalies,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def flag_price_anomalies_tws(trades: DataFrame) -> DataFrame:
    """The same operator on Spark 4's ``transformWithState`` API
    (``transformWithStateInPandas`` + a ``StatefulProcessor`` with typed
    ``ValueState``) — the successor to ``applyInPandasWithState`` with
    named state variables, TTL, and timers. Output and state semantics are
    identical to :func:`flag_price_anomalies`, so the two entry points are
    drop-in twins; new deployments should prefer this one.

    Environment note: the transformWithState Python runner speaks a
    protobuf protocol to the JVM state server and needs the ``protobuf``
    package, which is NOT importable in this container — so here the
    parity test (tests/test_streaming.py) skips this variant with the
    reason recorded, exactly like the PIL-gated ``decode_real`` boundary.
    The plan construction below is still exercised (it fails only at
    stream start), and the applyInPandasWithState twin carries the
    batch-parity gate.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EwmaAnomalyProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._moments = handle.getValueState("moments", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (symbol,) = key
            chunks = [p for p in rows if len(p)]
            if not chunks:
                return
            data = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "trade_id"]
            )
            mean, var, n = (
                self._moments.get() if self._moments.exists() else (0.0, 0.0, 0)
            )
            out, mean, var, n = _fold_batch(symbol, data, mean, var, n)
            self._moments.update((mean, var, n))
            if out is not None:
                yield out

        def close(self) -> None:
            pass

    return (
        trades.select("symbol", "trade_id", "ts", "price")
        .groupBy("symbol")
        .transformWithStateInPandas(
            EwmaAnomalyProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


def batch_anomalies(rows: list[tuple]) -> list[tuple]:
    """Driver-side ground truth: the same fold over (symbol, trade_id, ts,
    price) tuples, for parity tests."""
    from collections import defaultdict

    state: dict[str, tuple[float, float, int]] = defaultdict(lambda: (0.0, 0.0, 0))
    out = []
    for symbol, trade_id, ts, price in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        mean, var, n = state[symbol]
        prior_mean = mean
        mean, var, n, z = ewma_step(mean, var, n, float(price))
        state[symbol] = (mean, var, n)
        if z is not None and abs(z) > Z_THRESHOLD:
            out.append((symbol, trade_id, ts, float(price), prior_mean, z))
    return out
