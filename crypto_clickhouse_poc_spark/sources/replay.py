"""Deterministic replay source for streaming tests.

The reference is fed by a live WebSocket; its test strategy (none — survey
§5) is replaced here by replaying fixtures through the real streaming
pipeline: trades → Binance-style JSON envelope lines → chunked files →
``readStream`` with ``maxFilesPerTrigger=1``, so each chunk becomes one
micro-batch (≙ one reference insert block). Normalizing the replayed events
must reproduce the input exactly (FIXTURES.md A3 contract).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_EPOCH_NAIVE = datetime(1970, 1, 1)
_EPOCH_UTC = datetime(1970, 1, 1, tzinfo=timezone.utc)


def epoch_ms(dt: datetime) -> int:
    """Exact integer epoch-ms. tz-aware input is converted to UTC; tz-naive
    input is interpreted as UTC (NOT local time — ``dt.timestamp()`` would
    silently shift naive datetimes by the process timezone, and its float
    multiply can round exact-second values)."""
    delta = dt - (_EPOCH_UTC if dt.tzinfo is not None else _EPOCH_NAIVE)
    return (delta.days * 86400 + delta.seconds) * 1000 + delta.microseconds // 1000


def trades_to_event_lines(rows: list[dict]) -> list[str]:
    """Encode trade dicts as Binance combined-stream envelopes.

    Field map is the inverse of ingest.normalize: symbol→s, trade_id→t,
    price→p (string), qty→q (string), ts→T (epoch ms), is_buyer_maker→m.
    """
    out = []
    for r in rows:
        ev = {
            "stream": f"{r['symbol'].lower()}@trade",
            "data": {
                "s": r["symbol"],
                "t": r["trade_id"],
                "p": f"{r['price']:.8f}",
                "q": f"{r['qty']:.8f}",
                "T": epoch_ms(r["ts"]),
                "m": bool(r["is_buyer_maker"]),
            },
        }
        out.append(json.dumps(ev))
    return out


def write_replay_chunks(lines: list[str], replay_dir: str, num_chunks: int = 4) -> None:
    """Split event lines into numbered chunk files (one micro-batch each).

    Spark's file source admits files in *modification-time* order, and files
    written in the same millisecond replay in arbitrary order — so each chunk
    gets an explicit ascending mtime matching its number, making batch order
    (and therefore watermark progression) deterministic.
    """
    import os

    d = Path(replay_dir)
    d.mkdir(parents=True, exist_ok=True)
    per = max(1, (len(lines) + num_chunks - 1) // num_chunks)
    base = 1_700_000_000  # any fixed epoch; only the ordering matters
    for i in range(0, len(lines), per):
        chunk = i // per
        p = d / f"chunk-{chunk:05d}.jsonl"
        p.write_text("\n".join(lines[i : i + per]) + "\n")
        os.utime(p, (base + chunk, base + chunk))


def read_replay_stream(spark: SparkSession, replay_dir: str) -> DataFrame:
    """Streaming DataFrame of raw JSON lines (column ``value``), one file per
    trigger — deterministic micro-batch boundaries."""
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(replay_dir)
        .withColumnRenamed("value", "value")
    )
