"""Scale probe: per-commit LOG write cost, inline vs sharded manifests.

Builds a synthetic 12-month x N-files-per-month table with pure metadata
commits (no Spark, no data files — the log layer is being measured), then
times/weighs 24 single-file appends. The claim under test: with per-month
content-addressed shards (SHARD_FILES), the bytes written per commit are
O(changed month), not O(table files) — so the log stops being the write
amplifier at a 100M-file scale point.

Run:  python tools/scale_probe_shards.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_clickhouse_poc_spark.plans import snapshots as S

MONTHS = [f"2024{m:02d}" for m in range(1, 13)]
FILES_PER_MONTH = 1000
APPENDS = 24


def _entries(month: str, n: int, base: int) -> list[dict]:
    return [
        {
            "path": f"data/txn=t{base + i:08x}/p_month={month}/part-{i}.parquet",
            "p_month": month,
        }
        for i in range(n)
    ]


def _log_bytes(path: str) -> int:
    return sum(
        f.stat().st_size for f in (S._log(path)).iterdir() if f.is_file()
    )


def run(shard_files: int) -> dict:
    S.SHARD_FILES = shard_files
    path = tempfile.mkdtemp() + "/t"
    base_files: list[dict] = []
    for i, m in enumerate(MONTHS):
        base_files.extend(_entries(m, FILES_PER_MONTH, i * FILES_PER_MONTH))
    S._commit(path, lambda _hf: base_files, "append")
    before = _log_bytes(path)
    t0 = time.time()
    for k in range(APPENDS):
        new = _entries(MONTHS[k % len(MONTHS)], 1, 10_000_000 + k)
        S._commit(path, lambda hf, new=new: hf + new, "append")
    elapsed = time.time() - t0
    grew = _log_bytes(path) - before
    head = S.latest_version(path)
    n = len(S.manifest(path, head)["files"])
    shutil.rmtree(path, ignore_errors=True)
    return {
        "mode": "sharded" if shard_files < 10**9 else "inline",
        "table_files": n,
        "appends": APPENDS,
        "log_bytes_per_commit": round(grew / APPENDS),
        "ms_per_commit": round(1000 * elapsed / APPENDS, 1),
    }


if __name__ == "__main__":
    inline = run(10**9)
    sharded = run(512)
    ratio = inline["log_bytes_per_commit"] / max(1, sharded["log_bytes_per_commit"])
    print(json.dumps({"inline": inline, "sharded": sharded,
                      "write_amplification_ratio": round(ratio, 1)}))
