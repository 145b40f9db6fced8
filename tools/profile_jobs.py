"""Per-job profile of a library query: job count, per-job wall time, and
driver-side inter-job gaps (guide §1.4/§7 — where does the wall clock go
when every Spark job is small?).

Runs the named query once untimed (JIT/codegen warmup), then once profiled
with the Spark event log enabled, and prints each job's (start offset,
duration, call site) plus the summed job time vs the inter-job gap time.

Usage:  python tools/profile_jobs.py <query_name> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    log_dir = tempfile.mkdtemp(prefix="evlog_")

    from crypto_clickhouse_poc_spark import operators
    from crypto_clickhouse_poc_spark.session import get_spark

    spark = get_spark(
        f"profile-{name}",
        **{
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
        },
    )
    qs = operators.library_queries()
    qs[name](spark, sf_dir).collect()  # warmup (JIT/codegen), unprofiled
    # cache-cold profiled run — the bench's exact per-repetition state
    spark.catalog.clearCache()
    # mark the profiled run's start so warmup jobs can be excluded
    t_mark = int(time.time() * 1000)
    t0 = time.perf_counter()
    n = len(qs[name](spark, sf_dir).collect())
    wall = time.perf_counter() - t0
    spark.stop()

    jobs: dict[int, dict] = {}
    # Spark 4 writes rolling logs under eventlog_v2_<appid>/ dirs
    for p in Path(log_dir).rglob("*"):
        if p.is_dir() or p.name.startswith("appstatus"):
            continue
        for line in p.read_text().splitlines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "site": ev.get("Properties", {}).get(
                        "callSite.short", "?"
                    ),
                    "ntasks": sum(
                        s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])
                    ),
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]

    prof = sorted(
        (j for j in jobs.values() if "end" in j and j["start"] >= t_mark),
        key=lambda j: j["start"],
    )
    if not prof:
        print("no profiled jobs captured")
        return
    t_base = prof[0]["start"]
    job_sum = 0.0
    gap_sum = 0.0
    prev_end = None
    print(f"{name} @ {sf_dir}: {n} rows, wall {wall:.3f}s, {len(prof)} jobs")
    print(f"{'off_ms':>8} {'dur_ms':>7} {'gap_ms':>7} {'tasks':>5}  site")
    for j in prof:
        dur = j["end"] - j["start"]
        gap = 0 if prev_end is None else max(0, j["start"] - prev_end)
        prev_end = max(prev_end or 0, j["end"])
        job_sum += dur
        gap_sum += gap
        print(
            f"{j['start'] - t_base:>8} {dur:>7} {gap:>7} {j['ntasks']:>5}"
            f"  {j['site']}"
        )
    lead = (prof[0]["start"] - t_mark) / 1000.0
    tail = wall - (prev_end - t_mark) / 1000.0
    print(
        f"sum(job)={job_sum / 1000:.3f}s  sum(gaps)={gap_sum / 1000:.3f}s  "
        f"pre-first-job={lead:.3f}s  post-last-job={tail:.3f}s"
    )


if __name__ == "__main__":
    main()
