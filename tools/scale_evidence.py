"""Scaling evidence (r17, VERDICT #5): run the heaviest bench entries on a
K×-replicated copy of sf0.1 at 8 vs 32 cores and print the speedup table.

The sf0.1 fixture is fixed-cost-bound (every r16 core ratio ≈ 1, which
proves nothing about which operators parallelise). There is no sf1
fixture and /root/testdata is read-only, so this tool DERIVES a larger
input deterministically (no RNG):

- events: K copies with event_id shifted by k·10^12 (ids stay unique;
  minutes/symbols unchanged → same group count, K× rows per group).
- documents: K copies with doc_id shifted and every TOKEN prefixed with
  the replica tag (replicas share zero tokens, so dedup/jaccard pair
  structure scales K× linearly instead of quadratically).
- embeddings: K copies with vec_id shifted and a replica-specific ±1
  sign mask on the vector dims (norms preserved; cross-replica cosines
  land far from 1, so semantic/SRP pair structure also scales ~K×).
- small dims (region/nation/...) copied as-is.

This is a measurement harness only — the bench itself still runs on the
driver's sf0.1; nothing here feeds any declared query's results.

Usage:
  python tools/scale_evidence.py gen [K]            # build /tmp/sfx<K>
  SPARK_GRAFT_CPUS=8 python tools/scale_evidence.py run /tmp/sfx10 q1 q2 ...
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
ID_SHIFT = 10**12


def gen(k: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    dest = Path(f"/tmp/sfx{k}")
    if dest.exists():
        shutil.rmtree(dest)
    dest.mkdir(parents=True)
    for name in (
        "region nation customer supplier part orders lineitem".split()
    ):
        shutil.copy(f"{SRC}/{name}.parquet", dest / f"{name}.parquet")

    ev = pq.read_table(f"{SRC}/events.parquet")
    parts = []
    for i in range(k):
        t = ev.set_column(
            ev.schema.get_field_index("event_id"),
            "event_id",
            pa.compute.add(ev["event_id"], i * ID_SHIFT),
        )
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), dest / "events.parquet")

    import pandas as pd

    docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    dparts = []
    for i in range(k):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + i * ID_SHIFT
        if i > 0:
            tag = f"r{i}_"
            d["text"] = d["text"].map(
                lambda s, tag=tag: None
                if s is None
                else tag + s.replace(" ", " " + tag)
            )
        dparts.append(d)
    pd.concat(dparts, ignore_index=True).to_parquet(
        dest / "documents.parquet", index=False
    )

    emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    eparts = []
    dim = len(emb["embedding"].iloc[0])
    for i in range(k):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + i * ID_SHIFT
        if i > 0:
            # deterministic ±1 mask per replica: flip dim j iff bit j of
            # (i * 2654435761 mod 2^dim-ish) — cheap, norm-preserving
            mask = [1.0 if ((i * 2654435761) >> (j % 31)) & 1 == 0 else -1.0 for j in range(dim)]
            e["embedding"] = e["embedding"].map(
                lambda v, m=mask: [x * s for x, s in zip(v, m)]
            )
        eparts.append(e)
    pd.concat(eparts, ignore_index=True).to_parquet(
        dest / "embeddings.parquet", index=False
    )
    print(f"generated {dest} (K={k})")
    return str(dest)


def run(sf_dir: str, names: list[str]) -> None:
    from crypto_clickhouse_poc_spark import operators
    from crypto_clickhouse_poc_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(f"scale-evidence-{cpus}")
    qs = operators.library_queries()
    n_runs = int(os.environ.get("SCALE_RUNS", "2"))
    for name in names:
        qs[name](spark, sf_dir).collect()  # warmup
        runs = []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = len(qs[name](spark, sf_dir).collect())
            runs.append(time.perf_counter() - t0)
        print(
            f"cpus={cpus} {name}: median {statistics.median(runs):.3f}s "
            f"{[round(r, 3) for r in runs]} ({n} rows)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
    else:
        run(sys.argv[2], sys.argv[3:])
