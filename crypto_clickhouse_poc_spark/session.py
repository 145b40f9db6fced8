"""SparkSession factory with scale-oriented defaults.

Defaults chosen for correctness-first determinism in tests and for plans that
survive a 100x scale-up:

- ``spark.sql.session.timeZone=UTC`` — deterministic timestamp semantics that
  match a tz-naive oracle (DuckDB) reading the same parquet.
- AQE on (coalesce partitions + skew-join) — runtime re-planning is the main
  lever at real cluster scale; harmless locally.
- Arrow on — any Pandas UDF path is vectorized, never row-at-a-time.
- ``shuffle.partitions`` sized by env (32 locally; a real deployment sets this
  to ~2-3x total cores, or relies on AQE coalescing from a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Streaming state: RocksDB + changelog checkpointing. The default
    # HDFS-backed store keeps the FULL state map in executor memory and
    # snapshots all of it per commit — both break at 100 TB-scale dedup
    # state. RocksDB spills to local disk and changelog checkpointing
    # uploads only the per-batch delta (full snapshots amortized in the
    # background). Measured locally (PERF.md): ~17.6k rows/s warm vs ~19k
    # for the HDFS store — a ~8% steady-state tax for unbounded-state
    # safety — but the FIRST streaming query in a session pays ~10 s of
    # one-off native-lib load + codegen (9.3k rows/s cold). Per-workload
    # override: streaming entry points take state_store= (see
    # streaming/ingest.py:set_state_store) so small-bounded-state queries
    # can pick the in-memory store explicitly.
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    # local[32] has 128 GiB; a 64 MiB broadcast threshold keeps every dim
    # table (region/nation/customer/supplier/part at these SFs) broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "crypto-clickhouse-poc-spark", **conf_overrides: str) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``conf_overrides`` are raw Spark conf key/values layered on top of the
    defaults. Master resolves from ``SPARK_GRAFT_CPUS`` (default local[32]);
    an existing active session is reused as-is (Spark semantics).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    )
    conf = dict(_DEFAULTS)
    conf.update(conf_overrides)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
