-- Spark-SQL rewrite of the reference migration
-- sql/V1__create_trades_table.sql:1-20 (ClickHouse DDL).
--
-- Engine-clause mapping (SURVEY.md §4):
--   ENGINE = ReplacingMergeTree(ingested_at)  → X7: there is no storage-side
--     background merge; dedup is ingest-time dropDuplicatesWithinWatermark
--     (streaming/ingest.py) + the read-time canonical view
--     (plans/layout.py::dedup_view) + the optional compaction job
--     (plans/layout.py::compact). Recorded as a table property so tooling
--     can see the intended semantics.
--   PARTITION BY toYYYYMM(ts)  → a materialized p_month partition column
--     (Spark DDL cannot partition by an expression over a data column);
--     writers stamp p_month = date_format(ts, 'yyyyMM')
--     (streaming/ingest.py::with_ingest_metadata, plans/layout.py).
--   ORDER BY (ts, symbol, trade_id)  → X1: sort-on-write within each
--     partition (plans/layout.py::write_layout); recorded as a property.
--   TTL ts + INTERVAL 90 DAY DELETE  → X8: no built-in TTL; the scheduled
--     retention job (plans/layout.py::apply_retention) drops partitions
--     older than the property below.
--   SETTINGS index_granularity  → not applicable: parquet row-group stats +
--     min/max pruning replace the sparse primary index.
--
-- Type mapping: LowCardinality(String) → STRING (parquet dictionary
-- encoding is automatic); UInt64 → BIGINT; UInt8 bool-ish → INT (0/1);
-- DateTime → TIMESTAMP (second-truncated at ingest for DateTime parity);
-- DEFAULT now() → DEFAULT current_timestamp() (Spark column DEFAULT).

CREATE DATABASE IF NOT EXISTS crypto;

CREATE TABLE IF NOT EXISTS crypto.trades
(
    symbol         STRING,
    trade_id       BIGINT,
    price          DOUBLE,
    qty            DOUBLE,
    ts             TIMESTAMP,
    is_buyer_maker INT,
    ingested_at    TIMESTAMP DEFAULT current_timestamp(),
    p_month        STRING
)
USING PARQUET
PARTITIONED BY (p_month)
TBLPROPERTIES (
    'crypto.dedup.semantics'  = 'replacing(ingested_at) on (ts, symbol, trade_id)',
    'crypto.write.sort.order' = 'ts, symbol, trade_id',
    'crypto.retention.ttl'    = 'ts + INTERVAL 90 DAYS DELETE'
);
