-- Spark-SQL rewrite of the reference migration
-- sql/V2__create_trades_1m_view.sql:1-29 (ClickHouse table + insert-trigger
-- materialized view).
--
-- The reference MV appends one PARTIAL bar row per insert block; a minute
-- spanning blocks yields multiple partials and correct totals require
-- re-aggregation at read (SURVEY.md §1.4). The Spark split of the same
-- design (streaming/bars.py):
--   write half  → the streaming job start_bars_partials aggregates each
--     micro-batch and appends partial rows to crypto.trades_1m (the DDL
--     below stores the partials, including the open/close merge keys the
--     reference gets implicitly from argMin/anyLast over block order);
--   read half   → the crypto.trades_1m_final view merges partials exactly
--     (min_by/max_by over the carried keys — ClickHouse's
--     partial-aggregate merge reproduced declaratively).
--
-- argMin(price, ts) → min_by over the carried (ts, trade_id) key
-- (deterministic under ties where anyLast/argMin are order-dependent);
-- count() → BIGINT trades; PARTITION BY toYYYYMM(minute) → p_month column.

CREATE TABLE IF NOT EXISTS crypto.trades_1m
(
    minute    TIMESTAMP,
    symbol    STRING,
    open      DOUBLE,
    open_key  STRUCT<ts: TIMESTAMP, trade_id: BIGINT>,
    high      DOUBLE,
    low       DOUBLE,
    close     DOUBLE,
    close_key STRUCT<ts: TIMESTAMP, trade_id: BIGINT>,
    volume    DOUBLE,
    trades    BIGINT,
    p_month   STRING
)
USING PARQUET
PARTITIONED BY (p_month)
TBLPROPERTIES (
    'crypto.mv.writer'        = 'streaming/bars.py::start_bars_partials',
    'crypto.write.sort.order' = 'minute, symbol'
);

CREATE OR REPLACE VIEW crypto.trades_1m_final AS
SELECT
    minute,
    symbol,
    min_by(open, open_key)   AS open,
    max(high)                AS high,
    min(low)                 AS low,
    max_by(close, close_key) AS close,
    sum(volume)              AS volume,
    sum(trades)              AS trades
FROM crypto.trades_1m
GROUP BY minute, symbol;
