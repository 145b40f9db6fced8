"""crypto_clickhouse_poc_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``Deniskerec/crypto-clickhouse-POC`` (a ClickHouse crypto-trades
analytics POC), re-expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst over columnar Parquet, Structured Streaming for ingestion and
incremental (materialized-view-style) aggregation, plus large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
plumbing, text analysis) designed for 100 TB / multi-thousand-executor scale.

Layout
------
- ``session``    SparkSession factory with scale-oriented defaults (AQE, UTC, Arrow)
- ``tables``     loaders/views over the parquet star schema + events/documents/embeddings
- ``operators``  the query surface: reference-parity analytics, TPC-H-style joins,
                 dedup family, similarity search
- ``functions``  reusable column expression builders (text stats, vector math)
- ``plans``      physical table layout (partitioning/sort/compaction), retention,
                 migration runner
- ``sources``    streaming sources (replay source for tests, Binance WS DataSource)
- ``streaming``  ingest job, incremental 1-minute OHLCV bars, lifecycle wrapper
"""

__version__ = "0.1.0"
