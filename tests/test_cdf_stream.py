"""readChangeFeed=true streaming gates (r14 — Delta CDF's streaming mode
over the snapshot log).

The stream emits CHANGE rows (``_change_type`` 'insert'|'delete' +
``_commit_version``) instead of choosing between failing a deleting
commit and duplicating a rewrite. The binding contract these gates pin:
a SIGNED fold of the feed (inserts minus deletes) equals the batch
recompute over the final snapshot — across overwrite backfills,
eq-deletes, position deletes, and upserts — with NO dedup sink. That is
exactly the property ``ignoreChanges`` (emit-with-duplicates) cannot
give a non-idempotent consumer.
"""

from __future__ import annotations

from collections import Counter
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans import snapshots as S
from crypto_clickhouse_poc_spark.sources.snapstream import SnapshotCommitsDataSource

SCHEMA = "ts timestamp, symbol string, trade_id long, price double"


def _batch(spark, month: int, ids, price=None):
    rows = [
        (datetime(2024, month, 1 + (i % 27)), "AB"[i % 2] * 3, i,
         float(100 + i) if price is None else float(price))
        for i in ids
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def table(tmp_path, spark):
    path = str(tmp_path / "cdf_table")
    S.append(_batch(spark, 1, range(8)), path)
    spark.dataSource.register(SnapshotCommitsDataSource)
    return path


def _start(spark, path, ck, name, **opts):
    reader = (
        spark.readStream.format("snapshot_commits")
        .option("path", path)
        .option("readChangeFeed", "true")
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .trigger(processingTime="0 seconds")
        .start()
    )


def _signed_state(spark, name) -> Counter:
    """Multiset fold of the feed: +1 per insert, -1 per delete, keyed by
    the full data row — the strongest 'no dedup sink required' check."""
    rows = spark.sql(
        f"select ts, symbol, trade_id, price, _change_type from {name}"
    ).collect()
    state: Counter = Counter()
    for r in rows:
        key = (r.ts, r.symbol, r.trade_id, r.price)
        state[key] += 1 if r._change_type == "insert" else -1
    return +state  # drop zero/negative entries


def _snapshot_multiset(spark, path) -> Counter:
    return Counter(
        (r.ts, r.symbol, r.trade_id, r.price)
        for r in S.read_snapshot(spark, path)
        .select("ts", "symbol", "trade_id", "price")
        .collect()
    )


def test_overwrite_midstream_signed_fold_equals_batch(spark, table, tmp_path):
    """The judge-prescribed parity: a mid-stream overwrite_months
    produces the same final agg as batch recompute — deletes retract the
    month's old rows, inserts add the corrected ones."""
    q = _start(spark, table, str(tmp_path / "ck"), "cdf_ow")
    try:
        q.processAllAvailable()  # bootstrap: 8 inserts
        fixed = _batch(spark, 1, range(8)).withColumn(
            "price",
            F.when(F.col("trade_id") % 3 == 0, F.col("price") * 2.0).otherwise(
                F.col("price")
            ),
        )
        S.overwrite_months(fixed, table)
        S.append(_batch(spark, 2, range(8, 11)), table)
        q.processAllAvailable()
    finally:
        q.stop()
    assert _signed_state(spark, "cdf_ow") == _snapshot_multiset(spark, table)
    # and the signed AGGREGATE matches the batch groupBy — the actual
    # "streaming agg stays exact across a backfill" use case
    agg = spark.sql(
        "select symbol, sum(case when _change_type='insert' then price "
        "else -price end) as s, sum(case when _change_type='insert' then 1 "
        "else -1 end) as n from cdf_ow group by symbol"
    ).collect()
    batch = {
        r.symbol: (r.s, r.n)
        for r in S.read_snapshot(spark, table)
        .groupBy("symbol")
        .agg(F.sum("price").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    assert {r.symbol: (r.s, r.n) for r in agg} == batch


def test_eq_delete_emits_retractions(spark, table, tmp_path):
    q = _start(spark, table, str(tmp_path / "ck"), "cdf_eq")
    try:
        q.processAllAvailable()
        S.delete_by_keys(
            spark, table,
            spark.createDataFrame([(2,), (5,), (99,)], "trade_id long"),
        )
        q.processAllAvailable()
    finally:
        q.stop()
    dels = spark.sql(
        "select trade_id from cdf_eq where _change_type='delete'"
    ).collect()
    assert sorted(r.trade_id for r in dels) == [2, 5]  # 99 never existed
    assert _signed_state(spark, "cdf_eq") == _snapshot_multiset(spark, table)


def test_position_delete_emits_exactly_the_dv_rows(spark, table, tmp_path):
    q = _start(spark, table, str(tmp_path / "ck"), "cdf_pos")
    try:
        q.processAllAvailable()
        S.delete_where(spark, table, F.col("trade_id") % 2 == 1)
        q.processAllAvailable()
    finally:
        q.stop()
    dels = spark.sql(
        "select trade_id from cdf_pos where _change_type='delete'"
    ).collect()
    assert sorted(r.trade_id for r in dels) == [1, 3, 5, 7]
    assert _signed_state(spark, "cdf_pos") == _snapshot_multiset(spark, table)


def test_upsert_emits_delete_then_insert_pairs(spark, table, tmp_path):
    q = _start(spark, table, str(tmp_path / "ck"), "cdf_up")
    try:
        q.processAllAvailable()
        S.upsert_by_keys(
            _batch(spark, 1, [3, 4], price=999.0), table, cols=["trade_id"]
        )
        q.processAllAvailable()
    finally:
        q.stop()
    # the replaced rows retract at their OLD values; new values insert
    assert _signed_state(spark, "cdf_up") == _snapshot_multiset(spark, table)
    dels = spark.sql(
        "select trade_id, price from cdf_up where _change_type='delete'"
    ).collect()
    assert sorted((r.trade_id, r.price) for r in dels) == [(3, 103.0), (4, 104.0)]


def test_sequencing_reinserted_key_not_retracted_twice(spark, table, tmp_path):
    """An eq-delete followed by a re-insert of the same key, consumed in
    one catch-up range: the delete retracts only the PRE-delete row (the
    added_v-vs-entry-version rule), the re-insert stays."""
    S.delete_by_keys(spark, table, spark.createDataFrame([(6,)], "trade_id long"))
    S.append(_batch(spark, 3, [6], price=777.0), table)
    q = _start(spark, table, str(tmp_path / "ck"), "cdf_seq",
               startingVersion="0")  # consume (0, head] as changes
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "select price, _change_type from cdf_seq where trade_id = 6"
    ).collect()
    assert sorted((r.price, r._change_type) for r in rows) == [
        (106.0, "delete"),
        (777.0, "insert"),
    ]


def test_layout_only_commit_emits_nothing(spark, table, tmp_path):
    q = _start(spark, table, str(tmp_path / "ck"), "cdf_opt")
    try:
        q.processAllAvailable()
        before = spark.sql("select count(*) c from cdf_opt").collect()[0].c
        S.optimize_small_files(spark, table, min_rows=10_000_000)
        q.processAllAvailable()
        after = spark.sql("select count(*) c from cdf_opt").collect()[0].c
    finally:
        q.stop()
    assert before == after == 8


def test_visibility_rewrite_fails_the_feed(spark, table, tmp_path):
    q = _start(spark, table, str(tmp_path / "ck"), "cdf_rb")
    try:
        q.processAllAvailable()
        S.append(_batch(spark, 2, [20]), table)
        S.rollback(table, 1)
        with pytest.raises(Exception, match="change feed|rewrites visibility"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_cdf_eq_delete_leg_prunes_clustered_files(spark, tmp_path):
    """The feed's one non-O(new-data) leg (eq-delete candidate scan) is
    manifest-key-stat-pruned on a clustered layout: the delete partitions
    cover a strict SUBSET of the pre-commit manifest."""
    from crypto_clickhouse_poc_spark.sources.snapstream import (
        SnapshotStreamReader,
    )

    path = str(tmp_path / "clustered")
    rows = [
        (datetime(2024, 1, 2), f"S{i:03d}", i, float(i)) for i in range(256)
    ]
    S.append(
        spark.createDataFrame(rows, SCHEMA), path,
        cluster_cols=("symbol",), n_files=8,
    )
    n_files = len(S.manifest(path, 0)["files"])
    assert n_files > 1
    S.delete_by_keys(
        spark, path, spark.createDataFrame([("S000",), ("S001",)], "symbol string")
    )
    reader = SnapshotStreamReader(
        path, 0,
        [("ts", "timestamp"), ("symbol", "string"), ("trade_id", "bigint"),
         ("price", "double")],
        change_feed=True,
    )
    parts = reader._cdc_partitions(0, 1)
    dels = [p for p in parts if p.value[4] == "delete"]
    assert 0 < len(dels) < n_files  # strict subset of the manifest
    # and the selected rows are exactly the victims
    victims = []
    for p in dels:
        for b in reader.read(p):
            victims += b.column("symbol").to_pylist()
    assert sorted(victims) == ["S000", "S001"]


@pytest.mark.parametrize("seed", [11, 37])
def test_random_op_interleaving_signed_fold_matches_batch(spark, tmp_path, seed):
    """Model check for the change feed: a LIVE stream consuming any
    interleaving of append / overwrite / upsert / eq-delete /
    position-delete / optimize keeps the signed fold equal to the batch
    recompute after EVERY micro-batch — the retraction contract under
    composition, not just per-op."""
    import random as rnd

    from crypto_clickhouse_poc_spark.plans import snapshots as S2

    r = rnd.Random(seed)
    spark.dataSource.register(SnapshotCommitsDataSource)
    path = str(tmp_path / "model")
    S.append(_batch(spark, 1, range(6)), path)
    next_id = 6
    q = _start(spark, path, str(tmp_path / "ck"), f"cdf_model_{seed}")
    try:
        q.processAllAvailable()
        for step in range(8):
            op = r.choice(
                ["append", "overwrite", "upsert", "eq_delete", "delete", "optimize"]
            )
            live = [
                row.trade_id
                for row in S.read_snapshot(spark, path)
                .select("trade_id").collect()
            ]
            if op == "append":
                ids = list(range(next_id, next_id + r.randint(1, 3)))
                next_id += len(ids)
                S.append(_batch(spark, r.choice([1, 2]), ids), path)
            elif op == "overwrite":
                # re-publish month 1 with shifted prices (keeps its ids)
                S.overwrite_months(
                    _batch(spark, 1, range(6), price=float(step)), path
                )
            elif op == "upsert" and live:
                tid = r.choice(live)
                S.upsert_by_keys(
                    _batch(spark, 1, [tid], price=500.0 + step), path,
                    cols=["trade_id"],
                )
            elif op == "eq_delete" and live:
                S.delete_by_keys(
                    spark, path,
                    spark.createDataFrame([(r.choice(live),)], "trade_id long"),
                )
            elif op == "delete" and live:
                S.delete_where(spark, path, F.col("trade_id") == r.choice(live))
            elif op == "optimize":
                S2.optimize_small_files(spark, path, min_rows=10_000_000)
            else:
                continue
            q.processAllAvailable()
            assert _signed_state(spark, f"cdf_model_{seed}") == _snapshot_multiset(
                spark, path
            ), f"step {step} op {op}"
    finally:
        q.stop()


def test_cdf_eq_delete_leg_prunes_via_bloom_sidecar(spark, tmp_path):
    """On an UNCLUSTERED layout key stats prune nothing — the published
    Bloom sidecar still cuts the feed's eq-delete candidate scan, through
    the SparkSession-less probe (partitions() has no session). Both
    probes must agree file-for-file."""
    from crypto_clickhouse_poc_spark.plans import bloomidx as B
    from crypto_clickhouse_poc_spark.sources.snapstream import (
        SnapshotStreamReader,
    )

    path = str(tmp_path / "bloomed")
    for j in range(4):  # 4 commits -> multiple files, ids disjoint
        S.append(_batch(spark, 1, range(j * 50, (j + 1) * 50)), path)
    B.build_bloom_index(spark, path, "trade_id")
    head = S.latest_version(path)
    S.delete_by_keys(
        spark, path, spark.createDataFrame([(3,), (7,)], "trade_id long")
    )
    # probe parity: the local (pyarrow) probe sees what the Spark one sees
    spark_maybe = B._maybe_files(spark, path, "trade_id", [3, 7])[0]
    local_maybe = B.maybe_files_local(path, "trade_id", [3, 7])[0]
    assert spark_maybe == local_maybe
    reader = SnapshotStreamReader(
        path, head,
        [("ts", "timestamp"), ("symbol", "string"), ("trade_id", "bigint"),
         ("price", "double")],
        change_feed=True,
    )
    parts = reader._cdc_partitions(head, head + 1)
    dels = [p for p in parts if p.value[4] == "delete"]
    n_files = len(S.manifest(path, head)["files"])
    assert 0 < len(dels) < n_files  # the sidecar cut the candidate scan
    victims = []
    for p in dels:
        for b in reader.read(p):
            victims += b.column("trade_id").to_pylist()
    assert sorted(victims) == [3, 7]


def test_decimal_columns_stream_and_null_fill_pre_evolution_files(spark, tmp_path):
    """r15: DECIMAL(p,s) joins the stream's type surface (the exact-money
    rollup case) — logged-schema gate passes, values arrive as decimals,
    and a pre-evolution file's missing decimal column null-fills at the
    declared decimal type instead of KeyError-ing the micro-batch."""
    from decimal import Decimal

    spark.dataSource.register(SnapshotCommitsDataSource)
    path = str(tmp_path / "dec_table")
    S.append(
        spark.createDataFrame(
            [(datetime(2024, 1, 1), "AAA")], "ts timestamp, symbol string"
        ),
        path,
    )
    S.append(
        spark.createDataFrame(
            [(datetime(2024, 1, 2), "BBB", Decimal("1.500000"))],
            "ts timestamp, symbol string, price decimal(18,6)",
        ),
        path,
    )
    q = _start(spark, path, str(tmp_path / "ck"), "cdf_dec")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "select symbol, price from cdf_dec order by symbol"
    ).collect()
    assert [(r.symbol, r.price) for r in rows] == [
        ("AAA", None),  # pre-evolution file: typed null fill
        ("BBB", Decimal("1.500000")),
    ]
    assert dict(spark.table("cdf_dec").dtypes)["price"] == "decimal(18,6)"
