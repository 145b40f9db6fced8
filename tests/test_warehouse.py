"""Warehouse-pattern invariants beyond the DuckDB parity gate
(tests/test_oracle_parity.py covers value-exactness of the fixture
queries; this file locks the ALGEBRA of the generic SCD2 merge and the
BM25 scoring bounds)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.operators import text as TX
from crypto_clickhouse_poc_spark.operators import warehouse as W
from tests.conftest import SF_CORRECT


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_scd2_reapplying_same_batch_is_idempotent(spark):
    """A correct merge is change-detecting: applying the SAME update batch
    to the merged result adds zero versions (the current rows already
    carry the new values)."""
    dim, upd = W._scd2_inputs(spark, SF_CORRECT)
    once = W.scd2_merge(dim, upd, W.SCD2_T1)
    twice = W.scd2_merge(once, upd, "2024-03-01 00:00:00")
    assert _rows(twice) == _rows(once)


def test_scd2_second_real_change_appends_third_version(spark):
    """A later batch that changes the value again versions again: changed
    keys end with 3 rows (two closed intervals + one open), and history
    rows are never rewritten."""
    dim, upd = W._scd2_inputs(spark, SF_CORRECT)
    once = W.scd2_merge(dim, upd, W.SCD2_T1)
    upd2 = upd.withColumn("acctbal", F.round(F.col("acctbal") + 7.0, 2))
    twice = W.scd2_merge(once, upd2, "2024-03-01 00:00:00")
    per_key = {
        r["key"]: r["n"]
        for r in twice.groupBy("key").agg(F.count("*").alias("n")).collect()
    }
    changed_keys = [r["key"] for r in once.where("is_current = 0").select("key").collect()]
    assert changed_keys, "fixture must contain changed keys"
    for k in changed_keys:
        assert per_key[k] == 3, k
    # closed T0->T1 intervals from the first merge survive verbatim
    first_closed = _rows(once.where("is_current = 0"))
    still_there = _rows(
        twice.where(f"is_current = 0 AND effective_to = timestamp'{W.SCD2_T1}'")
    )
    assert first_closed == still_there


def test_scd2_interval_invariants(spark):
    """Per key: exactly one current row; intervals are contiguous
    (effective_to of a closed row == effective_from of its successor) and
    never overlap."""
    dim, upd = W._scd2_inputs(spark, SF_CORRECT)
    out = W.scd2_merge(dim, upd, W.SCD2_T1)
    cur_counts = out.groupBy("key").agg(
        F.sum("is_current").alias("n_cur"), F.count("*").alias("n")
    )
    bad = cur_counts.where("n_cur != 1").count()
    assert bad == 0
    rows = sorted(
        ((r["key"], r["effective_from"], r["effective_to"]) for r in out.collect())
    )
    by_key: dict = {}
    for k, f, t in rows:
        by_key.setdefault(k, []).append((f, t))
    for k, ivals in by_key.items():
        ivals.sort()
        for (f1, t1), (f2, t2) in zip(ivals, ivals[1:]):
            assert t1 == f2, (k, t1, f2)  # contiguous
            assert f1 < t1 <= f2 < t2, (k, ivals)  # ordered, no overlap


def test_bm25_scores_bounded_and_term_monotone(spark):
    """Per-term BM25 contribution is bounded by idf*(k1+1) (tf-saturation),
    and a doc containing a query term outscores the same doc with the term
    removed — checked by rescoring a perturbed corpus through the same
    dataflow constants."""
    rows = TX.corpus_bm25_topk(spark, SF_CORRECT).collect()
    assert rows, "fixture must rank something"
    # bound: with df >= 1, idf <= ln(1 + (N - 0.5)/1.5); N = 500 docs
    n_docs = 500
    idf_max = math.log(1.0 + (n_docs - 0.5) / 1.5)
    bound = len(TX.BM25_QUERY) * idf_max * (TX.BM25_K1 + 1)
    for r in rows:
        assert 0.0 < r["bm25"] <= bound + 1e-9, tuple(r)


def test_bm25_removing_terms_lowers_score(spark, duck):
    """Oracle-side counterfactual: strip the query terms from the top doc's
    text; its rescored BM25 must drop to 0 for those terms (score strictly
    lower). Uses the oracle SQL on a perturbed view so Spark and test stay
    independent."""
    rows = TX.corpus_bm25_topk(spark, SF_CORRECT).collect()
    top, top_score = rows[0]["doc_id"], rows[0]["bm25"]
    terms = "|".join(TX.BM25_QUERY)
    duck.execute("DROP VIEW IF EXISTS documents_perturbed")
    duck.execute(
        f"""
        CREATE VIEW documents_perturbed AS
        SELECT doc_id,
               CASE WHEN doc_id = {top}
                    THEN trim(regexp_replace(text, '\\b({terms})\\b', 'zzz', 'g'))
                    ELSE text END AS text,
               lang, source, n_chars
        FROM documents
        """
    )
    sql = TX.ORACLES["corpus_bm25_topk"].replace("FROM documents", "FROM documents_perturbed")
    new = {r[0]: r[1] for r in duck.sql(sql).fetchall()}
    assert new.get(top, 0.0) < top_score


def test_streaming_cdc_apply_matches_sequential_batch_merges(spark, tmp_path):
    """Two update batches streamed through the foreachBatch CDC sink
    produce the same dimension as applying scd2_merge sequentially in
    batch; and streamed batch order follows file order (chunk 0 then 1)."""
    import os

    from crypto_clickhouse_poc_spark.streaming import cdc

    dim0, upd = W._scd2_inputs(spark, SF_CORRECT)
    dim_path = str(tmp_path / "dim")
    dim0.coalesce(1).write.parquet(dim_path)

    u1 = upd.where("key % 20 = 0")  # changed balances
    u2 = upd.where("key % 20 = 10").withColumn(
        "acctbal", F.round(F.col("acctbal") - 55.0, 2)
    )
    src = tmp_path / "cdc_src"
    src.mkdir()
    for k, u in enumerate((u1, u2)):
        p = str(src / f"chunk-{k:05d}")
        u.coalesce(1).write.parquet(p)
        # one file per chunk dir; surface as flat files for the file stream
    # flatten: the file source reads a directory of parquet files
    flat = tmp_path / "cdc_flat"
    flat.mkdir()
    import glob
    import shutil

    for k in range(2):
        f = glob.glob(str(src / f"chunk-{k:05d}" / "*.parquet"))[0]
        dst = str(flat / f"chunk-{k:05d}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (1_700_000_000 + k, 1_700_000_000 + k))

    # n_files=3: the dim write must be parallel-capable, not a hardwired
    # coalesce(1) (r6 verdict #3) — swap/heal protocol unchanged
    stream = spark.readStream.schema("key long, name string, acctbal double").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(flat))
    q = cdc.start_scd2_apply(stream, dim_path, str(tmp_path / "ckpt_cdc"), n_files=3)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    import pathlib

    assert len(list(pathlib.Path(dim_path).glob("*.parquet"))) == 3
    got = _rows(spark.read.parquet(dim_path))
    want = _rows(
        W.scd2_merge(
            W.scd2_merge(dim0, u1, cdc.default_batch_ts(0)),
            u2,
            cdc.default_batch_ts(1),
        )
    )
    assert got == want
    # sanity: both change sets actually versioned
    closed = spark.read.parquet(dim_path).where("is_current = 0").count()
    assert closed == u1.count() + u2.count()


def test_cdc_apply_crash_window_heals_on_next_read(spark, tmp_path):
    """Simulate a crash between the CDC swap's two renames (live dim path
    absent, .compact.tmp fully written): the next apply's read_table call
    heals it and the apply proceeds — the same recovery contract as
    compact()."""
    import shutil

    from crypto_clickhouse_poc_spark.streaming import cdc

    dim0, upd = W._scd2_inputs(spark, SF_CORRECT)
    dim_path = str(tmp_path / "dim_crash")
    dim0.coalesce(1).write.parquet(dim_path)
    u1 = upd.where("key % 20 = 0")

    # manufacture the crash state: full new version in .compact.tmp, live
    # path renamed aside to .compact.old (crash before tmp -> dest rename)
    merged = W.scd2_merge(spark.read.parquet(dim_path), u1, cdc.default_batch_ts(0))
    merged.coalesce(1).write.parquet(dim_path + ".compact.tmp")
    shutil.move(dim_path, dim_path + ".compact.old")

    u2 = upd.where("key % 20 = 10").withColumn(
        "acctbal", F.round(F.col("acctbal") - 55.0, 2)
    )
    cdc.apply_scd2_batch(dim_path, u2, cdc.default_batch_ts(1))

    got = _rows(spark.read.parquet(dim_path))
    want = _rows(
        W.scd2_merge(
            W.scd2_merge(dim0, u1, cdc.default_batch_ts(0)),
            u2,
            cdc.default_batch_ts(1),
        )
    )
    assert got == want


def test_scd2_inserts_new_keys_and_null_transitions(spark):
    """The generic merge must (a) INSERT brand-new keys as first versions
    (a CDC feed creates entities) and (b) treat NULL→value and value→NULL
    as changes (null-safe compare)."""
    dim = spark.createDataFrame(
        [
            (1, "a", 10.0, W.SCD2_T0, W.SCD2_OPEN, 1),
            (2, "b", None, W.SCD2_T0, W.SCD2_OPEN, 1),
            (3, "c", 30.0, W.SCD2_T0, W.SCD2_OPEN, 1),
        ],
        "key long, name string, acctbal double, effective_from string, "
        "effective_to string, is_current int",
    ).withColumn("effective_from", F.col("effective_from").cast("timestamp")) \
     .withColumn("effective_to", F.col("effective_to").cast("timestamp"))
    upd = spark.createDataFrame(
        [
            (2, "b", 20.0),   # NULL -> value: must version
            (3, "c", None),   # value -> NULL: must version
            (9, "new", 99.0), # brand-new key: must insert
        ],
        "key long, name string, acctbal double",
    )
    out = W.scd2_merge(dim, upd, W.SCD2_T1)
    rows = {(r["key"], r["is_current"]): r for r in out.collect()}
    assert (9, 1) in rows and rows[(9, 1)]["acctbal"] == 99.0
    assert rows[(2, 1)]["acctbal"] == 20.0 and (2, 0) in rows
    assert rows[(3, 1)]["acctbal"] is None and (3, 0) in rows
    assert rows[(1, 1)]["acctbal"] == 10.0 and (1, 0) not in rows
    # idempotent including the insert/null legs (stringified sort: rows
    # contain NULLs, which plain tuple ordering can't compare)
    again = W.scd2_merge(out, upd, "2024-03-01 00:00:00")
    canon = lambda df: sorted(tuple(str(x) for x in r) for r in df.collect())
    assert canon(again) == canon(out)


def test_cdc_batch_ts_is_valid_for_large_batch_ids(spark):
    from crypto_clickhouse_poc_spark.streaming import cdc

    for bid in (0, 28, 29, 99, 400):
        ts = cdc.default_batch_ts(bid)
        got = spark.sql(f"SELECT CAST('{ts}' AS TIMESTAMP) AS t").collect()[0]["t"]
        assert got is not None, (bid, ts)


def test_cdc_batch_with_multiple_changes_per_key(spark, tmp_path):
    """Two changes for one key in ONE batch: with a seq_col the LAST wins
    (one closed + one current row); without one the apply fails loudly
    instead of opening two current versions."""
    import pytest as _pytest

    from crypto_clickhouse_poc_spark.streaming import cdc

    dim0, _ = W._scd2_inputs(spark, SF_CORRECT)
    dim_path = str(tmp_path / "dim_multi")
    dim0.coalesce(1).write.parquet(dim_path)
    batch = spark.createDataFrame(
        [(0, "x", 111.0, 1), (0, "x", 222.0, 2)],
        "key long, name string, acctbal double, seq long",
    )
    # loud failure without an ordering column
    with _pytest.raises(ValueError, match="multiple rows for key"):
        cdc.apply_scd2_batch(dim_path, batch.drop("seq"), cdc.default_batch_ts(0))
    # with seq: last change (222.0) wins, exactly one current row for key 0
    cdc.apply_scd2_batch(dim_path, batch, cdc.default_batch_ts(0), seq_col="seq")
    rows = spark.read.parquet(dim_path).where("key = 0").collect()
    cur = [r for r in rows if r["is_current"] == 1]
    assert len(cur) == 1 and cur[0]["acctbal"] == 222.0
    assert len(rows) == 2  # old version closed, new one open


def test_scd2_name_change_versions_and_carries_new_name(spark):
    """A name-ONLY change must version (change detection covers every
    tracked attribute), and the opened version must carry the UPDATE's
    name — not freeze the dimension's stale one (r6 ADVICE: the generic
    CDC path feeds full key/name/acctbal rows)."""
    dim = spark.createDataFrame(
        [(1, "old-name", 10.0, W.SCD2_T0, W.SCD2_OPEN, 1),
         (2, "stable", 20.0, W.SCD2_T0, W.SCD2_OPEN, 1)],
        "key long, name string, acctbal double, effective_from string, "
        "effective_to string, is_current int",
    ).withColumn("effective_from", F.col("effective_from").cast("timestamp")) \
     .withColumn("effective_to", F.col("effective_to").cast("timestamp"))
    upd = spark.createDataFrame(
        [(1, "new-name", 10.0),   # name-only change: must version
         (2, "renamed", 99.0)],   # name+balance change: new name must land
        "key long, name string, acctbal double",
    )
    out = W.scd2_merge(dim, upd, W.SCD2_T1)
    rows = {(r["key"], r["is_current"]): r for r in out.collect()}
    assert rows[(1, 1)]["name"] == "new-name" and rows[(1, 0)]["name"] == "old-name"
    assert rows[(1, 1)]["acctbal"] == 10.0
    assert rows[(2, 1)]["name"] == "renamed" and rows[(2, 1)]["acctbal"] == 99.0
    assert rows[(2, 0)]["name"] == "stable"
    # still idempotent with the widened change predicate
    again = W.scd2_merge(out, upd, "2024-03-01 00:00:00")
    assert _rows(again) == _rows(out)


def test_scd2_open_sentinel_survives_pandas_conversion(spark):
    """The open-interval sentinel must be representable in nanosecond
    datetime64 — the DRIVER converts results via toPandas, and the classic
    9999-12-31 overflows there (the r6 red row). Conversion itself is the
    assertion."""
    import pandas as pd

    df = spark.range(1).select(
        F.lit(W.SCD2_OPEN).cast("timestamp").alias("effective_to")
    )
    pdf = df.toPandas()  # raises OutOfBoundsDatetime on a bad sentinel
    assert pd.notna(pdf["effective_to"].iloc[0])


def test_unpivot_widens_with_novel_event_type(spark, tmp_path):
    """A brand-new event_type in the data must appear in the long form
    (pivot columns derive from the data, not a hardcoded list)."""
    import os

    e = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00", 1, "click", 1.0, "{}"),
         (2, "2024-01-01 01:00:00", 1, "brand_new_type", 2.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sf = str(tmp_path / "unpivot_drift")
    e.write.parquet(os.path.join(sf, "events.parquet"))
    got = {(r["hour"], r["event_type"], r["n"])
           for r in W.ev_hourly_unpivot(spark, sf).collect()}
    assert (1, "brand_new_type", 1) in got and (1, "click", 1) in got


def test_twopass_quantiles_null_event_type_group(spark, tmp_path):
    """A NULL event_type with real prices is a GROUP, not a dropped key:
    twopass must emit it with computed quantiles exactly like
    F.percentile (null-unsafe equi-joins would silently drop it — r7
    review finding; fixed via the invertible surrogate key)."""
    import os

    from crypto_clickhouse_poc_spark.operators.trades import (
        ev_price_quantiles,
        ev_price_quantiles_twopass,
    )

    rows = [("a", float(i)) for i in range(40)] + [(None, float(i)) for i in range(25)]
    df = spark.createDataFrame(rows, "event_type string, price double")
    ev = df.select(
        F.monotonically_increasing_id().alias("event_id"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        "event_type",
        F.col("price").alias("value"),
        F.lit('{"k": 1}').alias("props"),
    )
    sf = str(tmp_path / "qnulltype")
    ev.write.parquet(os.path.join(sf, "events.parquet"))
    canon = lambda df_: sorted(tuple(str(x) for x in r) for r in df_.collect())
    exact = canon(ev_price_quantiles(spark, sf))
    got = canon(ev_price_quantiles_twopass(spark, sf))
    assert got == exact
    assert any(r[0] == "None" for r in got)  # the NULL group is present


def test_unpivot_handles_null_and_hostile_type_names(spark, tmp_path):
    """NULL event_type gets its own long-form group (the oracle's GROUP BY
    emits one), and type strings that would break column resolution
    ('hour' collides with the id column; backticks/dots break parsing)
    ride through the positional-slot pivot unharmed. An empty table
    yields an empty frame, not a groupBy-with-no-aggregates crash."""
    import os

    e = spark.createDataFrame(
        [
            (1, "2024-01-01 01:00:00", 1, None, 1.0, "{}"),
            (2, "2024-01-01 01:00:00", 1, "hour", 1.0, "{}"),
            (3, "2024-01-01 01:00:00", 1, "a.b`c", 2.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sf = str(tmp_path / "unpivot_hostile")
    e.write.parquet(os.path.join(sf, "events.parquet"))
    got = {(r["hour"], r["event_type"], r["n"])
           for r in W.ev_hourly_unpivot(spark, sf).collect()}
    assert got == {(1, None, 1), (1, "hour", 1), (1, "a.b`c", 1)}

    sf2 = str(tmp_path / "unpivot_empty")
    e.limit(0).write.parquet(os.path.join(sf2, "events.parquet"))
    empty = W.ev_hourly_unpivot(spark, sf2)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["hour", "event_type", "n"]


def test_twopass_quantiles_all_null_group_surfaces(spark, tmp_path):
    """An event_type whose prices are ALL NULL must appear with NULL
    quantiles — exactly as F.percentile and the shared oracle emit it
    (r6 ADVICE low)."""
    import os

    from crypto_clickhouse_poc_spark.operators.trades import (
        ev_price_quantiles,
        ev_price_quantiles_twopass,
    )

    rows = [("a", float(i)) for i in range(50)] + [("ghost", None)] * 5
    df = spark.createDataFrame(rows, "event_type string, price double")
    ev = df.select(
        F.monotonically_increasing_id().alias("event_id"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        "event_type",
        F.col("price").alias("value"),
        F.lit('{"k": 1}').alias("props"),
    )
    sf = str(tmp_path / "qallnull")
    ev.write.parquet(os.path.join(sf, "events.parquet"))
    exact = sorted(tuple(r) for r in ev_price_quantiles(spark, sf).collect())
    got = sorted(tuple(r) for r in ev_price_quantiles_twopass(spark, sf).collect())
    assert got == exact
    assert any(r[0] == "ghost" and r[1] is None for r in got)


def test_twopass_quantiles_skip_nulls_like_percentile(spark, tmp_path):
    """A NULL price must not shift ranks or buckets: twopass == F.percentile
    on a corpus with NULLs mixed in."""
    import os

    from crypto_clickhouse_poc_spark.operators.trades import (
        ev_price_quantiles,
        ev_price_quantiles_twopass,
    )

    rows = [("a", float(i)) for i in range(100)] + [("a", None)] * 7
    rows += [("b", 5.0)] * 10 + [("b", None)]
    df = spark.createDataFrame(rows, "event_type string, price double")
    ev = df.select(
        F.monotonically_increasing_id().alias("event_id"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        "event_type",
        F.col("price").alias("value"),
        F.lit('{"k": 1}').alias("props"),
    )
    sf = str(tmp_path / "qnull")
    ev.write.parquet(os.path.join(sf, "events.parquet"))
    exact = sorted(tuple(r) for r in ev_price_quantiles(spark, sf).collect())
    got = sorted(tuple(r) for r in ev_price_quantiles_twopass(spark, sf).collect())
    assert got == exact
