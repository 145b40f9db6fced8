"""Streaming Misra-Gries heavy-hitters MV gates: flush summaries append
under Structured Streaming, the read-time merge carries a deterministic
interval (est ≤ true ≤ est + D, D computed from the bookkeeping rows),
and planted heavy keys always surface."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.streaming import topk as TK


def _skewed_rows(seed_tag: str):
    """3 planted heavy keys (500 each) + 1500 singleton tail keys."""
    rows = []
    for h in range(3):
        rows += [(f"heavy{h}",)] * 500
    rows += [(f"{seed_tag}tail{i}",) for i in range(1500)]
    return rows


def _exact(rows) -> dict[str, int]:
    out: dict[str, int] = {}
    for (k,) in rows:
        out[k] = out.get(k, 0) + 1
    return out


def _stream_chunks(spark, tmp_path, rows, n_chunks=3):
    flat = tmp_path / "mg_src"
    flat.mkdir()
    per = len(rows) // n_chunks
    for c in range(n_chunks):
        chunk = rows[c * per : (c + 1) * per if c < n_chunks - 1 else len(rows)]
        df = spark.createDataFrame(chunk, "user string")
        p = str(tmp_path / f"mg_chunk{c}")
        df.coalesce(1).write.parquet(p)
        import glob
        import shutil

        f = glob.glob(p + "/*.parquet")[0]
        dst = str(flat / f"chunk-{c:05d}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (1_700_000_000 + c, 1_700_000_000 + c))
    return spark.readStream.schema("user string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(flat))


def test_streamed_mg_partials_bound_exact_counts(spark, tmp_path):
    rows = _skewed_rows("a")
    stream = _stream_chunks(spark, tmp_path, rows)
    dest = str(tmp_path / "mg_mv")
    q = TK.start_mg_partials(stream, dest, str(tmp_path / "ckpt_mg"), key="user")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    partials = spark.read.parquet(dest)
    # bounded state: each flush appended <= k+1 rows
    n_flushes = partials.where(F.col("key").isNull()).count()
    assert n_flushes == 3
    assert partials.count() <= n_flushes * (TK.MG_STREAM_K + 1)

    exact = _exact(rows)
    merged = TK.merge_heavy_hitters(partials, top_n=10).collect()
    assert merged
    d_total = merged[0]["err_bound"]
    n_total = merged[0]["n_total"]
    assert n_total == len(rows)
    assert 0 < d_total <= n_total // (TK.MG_STREAM_K + 1)
    for r in merged:
        assert r["est"] <= exact[r["key"]] <= r["est"] + d_total, r["key"]
    # planted heavy keys (500 >> D) must lead the merged top list
    got = {r["key"] for r in merged[:3]}
    assert got == {"heavy0", "heavy1", "heavy2"}


def test_mg_merge_interval_is_flush_order_independent(spark, tmp_path):
    """Reversed flush order gives a (possibly) different summary but the
    same deterministic interval guarantees and the same heavy-key set."""
    rows = _skewed_rows("b")
    exact = _exact(rows)
    chunks = [rows[0:1000], rows[1000:2200], rows[2200:]]
    for order, tag in ((range(3), "fwd"), (reversed(range(3)), "rev")):
        dest = tmp_path / f"mg_{tag}"
        dest.mkdir()
        for c in order:
            df = spark.createDataFrame(chunks[c], "user string")
            TK.mg_flush_partial(df, "user").write.mode("append").parquet(str(dest))
        merged = TK.merge_heavy_hitters(spark.read.parquet(str(dest)), top_n=5).collect()
        d_total, n_total = merged[0]["err_bound"], merged[0]["n_total"]
        assert n_total == len(rows), tag
        assert d_total <= n_total // (TK.MG_STREAM_K + 1), tag
        for r in merged:
            assert r["est"] <= exact[r["key"]] <= r["est"] + d_total, (tag, r["key"])
        assert {r["key"] for r in merged[:3]} == {"heavy0", "heavy1", "heavy2"}, tag


def test_mg_null_keys_are_excluded_not_stringified(spark, tmp_path):
    """NULL keys must not masquerade as the string 'None' (r7 review:
    est('None') > 0 violated est ≤ true for a genuine 'None' key); they
    are excluded from ranking AND from n."""
    rows = [("a",)] * 5 + [(None,)] * 50
    df = spark.createDataFrame(rows, "user string")
    part = TK.mg_flush_partial(df, "user", k=4).collect()
    book = next(r for r in part if r["key"] is None)
    kept = {r["key"]: r["est"] for r in part if r["key"] is not None}
    assert "None" not in kept
    assert kept == {"a": 5}
    assert book["n"] == 5  # NULL rows are not counted


def test_mg_merge_reports_bound_even_with_no_survivors(spark):
    """A near-uniform flush whose survivors all compress away still yields
    one (NULL, 0, D, n) row — 'no key exceeds D' is an answer and D is
    its content (r7 review: the empty-sums crossJoin lost it)."""
    rows = [(f"u{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "user string")
    part = TK.mg_flush_partial(df, "user", k=4)
    merged = TK.merge_heavy_hitters(part, top_n=5).collect()
    assert len(merged) == 1
    r = merged[0]
    assert r["key"] is None and r["est"] == 0
    assert r["err_bound"] == 1 and r["n_total"] == 200


def test_mg_flush_partial_matches_classic_identity(spark):
    """One flush over a known multiset equals top-k of exact counts minus
    the (k+1)-th count — the same §3 identity the batch kernel is gated
    on (tests/test_freq.py), here for the DataFrame compress path."""
    rows = [("x",)] * 10 + [("y",)] * 7 + [(f"t{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "user string")
    part = TK.mg_flush_partial(df, "user", k=4).collect()
    book = next(r for r in part if r["key"] is None)
    kept = {r["key"]: r["est"] for r in part if r["key"] is not None}
    # exact counts: x=10, y=7, 100 singletons; (k+1)-th largest = 1
    assert book["d"] == 1 and book["n"] == 117
    assert kept["x"] == 9 and kept["y"] == 6
    # the two remaining slots hold singletons reduced to 0 -> dropped
    assert all(v > 0 for v in kept.values()) and len(kept) == 2
