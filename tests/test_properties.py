"""Property-based spot checks (SURVEY.md §5.4).

Each property runs over deterministic pseudo-random trade sets (seeded —
hypothesis-style generation without paying one Spark job per shrunk
example):

- partial-bars merge algebra: for ANY split of the input into micro-batches,
  merging per-batch partial bars equals the one-shot batch aggregation.
- dedup idempotence: re-ingesting any subset with a later ingested_at leaves
  the canonical dedup view unchanged on the key set, keeping latest version.
- OHLCV bar invariants: low <= open, close <= high; volume > 0; trades > 0.
- partition-pruning rewrite: month_pruned == the plain ts-range filter.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from crypto_clickhouse_poc_spark.plans import layout
from crypto_clickhouse_poc_spark.streaming import bars
from tests.conftest import SF_CORRECT, SF_SMOKE

SCHEMA = "symbol string, trade_id long, price double, qty double, ts timestamp, is_buyer_maker int, ingested_at timestamp"


def _gen_trades(seed: int, n: int = 300) -> list[tuple]:
    rng = random.Random(seed)
    t0 = datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    for i in range(n):
        rows.append(
            (
                rng.choice(["BTCUSDT", "ETHUSDT"]),
                i,
                round(rng.uniform(10, 500), 2),
                float(rng.randint(1, 50)),
                t0 + timedelta(seconds=rng.randint(0, 1800)),
                rng.randint(0, 1),
                t0 + timedelta(seconds=3600),
            )
        )
    return rows


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_partial_bars_merge_equals_batch(spark, seed):
    rows = _gen_trades(seed)
    df = spark.createDataFrame(rows, SCHEMA)
    batch = bars.bars_batch(df)

    rng = random.Random(seed + 100)
    cuts = sorted(rng.sample(range(1, len(rows)), 4))
    pieces = [rows[a:b] for a, b in zip([0] + cuts, cuts + [len(rows)])]
    partials = None
    for piece in pieces:
        p = bars.partial_bars(spark.createDataFrame(piece, SCHEMA))
        partials = p if partials is None else partials.unionByName(p)
    merged = bars.reaggregate_bars(partials)

    assert _sorted_rows(merged) == _sorted_rows(batch)


@pytest.mark.parametrize("seed", [0, 1])
def test_dedup_view_idempotent_reingestion(spark, seed):
    rows = _gen_trades(seed, n=200)
    df = spark.createDataFrame(rows, SCHEMA)
    base = layout.dedup_view(df)

    # replay a subset with a LATER ingested_at and a marker price bump
    rng = random.Random(seed + 7)
    replay = [
        (s, tid, price + 1000.0, qty, ts, m, ing + timedelta(hours=1))
        for (s, tid, price, qty, ts, m, ing) in rng.sample(rows, 50)
    ]
    dup = spark.createDataFrame(rows + replay, SCHEMA)
    dd = layout.dedup_view(dup)

    assert dd.count() == base.count()  # key set unchanged
    # every replayed key now carries the replayed (latest) version
    replayed = dd.where(F.col("price") > 1000.0).count()
    assert replayed == len({(r[4], r[0], r[1]) for r in replay})


@pytest.mark.parametrize("seed", [0])
def test_ohlcv_bar_invariants(spark, seed):
    rows = _gen_trades(seed)
    b = bars.bars_batch(spark.createDataFrame(rows, SCHEMA))
    bad = b.where(
        (F.col("low") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("open") > F.col("high"))
        | (F.col("close") < F.col("low"))
        | (F.col("close") > F.col("high"))
        | (F.col("volume") <= 0)
        | (F.col("trades") <= 0)
    )
    assert bad.count() == 0


def test_month_pruned_matches_plain_filter(spark):
    rows = []
    for m in (1, 2, 3):
        rows += [
            ("BTCUSDT", m * 1000 + i, 1.0 + i, 1.0, datetime(2024, m, 5, 10, 0, i), 0,
             datetime(2024, 3, 31))
            for i in range(10)
        ]
    df = layout.with_partition_col(spark.createDataFrame(rows, SCHEMA))
    lo, hi = datetime(2024, 2, 1), datetime(2024, 3, 4)
    pruned = layout.month_pruned(df, lo, hi)
    plain = df.where((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
    assert _sorted_rows(pruned.drop("p_month")) == _sorted_rows(plain.drop("p_month"))


def test_approx_aggregates_near_exact(spark):
    """The sketch twins (rows-only in the driver gate) stay within their
    documented error of the exact queries."""
    from crypto_clickhouse_poc_spark.operators.trades import (
        ev_price_quantiles,
        ev_price_quantiles_approx,
        ev_user_counts,
        ev_user_counts_approx,
    )

    exact_u = {r["event_type"]: r["n_users"] for r in ev_user_counts(spark, SF_SMOKE).collect()}
    approx_u = {
        r["event_type"]: r["n_users_approx"]
        for r in ev_user_counts_approx(spark, SF_SMOKE).collect()
    }
    for k, n in exact_u.items():
        assert abs(approx_u[k] - n) <= max(2, 0.1 * n), (k, n, approx_u[k])

    exact_q = {r["event_type"]: r["p50"] for r in ev_price_quantiles(spark, SF_SMOKE).collect()}
    approx_q = {
        r["event_type"]: r["p50"] for r in ev_price_quantiles_approx(spark, SF_SMOKE).collect()
    }
    for k, v in exact_q.items():
        assert abs(approx_q[k] - v) <= 0.1 * abs(v) + 1.0, (k, v, approx_q[k])


def test_sessionize_invariants(spark):
    from crypto_clickhouse_poc_spark.operators.trades import ev_sessionize

    s = ev_sessionize(spark, SF_SMOKE)
    bad = s.where(
        (F.col("n_sessions") <= 0)
        | (F.col("n_sessions") > F.col("n_events"))
        | (F.col("max_session_sec") < 0)
        | (F.col("avg_session_sec") > F.col("max_session_sec"))
    )
    assert bad.count() == 0


@pytest.mark.parametrize("seed", [7, 8])
def test_srp_pairs_subset_of_brute_force(spark, seed):
    """SRP-LSH is precision-exact by construction: for ANY vector corpus its
    output is a subset of the brute-force threshold pairs (banding only
    proposes; the exact-cosine verify decides), each pair emitted at most
    once (first-collision bands), with the identical cosine value."""
    import numpy as np

    from crypto_clickhouse_poc_spark.operators.dedup import (
        COSINE_THRESHOLD,
        srp_pairs,
    )

    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((80, 64))
    # plant a few correlated vectors so the ≥-threshold set is non-trivial
    for k in range(10):
        vecs[70 + k] = vecs[k] + 0.5 * rng.standard_normal(64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, v array<double>",
    )
    got = [(r["vec_a"], r["vec_b"], r["cosine"]) for r in srp_pairs(df).collect()]
    assert len({(a, b) for a, b, _ in got}) == len(got)  # no duplicate pairs

    norms = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ vecs.T) / np.outer(norms, norms)
    brute = {
        (a, b)
        for a in range(80)
        for b in range(a + 1, 80)
        if cos[a, b] >= COSINE_THRESHOLD - 1e-12
    }
    for a, b, c in got:
        assert (a, b) in brute, (a, b, c)
        assert abs(c - cos[a, b]) < 1e-5
    assert got  # the planted correlations produce at least one pair


def test_min_label_clusters_path_graph(spark):
    """A 64-node path is the worst case for plain min propagation (needs 63
    rounds — beyond the loop cap); pointer jumping must collapse it within
    the capped rounds. Also: two separate components keep distinct labels."""
    import pyspark.sql.functions as F

    from crypto_clickhouse_poc_spark.operators.dedup import min_label_clusters

    n = 64
    docs = spark.createDataFrame([(i,) for i in range(n + 3)], "doc_id long")
    chain = [(i, i + 1) for i in range(n - 1)]            # path 0-1-...-63
    island = [(n, n + 1), (n + 1, n + 2)]                 # separate component
    pairs = spark.createDataFrame(chain + island, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster"] for r in min_label_clusters(docs, pairs).collect()
    }
    assert all(got[i] == 0 for i in range(n))
    assert all(got[i] == n for i in (n, n + 1, n + 2))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ws_frame_codec_roundtrip(seed):
    """RFC 6455 frame codec: encode → parse roundtrips payloads across all
    three length forms (7-bit, 16-bit, 64-bit) for both masked (client)
    and unmasked (server) frames — no Spark, pure protocol property."""
    import random

    from crypto_clickhouse_poc_spark.sources.ws import (
        OP_BINARY,
        OP_TEXT,
        WSClient,
        encode_frame,
    )

    rng = random.Random(seed)
    sizes = [0, 1, 125, 126, 127, 1000, 65535, 65536, 70000]
    for size in sizes:
        for mask in (False, True):
            payload = bytes(rng.randrange(256) for _ in range(min(size, 4096)))
            payload = payload * (size // max(len(payload), 1)) + payload[
                : size % max(len(payload), 1)
            ]
            payload = payload[:size]
            opcode = OP_TEXT if rng.random() < 0.5 else OP_BINARY
            frame = encode_frame(opcode, payload, mask=mask)
            c = object.__new__(WSClient)  # parse path only — no socket
            c._rbuf = frame
            c._sock = None
            fin, op, got = c._read_frame()
            assert (fin, op, got) == (True, opcode, payload), (size, mask)
            assert c._rbuf == b""  # consumed exactly one frame


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_ewma_moment_invariants(seed):
    """Online EWMA fold invariants over random price paths: variance never
    negative, count increments by one per step, no z-score before warmup,
    and the z-score uses the PRIOR moments (a constant series after warmup
    yields z == 0 exactly once variance is 0 → no flag, never NaN/inf)."""
    import math
    import random

    from crypto_clickhouse_poc_spark.streaming.anomaly import WARMUP, ewma_step

    rng = random.Random(seed)
    mean, var, n = 0.0, 0.0, 0
    for i in range(500):
        price = 100.0 + rng.uniform(-5, 5) + (50.0 if i == 300 else 0.0)
        mean, var, n, z = ewma_step(mean, var, n, price)
        assert var >= 0.0
        assert n == i + 1
        if i < WARMUP:
            assert z is None
        if z is not None:
            assert math.isfinite(z)
    # constant series: variance decays to 0 and stays; z stays None (var==0
    # guard) — never a division by zero
    mean, var, n = 0.0, 0.0, 0
    for _ in range(50):
        mean, var, n, z = ewma_step(mean, var, n, 42.0)
        assert var == 0.0 and (z is None)


@pytest.mark.parametrize("n_buckets", [1, 4, 32])
def test_corpus_mix_two_pass_equals_full_rank(spark, n_buckets):
    """The two-pass hash-threshold selection (histogram → boundary bucket
    → partial rank) must keep EXACTLY the docs a full per-stratum rank by
    (bkt, md5, doc_id) keeps. Tiny synthetic bucket spaces force heavy
    bucket collisions (n_buckets=1 degenerates to 'everything is the
    boundary bucket'), the regime real 16-bit buckets only hit at scale."""
    from pyspark.sql.window import Window

    from crypto_clickhouse_poc_spark.operators import sampling as S

    d = S._mix_docs(spark, SF_CORRECT).withColumn(
        "bkt", F.col("bkt") % n_buckets
    )
    got = {r.doc_id for r in S._mix_kept_from(d).collect()}

    avail = d.groupBy("lang", "weight").agg(F.count("*").alias("n_avail"))
    total = avail.agg(
        F.min(F.floor(F.col("n_avail") / F.col("weight"))).alias("ft")
    )
    quota = avail.crossJoin(F.broadcast(total)).select(
        "lang", F.floor(F.col("weight") * F.col("ft")).alias("quota")
    )
    w = Window.partitionBy("lang").orderBy(
        "bkt", F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    want = {
        r.doc_id
        for r in d.withColumn("rk", F.row_number().over(w))
        .join(F.broadcast(quota), "lang")
        .where(F.col("rk") <= F.col("quota"))
        .collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [0, 1])
def test_dup_spans_planted_boilerplate_detected(spark, seed):
    """Seeded random corpus with a PLANTED boilerplate passage: every doc
    carrying the passage must report dup_spans >= the passage's span count
    and appear in ONE shared span-cluster; clean docs (disjoint vocab)
    must report dup_frac = 0 and stay singletons."""
    import random as _random

    from crypto_clickhouse_poc_spark.operators.dedup import (
        SPAN_K,
        doc_dup_spans,
        dup_span_clusters,
    )

    rng = _random.Random(seed)
    boiler = " ".join(f"b{i}" for i in range(SPAN_K + 4))  # 12 tokens → 5 spans
    carriers = set(rng.sample(range(20), 6))
    rows = []
    for d in range(20):
        # per-doc unique vocab → zero cross-doc spans except the boilerplate
        body = " ".join(f"d{d}w{j}" for j in range(30))
        text = f"{body} {boiler}" if d in carriers else body
        rows.append((d, text, "en", "src", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import tempfile, os

    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))

    frac = {r["doc_id"]: r for r in doc_dup_spans(spark, tmp).collect()}
    n_boiler_spans = (SPAN_K + 4) - SPAN_K + 1  # 5 fully-inside spans
    for d in range(20):
        if d in carriers:
            assert frac[d]["dup_spans"] >= n_boiler_spans, (d, frac[d])
        else:
            assert frac[d]["dup_spans"] == 0, (d, frac[d])

    lbl = {r["doc_id"]: r for r in dup_span_clusters(spark, tmp).collect()}
    carrier_clusters = {lbl[d]["cluster"] for d in carriers}
    assert carrier_clusters == {min(carriers)}
    for d in range(20):
        if d not in carriers:
            assert lbl[d]["cluster_n"] == 1, (d, lbl[d])


def test_twopass_quantiles_equal_exact_on_skewed_corpus(spark, tmp_path):
    """ev_price_quantiles_twopass (distributed two-pass selection, no
    per-group value buffering) must be BIT-identical to F.percentile on a
    heavy-tailed synthetic corpus with duplicate values — interpolation,
    boundary buckets, degenerate groups and all."""
    import os

    from crypto_clickhouse_poc_spark.operators.trades import (
        ev_price_quantiles,
        ev_price_quantiles_twopass,
    )

    rng = random.Random(11)
    rows = [
        (f"t{i % 4}", float(int(rng.lognormvariate(0, 2) * 100)) / 100)
        for i in range(15000)
    ]
    rows += [("flat", 42.0)] * 50  # degenerate all-equal group
    df = spark.createDataFrame(rows, "event_type string, price double").repartition(9)
    ev = df.select(
        F.monotonically_increasing_id().alias("event_id"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        "event_type",
        F.col("price").alias("value"),
        F.lit('{"k": 1}').alias("props"),
    )
    sf = str(tmp_path / "qsf")
    ev.write.parquet(os.path.join(sf, "events.parquet"))
    exact = sorted(tuple(r) for r in ev_price_quantiles(spark, sf).collect())
    got = sorted(tuple(r) for r in ev_price_quantiles_twopass(spark, sf).collect())
    assert got == exact


def test_leakage_safe_split_never_straddles_near_dup_pairs(spark):
    """The property the split exists for: for EVERY verified LSH near-dup
    pair, both docs land in the same split (per-doc hashing would put
    ~19% of pairs across a boundary at 80/10/10); and all three splits
    are non-empty at the fixture scale."""
    from crypto_clickhouse_poc_spark.operators.dedup import _lsh_pairs
    from crypto_clickhouse_poc_spark.operators.sampling import (
        corpus_split_leakage_safe,
    )

    split = corpus_split_leakage_safe(spark, SF_CORRECT)
    pairs = _lsh_pairs(spark, SF_CORRECT).select("doc_a", "doc_b")
    a = split.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    b = split.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    straddle = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .where(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddle == 0
    assert pairs.count() > 0  # the gate is vacuous on a pairless fixture
    got = {r["split"] for r in split.select("split").distinct().collect()}
    assert got == {"train", "validation", "test"}


def test_incremental_split_assignment_leak_directions(spark):
    """Both leak directions of the append-time split: (1) no new-new
    near-dup pair straddles splits; (2) every anchored new cluster's
    split equals its anchor's split in the BASE-ONLY leakage-safe
    assignment (a new copy of a train doc can't land in eval)."""
    from crypto_clickhouse_poc_spark.operators.dedup import (
        INCREMENT_SPLIT,
        _lsh_pairs,
        min_label_clusters,
    )
    from crypto_clickhouse_poc_spark.operators.sampling import (
        corpus_split_assign_new,
    )
    from crypto_clickhouse_poc_spark.tables import load

    out = corpus_split_assign_new(spark, SF_CORRECT)
    pairs = _lsh_pairs(spark, SF_CORRECT).select("doc_a", "doc_b")
    nn = pairs.where(
        (F.col("doc_a") >= INCREMENT_SPLIT) & (F.col("doc_b") >= INCREMENT_SPLIT)
    )
    a = out.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = out.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    straddle = (
        nn.join(a, "doc_a").join(b, "doc_b").where(F.col("sa") != F.col("sb"))
    )
    assert straddle.count() == 0 and nn.count() > 0

    # anchored consistency against the base-only split
    docs = load(spark, SF_CORRECT, "documents").select("doc_id")
    bp = pairs.where(
        (F.col("doc_a") < INCREMENT_SPLIT) & (F.col("doc_b") < INCREMENT_SPLIT)
    )
    base_lbl = min_label_clusters(
        docs.where(F.col("doc_id") < INCREMENT_SPLIT), bp
    )
    bkt = (
        F.conv(F.substring(F.md5(F.col("cluster").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    base = base_lbl.select(
        F.col("doc_id").alias("anchor"),
        F.when(bkt < 80, "train")
        .when(bkt < 90, "validation")
        .otherwise("test")
        .alias("base_split"),
    )
    anchored = out.where(F.col("anchor").isNotNull())
    bad = anchored.join(base, "anchor").where(
        F.col("split") != F.col("base_split")
    )
    assert bad.count() == 0 and anchored.count() > 0


def test_split_assign_new_accepts_persisted_base_assignment(spark):
    """The production append path: passing the PERSISTED base
    ``(doc_id, split)`` assignment must yield row-identical results to
    the self-contained fixture recompute — the parameter only changes
    where the anchor lookup reads from, never the assignment rule."""
    from crypto_clickhouse_poc_spark.operators.dedup import (
        INCREMENT_SPLIT,
        _lsh_pairs,
        min_label_clusters,
    )
    from crypto_clickhouse_poc_spark.operators.sampling import (
        corpus_split_assign_new,
        split_of_cluster,
    )
    from crypto_clickhouse_poc_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents").select("doc_id")
    pairs = _lsh_pairs(spark, SF_CORRECT).select("doc_a", "doc_b")
    bp = pairs.where(
        (F.col("doc_a") < INCREMENT_SPLIT) & (F.col("doc_b") < INCREMENT_SPLIT)
    )
    persisted = min_label_clusters(
        docs.where(F.col("doc_id") < INCREMENT_SPLIT), bp
    ).select("doc_id", split_of_cluster(F.col("cluster")).alias("split"))

    got = sorted(
        map(tuple, corpus_split_assign_new(spark, SF_CORRECT, persisted).collect())
    )
    want = sorted(map(tuple, corpus_split_assign_new(spark, SF_CORRECT).collect()))
    assert got == want and len(got) > 0
