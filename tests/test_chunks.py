"""doc_chunks semantic gates (value parity vs DuckDB is covered by
tests/test_oracle_parity.py): window/stride arithmetic at the boundaries
— full coverage with no redundant trailing window — plus fingerprint
content and the NULL-text guard."""

from __future__ import annotations

import hashlib
import os
import tempfile

from crypto_clickhouse_poc_spark.operators import text as TX
from crypto_clickhouse_poc_spark.operators.text import CHUNK_STRIDE, CHUNK_TOKENS


def _sf(spark, docs):
    sf = tempfile.mkdtemp()
    spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t) if t else 0) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    return sf


def _words(n, tag=""):
    return " ".join(f"w{tag}{i}" for i in range(n))


def test_window_boundaries(spark):
    sf = _sf(
        spark,
        [
            (1, _words(100)),  # starts 0, 48; 96 adds nothing (covered to 99)
            (2, _words(10)),  # shorter than one window -> one chunk
            (3, _words(CHUNK_TOKENS)),  # exactly one window
            (4, _words(CHUNK_TOKENS + 1)),  # one token past -> second window
            (5, None),  # NULL text -> no chunks, no crash
        ],
    )
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_start, r.n_chunk_tokens)
        for r in TX.doc_chunks(spark, sf).collect()
    }
    assert got == {
        (1, 0): (0, 64),
        (1, 1): (48, 52),
        (2, 0): (0, 10),
        (3, 0): (0, 64),
        (4, 0): (0, 64),
        (4, 1): (48, 17),
    }


def test_chunks_cover_every_token_exactly(spark):
    for n in (1, 5, CHUNK_STRIDE, CHUNK_TOKENS, 65, 96, 112, 113, 200):
        sf = _sf(spark, [(1, _words(n))])
        spans = [
            (r.chunk_start, r.chunk_start + r.n_chunk_tokens)
            for r in TX.doc_chunks(spark, sf).collect()
        ]
        covered = set()
        for a, b in spans:
            covered |= set(range(a, b))
        assert covered == set(range(n)), f"n={n}: {spans}"
        # no window is fully contained in its predecessor
        ends = [b for _, b in sorted(spans)]
        assert ends == sorted(set(ends)), f"n={n}: redundant window {spans}"


def test_fingerprint_is_md5_of_window(spark):
    text = _words(80)
    sf = _sf(spark, [(7, text)])
    w = text.split(" ")
    rows = {r.chunk_id: r for r in TX.doc_chunks(spark, sf).collect()}
    for cid, r in rows.items():
        window = " ".join(w[r.chunk_start : r.chunk_start + CHUNK_TOKENS])
        assert r.chunk_md5 == hashlib.md5(window.encode()).hexdigest()
