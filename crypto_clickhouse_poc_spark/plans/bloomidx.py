"""Per-file Bloom index for point lookups on snapshot tables.

The manifest's footer stats already prune by RANGE (``ts_range`` reads
skip files whose min/max exclude the bound). Point lookups on a
high-cardinality key ("fetch trade 982734", "find document <hash>")
get nothing from ranges — at 100 TB the query otherwise opens every
file the month prune leaves. The lakehouse answer (Delta's bloom-filter
index, Hudi's bloom metadata, Iceberg puffin blobs) is a tiny per-FILE
Bloom filter on the key: a probe touches k bit positions, a file whose
filter misses any of them provably lacks the key, and false positives
only cost a wasted scan — never a wrong result, because the predicate
is re-applied to the survivors (the repo-wide contract: pruning is an
optimization, never a semantics change).

Design — an ADVISORY SIDECAR, not a commit:

- ``build_bloom_index`` scans one snapshot version grouped by
  ``_metadata.file_path`` into (file, word, bits) rows — the same
  portable md5 bit arithmetic as ``operators/bloom.py`` (one explode +
  one map-side-combined ``bit_or`` aggregate; ≤ BLOOM_WORDS rows per
  file, ~2 KB each) — written under ``_idx/`` and published with an
  atomic pointer swap.
- Readers treat the index as a hint keyed by file path: a manifest file
  ABSENT from the index (appended after the build, or never indexed) is
  always read. Correctness never depends on index freshness; rebuild
  cadence is a cost knob, exactly like OPTIMIZE.
- ``read_point`` probes with a word-pushed scan of the sidecar (k words
  of the grid, not the whole index), prunes the manifest's file list,
  and re-applies the equality predicate through the normal DV-aware
  read path — deletes stay applied.
- ``vacuum`` never scans ``_idx`` (it sweeps ``data/`` and ``_dv``), so
  an index outlives retention; a dropped index is just an unlinked dir.

Scale: the index is O(files x BLOOM_WORDS) rows with the probe reading
O(files x k/BLOOM_WORDS) of it; the driver materializes verdicts only
for files that survive the earlier month/ts pruning — the same
driver-side O(manifest) the log already carries.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloom import _word_bits, bloom_positions
from . import snapshots as S

IDX_DIR = "_idx"


def _pointer(path: str, key_col: str) -> Path:
    return Path(path) / IDX_DIR / f"bloom-{key_col}.json"


BITS_PER_KEY = 10  # ~1% false-positive rate at k=4
_MIN_BITS = 1 << 14  # 2 KB floor
_MAX_BITS = 1 << 25  # 4 MB/file ceiling — beyond this, split the file


def build_bloom_index(spark: SparkSession, path: str, key_col: str) -> dict | None:
    """Build + atomically publish the per-file Bloom index of ``key_col``
    over the CURRENT head's files. One scan of the snapshot (column-
    pruned to the key + file metadata), one hash aggregate. The filter
    is AUTO-SIZED to the largest file's row count (~BITS_PER_KEY bits
    per key, power of two): a fixed-size filter silently saturates into
    all-maybe once files outgrow it — measured on a 62k-rows/file table,
    16 Kib filters pruned nothing. Returns the published pointer
    ({dir, version, n_files, bits}), or None for an empty head (nothing
    to index — an existing pointer is left in place).

    Key types are restricted to integral/string/date: Python's str() and
    Spark's cast-to-string disagree on float/decimal rendering
    ('1e+20' vs '1.0E20'), which would make the driver-side probe hash
    DIFFERENT positions than the build — a Bloom false negative, the one
    error class the structure promises away. Rejected loudly here."""
    head = S.latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no snapshots at {path}")
    m = S.manifest(path, head)
    if not m["files"]:
        return None  # empty head (e.g. retention dropped every month)
    df = S._read_files(spark, path, m["files"], merge_schema=True)
    kind = df.schema[key_col].dataType.typeName()
    if kind not in ("integer", "long", "short", "byte", "string", "date"):
        raise TypeError(
            f"bloom index key {key_col} has type {kind}: float/decimal/"
            "timestamp keys render differently in Python str() and Spark "
            "CAST AS STRING, so the probe could false-negative — index an "
            "integral/string key instead"
        )
    max_rows = max((f.get("rows", 0) for f in m["files"]), default=0)
    bits = _MIN_BITS
    while bits < min(_MAX_BITS, BITS_PER_KEY * max(1, max_rows)):
        bits <<= 1
    # null keys contribute no bits; a file holding ONLY nulls is then
    # absent from the index, and pruning it is correct — an equality
    # probe can never match null
    pos = df.where(F.col(key_col).isNotNull()).select(
        S._dv_file_expr().alias("file"),
        F.explode(
            bloom_positions(F.col(key_col).cast("string"), bits=bits)
        ).alias("pos"),
    )
    words = _word_bits(pos).groupBy("file", "word").agg(F.bit_or("bits").alias("bits"))
    idx_root = Path(path) / IDX_DIR
    idx_root.mkdir(parents=True, exist_ok=True)
    tmp = idx_root / f".build-{uuid.uuid4().hex[:12]}"
    words.write.mode("error").parquet(str(tmp))
    dest = idx_root / f"bloom-{key_col}-v{head}-{uuid.uuid4().hex[:6]}"
    os.replace(tmp, dest)
    meta = {"dir": dest.name, "version": head, "n_files": len(m["files"]), "bits": bits}
    ptr_tmp = idx_root / f".ptr-{uuid.uuid4().hex}"
    old = _pointer(path, key_col)
    old_meta = json.loads(old.read_text()) if old.exists() else {}
    # one-generation grace window: keep the directly superseded build on
    # disk (a reader holding the old pointer may still be scanning it)
    # and delete only the GRANDPARENT — the same retention idea vacuum
    # applies to data files, at depth 1
    meta["prev"] = old_meta.get("dir")
    ptr_tmp.write_text(json.dumps(meta))
    os.replace(ptr_tmp, old)
    grandparent = old_meta.get("prev")
    if grandparent and grandparent not in (dest.name, meta["prev"]):
        shutil.rmtree(idx_root / grandparent, ignore_errors=True)
    return meta


def _need_words(value, bits: int) -> dict[int, int]:
    """The probe's k positions as {word: required-bits mask} — pure md5
    arithmetic computed DRIVER-side (hashlib mirrors bloom_positions
    exactly; the shared arithmetic is pinned by a test)."""
    import hashlib

    from ..operators.bloom import BLOOM_HASHES, WORD_BITS

    need: dict[int, int] = {}
    for j in range(BLOOM_HASHES):
        pos = int(hashlib.md5(f"{j}:{value}".encode()).hexdigest()[:8], 16) % bits
        need[pos // WORD_BITS] = need.get(pos // WORD_BITS, 0) | (
            1 << (pos % WORD_BITS)
        )
    return need


def _maybe_files(
    spark: SparkSession, path: str, key_col: str, values: list
) -> tuple[set[str], dict] | None:
    """(file paths the index CANNOT rule out for ANY of ``values``, the
    pointer meta the probe actually used) — or None when no index exists
    (prune nothing). Meta rides along so the caller derives coverage
    from the SAME pointer read (a concurrent rebuild between two reads
    would otherwise prune files the probe never saw). ONE word-pushed
    scan of the sidecar covers every probe value: the scan reads only
    the union of the k words each value hashes to."""
    ptr = _pointer(path, key_col)
    if not ptr.exists():
        return None
    meta = json.loads(ptr.read_text())
    bits = meta.get("bits", 1 << 14)
    needs = {str(v): _need_words(v, bits) for v in values}
    all_words = {w for need in needs.values() for w in need}
    if not all_words:
        return set(), meta
    idx = spark.read.parquet(str(Path(path) / IDX_DIR / meta["dir"]))
    rows = (
        idx.where(F.col("word").isin(*[int(w) for w in all_words]))
        .select("file", "word", "bits")
        .collect()
    )
    got: dict[str, dict[int, int]] = {}
    for r in rows:
        got.setdefault(r.file, {})[r.word] = r.bits
    # a file survives if SOME value's words are all present with all
    # bits set; a missing word row means an unset bit -> that value is
    # ruled out for that file
    return {
        f
        for f, words in got.items()
        if any(
            all(words.get(w, 0) & req == req for w, req in need.items())
            for need in needs.values()
        )
    }, meta


def maybe_rebuild_bloom_index(
    spark: SparkSession, path: str, key_col: str, max_stale_files: int = 16
) -> dict | None:
    """Rebuild POLICY (the twin of ``snapshots.maybe_compact_snapshot``):
    every head file the index never saw is read UNPRUNED by point
    lookups, so staleness degrades the index gracefully toward a full
    scan. When more than ``max_stale_files`` of the head's files are
    outside the indexed version's manifest (post-build appends, rollback
    re-exposures), or no index exists yet, rebuild at the current head.
    The check is two manifest reads + one pointer read — no Spark job
    when under threshold. Returns the new pointer, or None if fresh
    enough (or the head is empty)."""
    head = S.latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no snapshots at {path}")
    ptr = _pointer(path, key_col)
    if ptr.exists():
        meta = json.loads(ptr.read_text())
        covered = {f["path"] for f in S.manifest(path, meta["version"])["files"]}
        stale = sum(
            1 for f in S.manifest(path, head)["files"] if f["path"] not in covered
        )
        if stale <= max_stale_files:
            return None
    return build_bloom_index(spark, path, key_col)


def read_points(
    spark: SparkSession, path: str, key_col: str, values: list
) -> DataFrame:
    """Batched point lookup through the index: prune the head manifest's
    files to those the Bloom cannot rule out for ANY probe value (files
    the index never saw are always kept), read the survivors DV-aware,
    and re-apply the IN predicate. Equals a full-scan filter by
    construction; the whole probe costs one word-pushed index scan
    regardless of how many keys are batched.

    Coverage is EXACT, not heuristic: a file is prunable only when it
    was part of the indexed version's own manifest (one O(1)-checkpointed
    manifest read). An added_v comparison would be wrong under rollback
    — a rollback can re-expose files OLDER than the build that the
    build's head didn't contain, and those must be read."""
    head = S.latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no snapshots at {path}")
    m = S.manifest(path, head)
    probed = _maybe_files(spark, path, key_col, values)
    if probed is None:
        files = m["files"]
    else:
        maybe, meta = probed
        covered = {f["path"] for f in S.manifest(path, meta["version"])["files"]}
        files = [
            f
            for f in m["files"]
            # not in the build's manifest (post-build append, rollback
            # re-exposure): the index knows nothing about it -> read
            if f["path"] not in covered or f["path"] in maybe
        ]
    wanted = [str(v) for v in values]
    if not files:
        return (
            S._empty_like(spark, path)
            .drop(S.TXN_COL)
            .where(F.col(key_col).cast("string").isin(*wanted))
        )
    df = S._apply_dvs(
        spark, S._read_files(spark, path, files, merge_schema=True), m, path
    ).drop(S.TXN_COL)
    return df.where(F.col(key_col).cast("string").isin(*wanted))


def read_point(spark: SparkSession, path: str, key_col: str, value) -> DataFrame:
    """Single-key point lookup — ``read_points`` with one probe value."""
    return read_points(spark, path, key_col, [value])
