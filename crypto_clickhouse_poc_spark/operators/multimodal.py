"""Multimodal column surface: opaque ``binary`` payloads + typed metadata.

The pattern a 100 TB training-data pipeline needs: media (image/audio/video)
stored as an opaque binary column beside typed metadata columns, with
decode / feature-extract / resize / frame-sample implemented as Arrow-batched
Pandas UDFs (``mapInPandas``) so the heavy kernels run vectorized per batch
and the *plan* stays a single embarrassingly-parallel scan — no shuffle at
any step, which is exactly what makes these run at scale.

The fixture set has no binary tables, so the media table is **derived
deterministically from ``documents``**: payload = UTF-8 bytes of ``text``,
modality and metadata are integer arithmetic on ``doc_id``. Everything is
therefore reproducible in the DuckDB oracle (fixture text is pure ASCII —
verified octet_length == length — so byte offsets == char offsets).

Real image/audio decoding (PIL / soundfile / av) is NOT in this container.
Per the build contract, the real decode step is STUBBED: kernels try the
real library first and fall back to a deterministic fake (documented in each
docstring); ``decode_real`` raises ``NotImplementedError`` so the boundary
is explicit. The Spark-side plumbing — binary column handling, Arrow batch
iteration, UDF signatures, output schemas — is real and oracle-tested.

Reference note: the reference repo (Deniskerec/crypto-clickhouse-POC) has no
multimodal surface; this module is part of the beyond-reference extension
set (BASELINE.json north star).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load

FRAME_BYTES = 64  # fake video codec: fixed-size frames
FRAME_SAMPLE_EVERY = 4  # keep every 4th frame
THUMB_FRACTION = 4  # fake thumbnail: first 1/4 of the payload bytes
AUDIO_BYTES_PER_SAMPLE = 2  # fake PCM16 mono


def decode_real(payload: bytes, modality: str) -> None:
    """The *real* decode boundary — image/audio/video codec libraries are not
    available in this environment. A production deployment implements this
    with PIL / soundfile / av inside the same Pandas-UDF kernels below; the
    Spark plumbing (schemas, batching, partitioning) is unchanged.
    """
    raise NotImplementedError(
        f"real {modality} decoding requires codec libraries (PIL/soundfile/av) "
        "not present in this container; kernels use the deterministic fake codec"
    )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media table: (media_id, modality, payload binary, typed metadata).

    Modality and metadata are deterministic functions of ``doc_id`` so the
    oracle can re-derive them; payload is the UTF-8 bytes of ``text``.
    Metadata columns are NULL where the modality doesn't define them — the
    typed-sparse-metadata layout a mixed-modality table uses in practice.
    """
    d = load(spark, sf_dir, "documents")
    media_id = F.col("doc_id")
    mod3 = media_id % 3
    modality = (
        F.when(mod3 == 0, F.lit("image"))
        .when(mod3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        media_id.alias("media_id"),
        modality.alias("modality"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.when(mod3 == 0, 32 + (media_id % 8) * 16).alias("width"),
        F.when(mod3 == 0, 24 + (media_id % 6) * 16).alias("height"),
        F.when(mod3 == 1, 8000 * (1 + media_id % 3)).alias("sample_rate"),
        F.when(mod3 == 2, 24 + (media_id % 2) * 6).alias("fps"),
    )


def mm_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata catalog scan: per-item size, content hash, and
    modality-specific derived fields (audio duration, video frame count).

    Pure projection over the media table — one scan, no shuffle, every
    expression JVM-side (md5 runs on the binary payload directly).
    """
    m = media_table(spark, sf_dir)
    return m.select(
        "media_id",
        "modality",
        "n_bytes",
        F.md5("payload").alias("payload_md5"),
        "width",
        "height",
        "sample_rate",
        "fps",
        # NULL sample_rate (non-audio) propagates → NULL audio_sec, as in the oracle
        F.round(
            F.col("n_bytes") / (F.lit(float(AUDIO_BYTES_PER_SAMPLE)) * F.col("sample_rate")), 6
        ).alias("audio_sec"),
        F.when(
            F.col("modality") == "video",
            F.ceil(F.col("n_bytes") / F.lit(float(FRAME_BYTES))).cast("long"),
        ).alias("n_frames"),
    )


def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``.

    The deterministic fake "decoder": interpret the payload as a raw byte
    array (numpy ``frombuffer``) and emit integer-exact byte statistics plus
    a rounded mean. A real deployment swaps the kernel body for an actual
    decode + embedding model per Arrow batch (see ``decode_real``); the
    dataflow — binary column in, fixed-width feature row out, zero shuffle —
    is identical.
    """

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n_rows = len(pdf)
            if n_rows == 0:
                continue
            # One pass over the whole Arrow batch, no per-row Python work:
            # concatenate payloads into a single uint8 buffer and reduce per
            # segment. Payloads are non-empty by construction (document text);
            # reduceat requires that (a zero-length segment would misread).
            lens = np.fromiter(
                (len(p) for p in pdf["payload"]), dtype=np.int64, count=n_rows
            )
            if not lens.all():  # loud, not silently-wrong reduceat segments
                raise ValueError("mm_byte_features: empty payload in batch")
            buf = np.frombuffer(b"".join(pdf["payload"]), dtype=np.uint8)
            starts = np.zeros(n_rows, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sums = np.add.reduceat(buf.astype(np.int64), starts)
            # distinct bytes per row: a rows x 256 presence matrix (1 byte per
            # cell -> ~256 B/row) indexed by (row-of-each-byte, byte value)
            seen = np.zeros((n_rows, 256), dtype=bool)
            seen[np.repeat(np.arange(n_rows), lens), buf] = True
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype(np.int64),
                    "n_bytes": lens,
                    "sum_bytes": sums,
                    "min_byte": np.minimum.reduceat(buf, starts).astype(np.int64),
                    "max_byte": np.maximum.reduceat(buf, starts).astype(np.int64),
                    "n_distinct_bytes": seen.sum(axis=1, dtype=np.int64),
                    "mean_byte": np.round(sums / lens, 6),
                }
            )

    m = media_table(spark, sf_dir).select("media_id", "payload")
    return m.mapInPandas(
        kernel,
        "media_id long, n_bytes long, sum_bytes long, min_byte long, "
        "max_byte long, n_distinct_bytes long, mean_byte double",
    )


def mm_byte_features_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` twin of ``mm_byte_features`` — same semantics, same
    oracle, one fewer copy.

    Why it exists: with ``mapInPandas`` a binary column materializes as a
    pandas object column of Python ``bytes`` (one heap object per row, then
    ``b"".join`` re-concatenates them). ``mapInArrow`` hands the kernel the
    raw Arrow ``RecordBatch``, whose BinaryArray is ALREADY the
    (offsets, contiguous-bytes) layout the numpy kernel wants — the buffers
    are read zero-copy and no per-row Python objects are created. For
    byte-level kernels over large payloads this is the lowest-overhead
    Python boundary Spark offers (measured A/B in PERF.md).
    """

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            arr = rb.column(rb.schema.get_field_index("payload"))
            if isinstance(arr, pa.ChunkedArray):  # pragma: no cover - API guard
                arr = arr.combine_chunks()
            if pa.types.is_large_binary(arr.type):
                off_dtype = np.int64
            else:
                off_dtype = np.int32
            raw_offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)
            offs = raw_offs[arr.offset : arr.offset + n + 1].astype(np.int64)
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
            starts = offs[:-1] - offs[0]
            lens = offs[1:] - offs[:-1]
            # same precondition as the pandas twin, enforced loudly: an
            # empty payload makes reduceat read a neighbor's segment (and
            # a trailing empty would index past the buffer)
            if not lens.all():
                raise ValueError("mm_byte_features_arrow: empty payload in batch")
            sums = np.add.reduceat(data.astype(np.int64), starts)
            seen = np.zeros((n, 256), dtype=bool)
            seen[np.repeat(np.arange(n), lens), data] = True
            ids = rb.column(rb.schema.get_field_index("media_id")).to_numpy(
                zero_copy_only=False
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.astype(np.int64)),
                    pa.array(lens),
                    pa.array(sums),
                    pa.array(np.minimum.reduceat(data, starts).astype(np.int64)),
                    pa.array(np.maximum.reduceat(data, starts).astype(np.int64)),
                    pa.array(seen.sum(axis=1, dtype=np.int64)),
                    pa.array(np.round(sums / lens, 6)),
                ],
                names=[
                    "media_id",
                    "n_bytes",
                    "sum_bytes",
                    "min_byte",
                    "max_byte",
                    "n_distinct_bytes",
                    "mean_byte",
                ],
            )

    m = media_table(spark, sf_dir).select("media_id", "payload")
    return m.mapInArrow(
        kernel,
        "media_id long, n_bytes long, sum_bytes long, min_byte long, "
        "max_byte long, n_distinct_bytes long, mean_byte double",
    )


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize (thumbnail) plumbing via ``mapInPandas`` on image rows.

    Fake codec: the "thumbnail" is the first ceil(n_bytes/4) payload bytes
    and halved dimensions; a real deployment calls PIL inside the kernel
    (``decode_real`` marks that boundary). Output carries the new dims, the
    thumbnail byte count, and its md5 — enough for the oracle to verify the
    byte-slicing plumbing end-to-end.
    """

    def kernel(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                n = len(payload)
                thumb = payload[: (n + THUMB_FRACTION - 1) // THUMB_FRACTION]
                rows.append(
                    (
                        int(mid),
                        int(w),
                        int(h),
                        int(w) // 2,
                        int(h) // 2,
                        len(thumb),
                        hashlib.md5(thumb).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "thumb_width",
                    "thumb_height",
                    "thumb_bytes",
                    "thumb_md5",
                ],
            )

    m = media_table(spark, sf_dir).where(F.col("modality") == "image")
    return m.select("media_id", "payload", "width", "height").mapInPandas(
        kernel,
        "media_id long, width long, height long, thumb_width long, "
        "thumb_height long, thumb_bytes long, thumb_md5 string",
    )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling with pure built-ins over the binary payload.

    Fake codec: fixed 64-byte frames; keep every 4th frame index, slice the
    frame's bytes with binary ``substring`` and fingerprint it. The plan is
    scan → sequence/explode → per-row projection: the row multiplier is
    frames/video, the shuffle count is zero — sampling 100 TB of video is
    exactly this shape with a real demuxer in place of byte slicing.
    """
    m = media_table(spark, sf_dir).where(F.col("modality") == "video")
    n_frames = F.ceil(F.col("n_bytes") / F.lit(float(FRAME_BYTES))).cast("int")
    frames = m.select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(FRAME_SAMPLE_EVERY))
        ).alias("frame_idx"),
    )
    frame_bytes = F.substring(
        F.col("payload"), F.col("frame_idx") * FRAME_BYTES + 1, FRAME_BYTES
    )
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.octet_length(frame_bytes).cast("long").alias("frame_bytes"),
        F.md5(frame_bytes).alias("frame_md5"),
    )


def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio feature extraction: fixed one-second windows (fake
    PCM16 mono: sample_rate × 2 bytes each) with per-window byte statistics.

    The kernel fans out rows (one input row → n_windows output rows) inside
    ``mapInPandas`` — the shape of frame-level audio featurization (VAD,
    energy, fingerprinting) at scale: decode+window inside the kernel, keep
    the plan a shuffle-free scan, let the row multiplier be windows/clip.
    """

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload, sr in zip(
                pdf["media_id"], pdf["payload"], pdf["sample_rate"]
            ):
                win = int(sr) * AUDIO_BYTES_PER_SAMPLE
                b = np.frombuffer(payload, dtype=np.uint8)
                for w in range(0, len(b), win):
                    chunk = b[w : w + win]
                    rows.append(
                        (
                            int(mid),
                            w // win,
                            int(chunk.size),
                            round(float(chunk.sum()) / chunk.size, 6),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "window_idx", "n_bytes", "mean_byte"]
            )

    m = media_table(spark, sf_dir).where(F.col("modality") == "audio")
    return m.select("media_id", "payload", "sample_rate").mapInPandas(
        kernel, "media_id long, window_idx long, n_bytes long, mean_byte double"
    )


PHASH_ROWS, PHASH_COLS = 8, 9  # dHash grid: 8 rows x 9 cols -> 64 bits
PHASH_CELLS = PHASH_ROWS * PHASH_COLS
PHASH_BANDS = 4  # 16 bits per band -> small-int band keys
PHASH_HAMMING_MAX = 6


def mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (dHash) near-duplicate IMAGE pairs — the multimodal
    member of the dedup family.

    Fake decode (same contract as the other kernels — a real deployment
    decodes with PIL inside the same batch kernel, ``decode_real`` marks
    the boundary): the payload byte stream is resampled to an 8×9 grid of
    integer cell means, and dHash bit (r, c) = grid[r][c] < grid[r][c+1]
    — 64 bits, robust to brightness/scaling in the real-image case
    because it encodes horizontal gradients, not absolute values. The 64
    bits split into 4 16-bit band keys, and candidates come from the same
    first-collision band equi-joins as ``dedup.dedup_minhash_lsh`` (a
    near-dup pair differing in ≤6 of 64 bits has ≥1 clean band with high
    probability — banding is the standard hamming-LSH); the verify
    recomputes TRUE hamming distance via ``bit_count(xor)`` over the
    bands and keeps pairs ≤ PHASH_HAMMING_MAX. Shuffle stays O(images),
    never O(pairs). All arithmetic is integer (byte sums, floor
    division), so the DuckDB oracle is bit-exact. On the word-soup
    fixture image payloads are near-random byte streams — the closest
    pair sits at hamming 13, so the fixture result is legitimately empty
    (both engines agree); recall on PLANTED perturbed payloads is covered
    by tests/test_lsh_quality.py.
    """
    m = media_table(spark, sf_dir).where(
        (F.col("modality") == "image") & (F.col("n_bytes") >= PHASH_CELLS)
    )
    return phash_pairs(m.select("media_id", "payload"))


def phash_pairs(images: DataFrame) -> DataFrame:
    """dHash near-dup pairs from any ``(media_id, payload binary)`` frame —
    the dataflow behind ``mm_phash_pairs`` (see there for the anatomy).
    Rows with NULL payloads or fewer than PHASH_CELLS bytes are skipped in
    the kernel (a grid cell would be empty — nothing to hash)."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                n = len(b)
                if n < PHASH_CELLS:
                    continue
                cells = []
                for k in range(PHASH_CELLS):
                    lo, hi = k * n // PHASH_CELLS, (k + 1) * n // PHASH_CELLS
                    seg = b[lo:hi]
                    cells.append(sum(seg) // len(seg))
                vals = [0] * PHASH_BANDS
                for i in range(PHASH_ROWS * (PHASH_COLS - 1)):
                    r, c = divmod(i, PHASH_COLS - 1)
                    if cells[r * PHASH_COLS + c] < cells[r * PHASH_COLS + c + 1]:
                        vals[i // 16] |= 1 << (i % 16)
                rows.append((int(mid), *vals))
            yield pd.DataFrame(
                rows, columns=["media_id"] + [f"pb{j}" for j in range(PHASH_BANDS)]
            )

    sig = images.mapInPandas(
        kernel,
        "media_id long, " + ", ".join(f"pb{j} int" for j in range(PHASH_BANDS)),
    )
    a, b = sig.alias("a"), sig.alias("b")
    ham = None
    for j in range(PHASH_BANDS):
        term = F.bit_count(F.col(f"a.pb{j}").bitwiseXOR(F.col(f"b.pb{j}")))
        ham = term if ham is None else ham + term
    parts = []
    for i in range(PHASH_BANDS):
        cond = (F.col(f"a.pb{i}") == F.col(f"b.pb{i}")) & (
            F.col("a.media_id") < F.col("b.media_id")
        )
        for j in range(i):
            cond = cond & (F.col(f"a.pb{j}") != F.col(f"b.pb{j}"))
        parts.append(
            a.join(b, cond).select(
                F.col("a.media_id").alias("media_a"),
                F.col("b.media_id").alias("media_b"),
                ham.cast("long").alias("hamming"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.where(F.col("hamming") <= PHASH_HAMMING_MAX)


def mm_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup CLUSTERS: connected components over the phash pair
    graph, canonical = the cluster's smallest media_id — the image-modality
    twin of ``dedup.dedup_clusters``, reusing the same min-label-propagation
    fixpoint (``dedup.min_label_clusters``). This is the curation output a
    pipeline consumes (keep one image per cluster); on the word-soup
    fixture the pair graph is legitimately empty (see ``mm_phash_pairs``),
    so every image is its own canonical — the oracle checks exactly that,
    and real clustering is exercised on planted perturbed payloads in
    tests/test_lsh_quality.py.
    """
    from .dedup import min_label_clusters

    m = media_table(spark, sf_dir).where(
        (F.col("modality") == "image") & (F.col("n_bytes") >= PHASH_CELLS)
    )
    pairs = phash_pairs(m.select("media_id", "payload")).select(
        F.col("media_a").alias("doc_a"), F.col("media_b").alias("doc_b")
    )
    nodes = m.select(F.col("media_id").alias("doc_id"))
    from .dedup import with_cluster_sizes

    clusters = min_label_clusters(nodes, pairs)
    lbl = clusters.select(F.col("doc_id").alias("media_id"), "cluster")
    return (
        with_cluster_sizes(lbl)
        .select(
            "media_id",
            "cluster",
            "cluster_n",
            (F.col("media_id") == F.col("cluster")).cast("int").alias("is_canonical"),
        )
    )


QUERIES = {
    "mm_catalog": mm_catalog,
    "mm_byte_features": mm_byte_features,
    "mm_byte_features_arrow": mm_byte_features_arrow,
    "mm_resize": mm_resize,
    "mm_frame_sample": mm_frame_sample,
    "mm_audio_windows": mm_audio_windows,
    "mm_phash_pairs": mm_phash_pairs,
    "mm_phash_clusters": mm_phash_clusters,
}

# Media-table derivation shared by every oracle. Fixture text is pure ASCII,
# so length(text) == octet_length and char slicing == byte slicing.
_MEDIA_CTE = """
media AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
         text,
         CAST(length(text) AS BIGINT) AS n_bytes,
         CASE WHEN doc_id % 3 = 0 THEN 32 + (doc_id % 8) * 16 END AS width,
         CASE WHEN doc_id % 3 = 0 THEN 24 + (doc_id % 6) * 16 END AS height,
         CASE WHEN doc_id % 3 = 1 THEN 8000 * (1 + doc_id % 3) END AS sample_rate,
         CASE WHEN doc_id % 3 = 2 THEN 24 + (doc_id % 2) * 6 END AS fps
  FROM documents
)
"""

_BYTES = "list_transform(range(1, length(text) + 1), i -> ascii(substring(text, i, 1)))"

ORACLES = {
    "mm_catalog": f"""
        WITH {_MEDIA_CTE}
        SELECT media_id, modality, n_bytes, md5(text) AS payload_md5,
               width, height, sample_rate, fps,
               round(n_bytes / (2.0 * sample_rate), 6) AS audio_sec,
               CASE WHEN modality = 'video'
                    THEN CAST(ceil(n_bytes / 64.0) AS BIGINT) END AS n_frames
        FROM media
    """,
    "mm_byte_features": f"""
        WITH {_MEDIA_CTE},
        b AS (SELECT media_id, n_bytes, {_BYTES} AS bytes FROM media)
        SELECT media_id, n_bytes,
               CAST(list_sum(bytes) AS BIGINT) AS sum_bytes,
               CAST(list_min(bytes) AS BIGINT) AS min_byte,
               CAST(list_max(bytes) AS BIGINT) AS max_byte,
               CAST(len(list_distinct(bytes)) AS BIGINT) AS n_distinct_bytes,
               round(list_sum(bytes) * 1.0 / n_bytes, 6) AS mean_byte
        FROM b
    """,
    "mm_resize": """
        WITH media AS (
          SELECT doc_id AS media_id, text,
                 CAST(length(text) AS BIGINT) AS n_bytes,
                 32 + (doc_id % 8) * 16 AS width,
                 24 + (doc_id % 6) * 16 AS height
          FROM documents WHERE doc_id % 3 = 0
        )
        SELECT media_id, width, height,
               width // 2 AS thumb_width, height // 2 AS thumb_height,
               CAST((n_bytes + 3) // 4 AS BIGINT) AS thumb_bytes,
               md5(substring(text, 1, CAST((n_bytes + 3) // 4 AS INTEGER))) AS thumb_md5
        FROM media
    """,
    "mm_frame_sample": """
        WITH media AS (
          SELECT doc_id AS media_id, text,
                 CAST(length(text) AS BIGINT) AS n_bytes
          FROM documents WHERE doc_id % 3 = 2
        ),
        idx AS (
          SELECT media_id, text, n_bytes,
                 unnest(range(0, CAST(ceil(n_bytes / 64.0) AS BIGINT), 4)) AS frame_idx
          FROM media
        )
        SELECT media_id, frame_idx,
               CAST(length(substring(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64))
                    AS BIGINT) AS frame_bytes,
               md5(substring(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) AS frame_md5
        FROM idx
    """,
    "mm_audio_windows": """
        WITH media AS (
          SELECT doc_id AS media_id, text,
                 CAST(length(text) AS BIGINT) AS n_bytes,
                 (8000 * (1 + doc_id % 3)) * 2 AS win
          FROM documents WHERE doc_id % 3 = 1
        ),
        idx AS (
          SELECT media_id, text, n_bytes, win,
                 unnest(range(0, CAST(ceil(n_bytes * 1.0 / win) AS BIGINT))) AS window_idx
          FROM media
        ),
        sliced AS (
          SELECT media_id, window_idx,
                 substring(text, CAST(window_idx * win + 1 AS INTEGER),
                           CAST(win AS INTEGER)) AS chunk
          FROM idx
        )
        SELECT media_id, window_idx,
               CAST(length(chunk) AS BIGINT) AS n_bytes,
               round(list_sum(list_transform(range(1, length(chunk) + 1),
                                             i -> ascii(substring(chunk, i, 1))))
                     * 1.0 / length(chunk), 6) AS mean_byte
        FROM sliced
    """,
}


def _phash_bands_sql() -> list[str]:
    """DuckDB twins of the kernel's 16-bit dHash band keys over a 1-based
    ``cell`` list column (positions computed in Python — only cell VALUES
    depend on the row)."""
    out = []
    for j in range(PHASH_BANDS):
        terms = []
        for t in range(16):
            i = j * 16 + t
            r, c = divmod(i, PHASH_COLS - 1)
            p = r * PHASH_COLS + c + 1  # 1-based list position of the left cell
            terms.append(
                f"(CASE WHEN cell[{p}] < cell[{p + 1}] THEN {1 << t} ELSE 0 END)"
            )
        out.append(" + ".join(terms) + f" AS pb{j}")
    return out


_PHASH_CELLS_SQL = (
    f"list_transform(range(0, {PHASH_CELLS}), k -> "
    f"CAST(list_sum(b[(k * n) // {PHASH_CELLS} + 1 : ((k + 1) * n) // {PHASH_CELLS}])"
    f" AS BIGINT) // (((k + 1) * n) // {PHASH_CELLS} - (k * n) // {PHASH_CELLS}))"
)

_PHASH_HAM_SQL = " + ".join(
    f"bit_count(xor(a.pb{j}, b.pb{j}))" for j in range(PHASH_BANDS)
)

ORACLES["mm_phash_pairs"] = f"""
    WITH {_MEDIA_CTE},
    imgs AS (
      SELECT media_id, {_BYTES} AS b, n_bytes AS n
      FROM media WHERE modality = 'image' AND n_bytes >= {PHASH_CELLS}
    ),
    cellt AS (SELECT media_id, {_PHASH_CELLS_SQL} AS cell FROM imgs),
    sig AS (SELECT media_id, {", ".join(_phash_bands_sql())} FROM cellt),
    pairs AS (
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             CAST({_PHASH_HAM_SQL} AS BIGINT) AS hamming
      FROM sig a JOIN sig b
        ON a.media_id < b.media_id
       AND ({" OR ".join(f"a.pb{j} = b.pb{j}" for j in range(PHASH_BANDS))})
    )
    SELECT media_a, media_b, hamming FROM pairs
    WHERE hamming <= {PHASH_HAMMING_MAX}
"""

ORACLES["mm_phash_clusters"] = f"""
    WITH RECURSIVE prs AS ({ORACLES["mm_phash_pairs"]}),
    {_MEDIA_CTE},
    nodes AS (
      SELECT media_id FROM media
      WHERE modality = 'image' AND n_bytes >= {PHASH_CELLS}
    ),
    edges AS (
      SELECT media_a AS a, media_b AS b FROM prs
      UNION SELECT media_b, media_a FROM prs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    lbl AS (
      SELECT n.media_id,
             least(n.media_id, coalesce(min(r.b), n.media_id)) AS cluster
      FROM nodes n LEFT JOIN reach r ON r.a = n.media_id
      GROUP BY n.media_id
    )
    SELECT media_id, cluster,
           count(*) OVER (PARTITION BY cluster) AS cluster_n,
           CASE WHEN media_id = cluster THEN 1 ELSE 0 END AS is_canonical
    FROM lbl
    ORDER BY media_id
"""

# the Arrow twin has identical semantics — same oracle
ORACLES["mm_byte_features_arrow"] = ORACLES["mm_byte_features"]
