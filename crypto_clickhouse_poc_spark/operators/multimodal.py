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


QUERIES = {
    "mm_catalog": mm_catalog,
    "mm_byte_features": mm_byte_features,
    "mm_resize": mm_resize,
    "mm_frame_sample": mm_frame_sample,
    "mm_audio_windows": mm_audio_windows,
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
