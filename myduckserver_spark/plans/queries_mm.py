"""Multimodal-plumbing queries: drive the operators/multimodal.py
mapInPandas pipeline (binary payload + typed metadata convention)
through the correctness gate.

The payload here is encode(text) — the driver tables carry no real
media, and the codec libraries are not in this container — but the
plumbing under test is real: struct<data binary, meta struct<...>>
schema, Arrow-batched mapInPandas with exact-integer outputs, frame
index expansion, and aspect-clamp geometry. The texts are pure ASCII
(verified), so each char is one byte and the DuckDB oracle can mirror
byte math with ord(substr(...)).

Scale: every operator is map-only over the payload partition — decode
cost parallelizes with data and no shuffle touches the binary column;
the gate queries cap doc_id only to keep oracle-side per-char SQL
cheap, not because the Spark side needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myduckserver_spark.operators.multimodal import (
    attach_media,
    byte_histogram,
    frame_sample,
    resize_images,
)
from myduckserver_spark.plans.registry import register
from myduckserver_spark.tables import load_table

MAX_SIDE = 56  # resize clamp: fake-decoded dims are 16..79, so ~half clamp


def _media_docs(spark: SparkSession, sf_dir: str, limit: int) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < limit
    )
    return attach_media(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("payload")),
        "payload",
    )


@register(
    "mm_frame_sample",
    oracle="""
    WITH media AS (
        SELECT doc_id,
               GREATEST(octet_length(encode(text)) // 100, 1) AS n_frames
        FROM documents WHERE doc_id < 30
    )
    SELECT doc_id, CAST(unnest(generate_series(0, n_frames - 1, 2))
                        AS INTEGER) AS frame_idx
    FROM media
    ORDER BY doc_id, frame_idx
    """,
    tags=("multimodal", "video"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index
    (every 2nd of n_frames = payload_bytes // 100, min 1).

    Runs the real operators.multimodal.frame_sample over the media
    struct; the oracle mirrors the frame arithmetic. Scale: explode is
    map-side; output is (id, frame_idx) rows a downstream decode UDF
    consumes partition-parallel — frame extraction never centralizes.
    """
    out = frame_sample(_media_docs(spark, sf_dir, 30), every_n=2)
    return out.select(
        "doc_id", F.col("frame_idx").cast("int")
    ).orderBy("doc_id", "frame_idx")


@register(
    "mm_byte_histogram",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(range(1, length(text) + 1),
               i -> ord(substr(text, i, 1)) % 8 = 0)) AS BIGINT) AS b0,
           CAST(len(list_filter(range(1, length(text) + 1),
               i -> ord(substr(text, i, 1)) % 8 = 1)) AS BIGINT) AS b1,
           CAST(len(list_filter(range(1, length(text) + 1),
               i -> ord(substr(text, i, 1)) % 8 = 2)) AS BIGINT) AS b2,
           CAST(len(list_filter(range(1, length(text) + 1),
               i -> ord(substr(text, i, 1)) % 8 = 3)) AS BIGINT) AS b3,
           CAST(len(list_filter(range(1, length(text) + 1),
               i -> ord(substr(text, i, 1)) % 8 = 4)) AS BIGINT) AS b4,
           CAST(len(list_filter(range(1, length(text) + 1),
               i -> ord(substr(text, i, 1)) % 8 = 5)) AS BIGINT) AS b5,
           CAST(len(list_filter(range(1, length(text) + 1),
               i -> ord(substr(text, i, 1)) % 8 = 6)) AS BIGINT) AS b6,
           CAST(len(list_filter(range(1, length(text) + 1),
               i -> ord(substr(text, i, 1)) % 8 = 7)) AS BIGINT) AS b7
    FROM documents WHERE doc_id < 20
    ORDER BY doc_id
    """,
    tags=("multimodal", "features"),
)
def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact byte-bucket histogram through the Arrow-batched
    mapInPandas feature path (integer twin of extract_features, so the
    gate can hash-compare the decode plumbing end-to-end).

    The oracle recomputes each byte bucket with per-char SQL (texts
    are ASCII ⇒ char == byte). Scale: the histogram is computed inside
    one numpy pass per Arrow batch — per-partition, no shuffle, no
    driver involvement; exactly the shape a real featurizer drops into.
    """
    out = byte_histogram(_media_docs(spark, sf_dir, 20), buckets=8)
    return out.orderBy("doc_id")


@register(
    "mm_resize_geometry",
    oracle=f"""
    WITH dims AS (
        SELECT doc_id,
               16 + ord(substr(text, 1, 1)) % 64 AS w,
               16 + ord(substr(text, length(text), 1)) % 64 AS h
        FROM documents WHERE doc_id < 30
    )
    SELECT doc_id,
           CAST(CASE WHEN GREATEST(w, h, 1) <= {MAX_SIDE} THEN w
                ELSE GREATEST(CAST(FLOOR(w * ({MAX_SIDE}.0 / GREATEST(w, h)))
                              AS INTEGER), 1) END AS INTEGER) AS new_width,
           CAST(CASE WHEN GREATEST(w, h, 1) <= {MAX_SIDE} THEN h
                ELSE GREATEST(CAST(FLOOR(h * ({MAX_SIDE}.0 / GREATEST(w, h)))
                              AS INTEGER), 1) END AS INTEGER) AS new_height
    FROM dims
    ORDER BY doc_id
    """,
    tags=("multimodal", "image"),
)
def mm_resize_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize geometry through the real
    resize_images mapInPandas operator (pixel resample stubbed with
    the deterministic fake decoder: w,h from first/last payload byte).

    MAX_SIDE=56 sits inside the fake dim range (16..79) so both the
    clamp and the passthrough branch are exercised. int() truncation
    in Python == FLOOR for positive doubles, mirrored exactly in the
    oracle. Scale: map-only per Arrow batch; the payload column never
    shuffles.
    """
    out = resize_images(_media_docs(spark, sf_dir, 30), max_side=MAX_SIDE)
    return out.select("doc_id", "new_width", "new_height").orderBy("doc_id")


@register(
    "mm_audio_meta",
    oracle="""
    SELECT doc_id,
           CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           CAST(16 AS INT) AS bits,
           CAST(100 + doc_id * 7 AS BIGINT) AS n_samples,
           CAST((100 + doc_id * 7) * 1000
                // (8000 + (doc_id % 3) * 4000) AS BIGINT) AS duration_ms
    FROM documents WHERE doc_id < 40
    ORDER BY doc_id
    """,
    tags=("multimodal", "audio"),
)
def mm_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio path end-to-end: synthesize a REAL 16-bit PCM WAV payload
    per document (deterministic rate/channels/length from doc_id),
    wrap it in the media-struct convention with magic-byte format
    auto-detection, then recover the metadata by actually parsing the
    RIFF chunk list (operators/multimodal.decode_wav_header) in an
    Arrow-batched mapInPandas. The oracle recomputes the expected
    metadata arithmetically — so a header-layout or parse bug breaks
    the hash match.

    Scale: both stages are map-only; the binary column never shuffles.
    """
    from myduckserver_spark.operators.multimodal import (
        attach_media,
        decode_audio_meta,
        synth_wav,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 40
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [
                synth_wav(
                    8000 + int(d) % 3 * 4000,
                    1 + int(d) % 2,
                    100 + int(d) * 7,
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    raw = docs.select("doc_id").mapInPandas(gen, "doc_id long, payload binary")
    media = attach_media(raw, "payload", fmt=None)
    return decode_audio_meta(media).orderBy("doc_id")


@register(
    "mm_video_meta",
    oracle="""
    SELECT doc_id,
           CAST(24 + doc_id * 3 AS BIGINT) AS n_frames,
           CAST((24 + doc_id * 3) * 1000 // (12 + doc_id % 3 * 6)
                AS BIGINT) AS duration_ms,
           CAST(160 + doc_id % 4 * 80 AS INT) AS width,
           CAST(90 + doc_id % 4 * 45 AS INT) AS height,
           CAST(len(list_filter(range(0, 24 + doc_id * 3),
                i -> i % 10 = 0)) AS BIGINT) AS n_sampled
    FROM documents WHERE doc_id < 40
    ORDER BY doc_id
    """,
    tags=("multimodal", "video", "mp4"),
)
def mm_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video path end-to-end with a REAL container: synthesize a
    minimal-but-valid MP4 box tree per document (frame count / fps /
    dimensions derived from doc_id), wrap it in the media-struct
    convention, recover the metadata by actually walking the ISO-BMFF
    boxes (operators/multimodal.decode_mp4_meta — mvhd/tkhd/stsz) in
    an Arrow-batched mapInPandas, then count every-10th-frame samples
    off the PARSED frame count. The oracle recomputes the expected
    values arithmetically, so a box-layout or parse bug breaks the
    hash. This closes the r2 gap where frame counts were derived from
    byte length instead of container metadata (mm_frame_sample remains
    the opaque-payload fallback).

    Scale: synth + parse are map-only over the binary column; nothing
    shuffles until the final presentation sort.
    """
    from myduckserver_spark.operators.multimodal import (
        attach_media,
        decode_video_meta,
        synth_mp4,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 40
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            payloads = [
                synth_mp4(
                    24 + int(d) * 3,
                    12 + int(d) % 3 * 6,
                    160 + int(d) % 4 * 80,
                    90 + int(d) % 4 * 45,
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    raw = docs.select("doc_id").mapInPandas(gen, "doc_id long, payload binary")
    media = attach_media(raw, "payload", fmt=None)
    return (
        decode_video_meta(media)
        .selectExpr(
            "doc_id", "n_frames", "duration_ms", "width", "height",
            "CAST(size(sequence(0, CAST(n_frames - 1 AS INT), 10))"
            " AS BIGINT) AS n_sampled",
        )
        .orderBy("doc_id")
    )
