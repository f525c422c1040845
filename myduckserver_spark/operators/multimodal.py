"""Multimodal column handling: image/audio/video as opaque binary +
typed metadata, with decode/feature steps as Arrow-batched pandas UDFs.

Schema convention:

    media STRUCT<data: BINARY, meta: STRUCT<
        format: STRING, width: INT, height: INT,
        n_frames: INT, sample_rate: INT>>

The Spark-side plumbing (schema, partition-parallel mapInPandas, batch
shapes) is real and tested; the codec itself is stubbed — the image/
audio libraries are not in this container, so decode uses a
deterministic fake unless PIL/soundfile import succeeds (import-try
gate, per the build brief).

Scale: mapInPandas streams Arrow batches per partition — decode cost
parallelizes with the data; metadata-only ops never touch the payload
column (columnar pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

MEDIA_META_SCHEMA = (
    "format string, width int, height int, n_frames int, sample_rate int"
)


def attach_media(
    df: DataFrame, data_col: str, fmt: str = "bin", media_col: str = "media"
) -> DataFrame:
    """Wrap a binary column into the media struct convention."""
    return df.withColumn(
        media_col,
        F.struct(
            F.col(data_col).alias("data"),
            F.struct(
                F.lit(fmt).alias("format"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("int").alias("n_frames"),
                F.lit(None).cast("int").alias("sample_rate"),
            ).alias("meta"),
        ),
    ).drop(data_col)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder: derive dimensions
    from content bytes (stable across runs/partitions)."""
    if not payload:
        return 0, 0
    w = 16 + payload[0] % 64
    h = 16 + payload[-1] % 64
    return w, h


def decode_images(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """Decode step: (id, media) → (id, width, height, n_bytes).

    Real codec behind an import-try; otherwise the deterministic fake.
    Batch shape: one Arrow batch in/out per partition chunk.
    """
    out_schema = f"{id_col} long, width int, height int, n_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[media_col].map(lambda m: bytes(m["data"] or b""))
            if _HAS_PIL:  # pragma: no cover
                raise NotImplementedError(
                    "real image decode requires PIL image bytes; "
                    "not available in this container"
                )
            dims = payloads.map(_fake_decode)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "n_bytes": payloads.map(len).astype("int64"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    every_n: int = 10,
) -> DataFrame:
    """Video frame-sampling plumbing: emit one row per sampled frame
    index (payload decode stubbed; frame count derived from bytes)."""
    n_frames = F.greatest(
        (F.octet_length(F.col(f"{media_col}.data")) / 100).cast("int"), F.lit(1)
    )
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def media_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Metadata-only aggregate — must prune the payload column
    (verify with .explain: ReadSchema excludes media.data)."""
    return df.select(
        F.col(f"{media_col}.meta.format").alias("format")
    ).groupBy("format").agg(F.count(F.lit(1)).cast("long").alias("n"))


def resize_images(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    max_side: int = 256,
) -> DataFrame:
    """Resize plumbing: (id, media) → (id, new_width, new_height,
    payload). The geometry math (aspect-preserving clamp to max_side)
    is real; the pixel resample is the deterministic fake where no
    codec exists (payload passthrough). Arrow-batched per partition —
    the shape a real PIL/opencv resample drops into unchanged.
    """
    out_schema = (
        f"{id_col} long, new_width int, new_height int, payload binary"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[media_col].map(lambda m: bytes(m["data"] or b""))
            dims = payloads.map(_fake_decode)

            def clamp(d):
                w, h = d
                if max(w, h, 1) <= max_side:
                    return w, h
                scale = max_side / max(w, h)
                return max(int(w * scale), 1), max(int(h * scale), 1)

            new_dims = dims.map(clamp)
            if _HAS_PIL:  # pragma: no cover
                raise NotImplementedError(
                    "real pixel resample requires an image codec; "
                    "not available in this container"
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "new_width": new_dims.map(lambda d: d[0]).astype("int32"),
                    "new_height": new_dims.map(lambda d: d[1]).astype("int32"),
                    "payload": payloads,
                }
            )

    return df.select(id_col, media_col).mapInPandas(run, out_schema)


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    dim: int = 8,
) -> DataFrame:
    """Feature-extraction plumbing: (id, media) → (id, features
    array<float>). The embedding model is stubbed with a deterministic
    byte-histogram feature (stable across runs/partitions), so the
    schema, batching, and downstream similarity-search contract
    (array<float>, fixed dim) are all real and testable.
    """
    out_schema = f"{id_col} long, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for m in pdf[media_col]:
                data = bytes(m["data"] or b"")
                hist = np.zeros(dim, dtype="float32")
                if data:
                    arr = np.frombuffer(data, dtype=np.uint8)
                    np.add.at(hist, arr % dim, 1.0)
                    hist /= len(arr)
                feats.append(hist.tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, media_col).mapInPandas(run, out_schema)


def byte_histogram(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id",
    buckets: int = 8,
) -> DataFrame:
    """Exact byte-bucket histogram of the payload: (id, b0..b{n-1})
    with integer counts of byte % buckets.

    The integer-exact cousin of extract_features — same Arrow batch
    shape, but the output is hash-comparable against a SQL oracle
    (no float normalization), so this is the operator the correctness
    gate drives end-to-end through mapInPandas.
    """
    cols = ", ".join(f"b{i} long" for i in range(buckets))
    out_schema = f"{id_col} long, {cols}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, m in zip(pdf[id_col], pdf[media_col]):
                data = bytes(m["data"] or b"")
                hist = np.zeros(buckets, dtype="int64")
                if data:
                    arr = np.frombuffer(data, dtype=np.uint8)
                    np.add.at(hist, arr % buckets, 1)
                rows.append((doc_id, *hist.tolist()))
            yield pd.DataFrame(
                rows, columns=[id_col] + [f"b{i}" for i in range(buckets)]
            )

    return df.select(id_col, media_col).mapInPandas(run, out_schema)
