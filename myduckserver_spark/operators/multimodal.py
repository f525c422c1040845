"""Multimodal column handling: image/audio/video as opaque binary +
typed metadata, with decode/feature steps as Arrow-batched pandas UDFs.

Schema convention:

    media STRUCT<data: BINARY, meta: STRUCT<
        format: STRING, width: INT, height: INT,
        n_frames: INT, sample_rate: INT>>

The Spark-side plumbing (schema, partition-parallel mapInPandas, batch
shapes) is real and tested. Dimension decode is ALSO real for
PNG/GIF/BMP/JPEG payloads — ``decode_image_header`` parses the actual
container headers in pure Python (no codec libraries needed). Only the
pixel-level steps (resample, audio decode) remain stubbed behind a
deterministic fallback, since full codecs are not in this container.

Scale: mapInPandas streams Arrow batches per partition — decode cost
parallelizes with the data; metadata-only ops never touch the payload
column (columnar pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "format string, width int, height int, n_frames int, sample_rate int"
)


def detect_format(data_col: str) -> "F.Column":
    """Container format from magic bytes, as a pure JVM expression
    (no Python in the path — this runs in whole-stage codegen)."""
    c = F.col(data_col)
    head = F.hex(F.substring(c, 1, 8))
    return (
        F.when(head.startswith("89504E470D0A1A0A"), "png")
        .when(head.startswith("474946383761"), "gif")
        .when(head.startswith("474946383961"), "gif")
        .when(head.startswith("424D"), "bmp")
        .when(head.startswith("FFD8"), "jpeg")
        .when(
            head.startswith("52494646")
            & (F.hex(F.substring(c, 9, 4)) == "57415645"),
            "wav",
        )
        .otherwise("bin")
    )


def attach_media(
    df: DataFrame,
    data_col: str,
    fmt: str | None = "bin",
    media_col: str = "media",
) -> DataFrame:
    """Wrap a binary column into the media struct convention.

    fmt=None auto-detects the container from magic bytes (JVM-side).
    """
    fmt_col = F.lit(fmt) if fmt is not None else detect_format(data_col)
    return df.withColumn(
        media_col,
        F.struct(
            F.col(data_col).alias("data"),
            F.struct(
                fmt_col.alias("format"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("int").alias("n_frames"),
                F.lit(None).cast("int").alias("sample_rate"),
            ).alias("meta"),
        ),
    ).drop(data_col)


def decode_image_header(data: bytes) -> tuple[str, int, int] | None:
    """REAL image-container header decode, pure Python (no codec libs):

    - PNG:  IHDR width/height (big-endian, spec §11.2.2)
    - GIF:  logical screen descriptor (little-endian, 87a/89a)
    - BMP:  BITMAPINFOHEADER (v3+, signed height = bottom-up flag) and
            the ancient BITMAPCOREHEADER
    - JPEG: SOFn marker scan (height, width big-endian after precision)

    Returns (format, width, height) or None for unrecognized bytes.
    This is actual decoding of actual container bytes — the pixel
    *resample* step still needs a codec library and keeps its stub.
    """
    import struct

    if (
        len(data) >= 24
        and data[:8] == b"\x89PNG\r\n\x1a\n"
        and data[12:16] == b"IHDR"
    ):
        w, h = struct.unpack(">II", data[16:24])
        return ("png", w, h)
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return ("gif", w, h)
    if data[:2] == b"BM" and len(data) >= 26:
        (hdr_size,) = struct.unpack("<I", data[14:18])
        if hdr_size >= 40:
            w, h = struct.unpack("<ii", data[18:26])
            return ("bmp", w, abs(h))  # negative height = top-down DIB
        if hdr_size == 12 and len(data) >= 22:
            w, h = struct.unpack("<HH", data[18:22])
            return ("bmp", w, h)
        return None
    if data[:2] == b"\xff\xd8":
        i = 2
        n = len(data)
        _SOF = frozenset(
            (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
        )
        while i + 4 <= n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            (seg_len,) = struct.unpack(">H", data[i + 2 : i + 4])
            if marker in _SOF and i + 9 <= n:
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return ("jpeg", w, h)
            i += 2 + seg_len
    return None


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for unrecognized payload bytes: derive
    dimensions from content (stable across runs/partitions). Keeps the
    oracle-checked pipeline runnable on synthetic non-image payloads."""
    if not payload:
        return 0, 0
    w = 16 + payload[0] % 64
    h = 16 + payload[-1] % 64
    return w, h


def _decode_dims(payload: bytes) -> tuple[int, int]:
    """Real header decode when the bytes are a recognized container,
    deterministic fallback otherwise."""
    hdr = decode_image_header(payload)
    if hdr is not None:
        return hdr[1], hdr[2]
    return _fake_decode(payload)


def decode_images(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """Decode step: (id, media) → (id, width, height, n_bytes).

    PNG/GIF/BMP/JPEG dimensions come from REAL header parsing
    (decode_image_header); unrecognized payloads use the deterministic
    fallback. Batch shape: one Arrow batch in/out per partition chunk.
    """
    out_schema = f"{id_col} long, width int, height int, n_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[media_col].map(lambda m: bytes(m["data"] or b""))
            dims = payloads.map(_decode_dims)
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
            dims = payloads.map(_decode_dims)

            def clamp(d):
                w, h = d
                if max(w, h, 1) <= max_side:
                    return w, h
                scale = max_side / max(w, h)
                return max(int(w * scale), 1), max(int(h * scale), 1)

            new_dims = dims.map(clamp)
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


def decode_wav_header(data: bytes) -> tuple[int, int, int, int] | None:
    """REAL RIFF/WAVE header decode, pure Python (no audio libs):
    walks the chunk list (RIFF spec: 4-byte id, 4-byte LE size),
    reads the `fmt ` chunk's sample_rate / channels / bits_per_sample
    and the `data` chunk's byte length.

    Returns (sample_rate, channels, bits_per_sample, n_samples) or
    None for non-WAV bytes. n_samples is per-channel frames:
    data_bytes // (channels * bits // 8).
    """
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    rate = channels = bits = None
    data_len = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            _fmt, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
        elif cid == b"data":
            data_len = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if None in (rate, channels, bits, data_len) or channels == 0 or bits == 0:
        return None
    return (rate, channels, bits, data_len // (channels * bits // 8))


def synth_wav(sample_rate: int, channels: int, n_samples: int) -> bytes:
    """Deterministic 16-bit PCM WAV payload (a ramp wave) — the test
    fixture generator for the audio path; the header it writes is the
    real RIFF layout that decode_wav_header parses back.
    """
    import struct

    frame_bytes = channels * 2
    data_len = n_samples * frame_bytes
    body = bytearray()
    for i in range(n_samples):
        v = (i * 37) % 65536 - 32768
        body += struct.pack("<h", v) * channels
    hdr = b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate,
        sample_rate * frame_bytes, frame_bytes, 16,
    )
    return hdr + fmt + b"data" + struct.pack("<I", data_len) + bytes(body)


def decode_audio_meta(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """Audio metadata extraction over a binary media column: Arrow-
    batched mapInPandas, one real RIFF parse per payload. Output
    duration_ms is integer-exact (n_samples * 1000 // rate) so the
    result hash-compares against a SQL oracle.

    Scale: map-only — the binary column never shuffles; batches stream
    through the Python worker at Arrow batch granularity.
    """
    out_schema = (
        f"{id_col} long, sample_rate int, channels int, "
        "bits int, n_samples long, duration_ms long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, m in zip(pdf[id_col], pdf[media_col]):
                data = bytes(m["data"] or b"")
                meta = decode_wav_header(data)
                if meta is None:
                    rows.append((doc_id, None, None, None, None, None))
                else:
                    rate, ch, bits, n = meta
                    rows.append((doc_id, rate, ch, bits, n, n * 1000 // rate))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "sample_rate", "channels", "bits",
                    "n_samples", "duration_ms",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(run, out_schema)


# ------------------------------------------------------------------ video
def decode_mp4_meta(data: bytes) -> tuple[int, int, int, int] | None:
    """REAL ISO-BMFF (MP4) container parse, pure Python (no video
    libs): walks the box tree (4-byte BE size + 4-byte type; containers
    moov/trak/mdia/minf/stbl recurse), reading
      - mvhd  -> movie timescale + duration  -> duration_ms
      - tkhd  -> track width/height (16.16 fixed point)
      - stsz  -> sample (frame) count
    Returns (n_frames, duration_ms, width, height) or None for
    non-MP4 bytes. Same decode-real-headers pattern as
    decode_image_header / decode_wav_header.
    """
    import struct

    if len(data) < 8:
        return None
    # an MP4 starts with a box whose type is ftyp/moov/mdat/free/wide
    if data[4:8] not in (b"ftyp", b"moov", b"mdat", b"free", b"wide"):
        return None
    containers = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}
    found = {"mvhd": None, "tkhd": None, "stsz": None}

    def walk(lo: int, hi: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            (size,) = struct.unpack(">I", data[pos:pos + 4])
            btype = data[pos + 4:pos + 8]
            if size < 8 or pos + size > hi:
                return
            body_lo, body_hi = pos + 8, pos + size
            if btype in containers:
                walk(body_lo, body_hi)
            elif btype == b"mvhd" and body_hi - body_lo >= 20:
                ts, dur = struct.unpack(
                    ">II", data[body_lo + 12:body_lo + 20]
                )
                found["mvhd"] = (ts, dur)
            elif btype == b"tkhd" and body_hi - body_lo >= 84:
                w, h = struct.unpack(">II", data[body_hi - 8:body_hi])
                found["tkhd"] = (w >> 16, h >> 16)
            elif btype == b"stsz" and body_hi - body_lo >= 12:
                uniform, count = struct.unpack(
                    ">II", data[body_lo + 4:body_lo + 12]
                )
                found["stsz"] = count
            pos += size

    walk(0, len(data))
    if found["mvhd"] is None or found["stsz"] is None:
        return None
    ts, dur = found["mvhd"]
    w, h = found["tkhd"] or (0, 0)
    duration_ms = dur * 1000 // ts if ts else 0
    return (found["stsz"], duration_ms, w, h)


def synth_mp4(n_frames: int, fps: int, width: int, height: int) -> bytes:
    """Deterministic minimal-but-REAL MP4: proper ftyp/moov box tree
    (mvhd timescale=fps duration=n_frames, tkhd 16.16 dimensions, stsz
    uniform sample table) that decode_mp4_meta parses back — the video
    fixture generator, mirroring synth_wav."""
    import struct

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mvhd = box(
        b"mvhd",
        struct.pack(">I", 0)                      # version+flags
        + struct.pack(">II", 0, 0)                # creation/modification
        + struct.pack(">II", fps, n_frames)       # timescale, duration
        + struct.pack(">I", 0x00010000)           # rate 1.0
        + struct.pack(">H", 0x0100) + b"\x00" * 10  # volume + reserved
        + b"\x00" * 36                            # matrix
        + b"\x00" * 24                            # predefined
        + struct.pack(">I", 2),                   # next track id
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">I", 7)                      # version + enabled flags
        + struct.pack(">II", 0, 0)                # creation/modification
        + struct.pack(">I", 1) + b"\x00" * 4      # track id + reserved
        + struct.pack(">I", n_frames)             # duration
        + b"\x00" * 8                             # reserved
        + b"\x00" * 8                             # layer/alt/volume/reserved
        + b"\x00" * 36                            # matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = box(
        b"mdhd",
        struct.pack(">I", 0) + struct.pack(">II", 0, 0)
        + struct.pack(">II", fps, n_frames)
        + struct.pack(">HH", 0x55C4, 0),          # language 'und'
    )
    hdlr = box(
        b"hdlr",
        struct.pack(">I", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00",
    )
    stsz = box(
        b"stsz",
        struct.pack(">I", 0)
        + struct.pack(">II", 100, n_frames),      # uniform size, count
    )
    stbl = box(b"stbl", stsz)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + moov


def decode_video_meta(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """Video container metadata over a binary media column: Arrow-
    batched mapInPandas, one real MP4 box walk per payload — the video
    twin of decode_audio_meta. Scale: map-only; payloads never
    shuffle."""
    out_schema = (
        f"{id_col} long, n_frames long, duration_ms long, "
        "width int, height int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, m in zip(pdf[id_col], pdf[media_col]):
                meta = decode_mp4_meta(bytes(m["data"] or b""))
                if meta is None:
                    rows.append((doc_id, None, None, None, None))
                else:
                    rows.append((doc_id,) + meta)
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_frames", "duration_ms", "width", "height",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(run, out_schema)
