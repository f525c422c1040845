"""Real image-header decoding (pure Python) through the multimodal
pipeline: PNG/GIF/BMP/JPEG containers built byte-by-byte in the test,
decoded by decode_image_header and by the Spark mapInPandas operator."""

from __future__ import annotations

import struct
import zlib

from myduckserver_spark.operators.multimodal import (
    attach_media,
    decode_image_header,
    decode_images,
    resize_images,
)


def make_png(w: int, h: int) -> bytes:
    """A complete, valid 8-bit grayscale PNG."""

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x80" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"


def make_bmp(w: int, h: int, top_down: bool = False) -> bytes:
    hh = -h if top_down else h
    info = struct.pack("<IiiHHIIiiII", 40, w, hh, 1, 24, 0, 0, 2835, 2835, 0, 0)
    pixel = b"\x00" * (w * 3 + (-w * 3) % 4) * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixel), 0, 0, 14 + 40
    )
    return header + info + pixel


def make_jpeg(w: int, h: int) -> bytes:
    # SOI, APP0 (JFIF), SOF0, EOI — enough of a container for header scan
    # APP0 length 16 = len(2) + 'JFIF\0'(5) + version(2) + units(1)
    #                + density(4) + thumbnail(2)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_header_decode_all_formats():
    assert decode_image_header(make_png(320, 200)) == ("png", 320, 200)
    assert decode_image_header(make_gif(64, 48)) == ("gif", 64, 48)
    assert decode_image_header(make_bmp(100, 70)) == ("bmp", 100, 70)
    assert decode_image_header(make_bmp(100, 70, top_down=True)) == (
        "bmp", 100, 70,
    )
    assert decode_image_header(make_jpeg(640, 480)) == ("jpeg", 640, 480)
    assert decode_image_header(b"not an image at all") is None
    assert decode_image_header(b"") is None


def test_decode_images_real_headers(spark):
    rows = [
        (1, make_png(300, 120)),
        (2, make_gif(40, 30)),
        (3, make_bmp(55, 44)),
        (4, make_jpeg(800, 600)),
        (5, b"\x07synthetic-payload\x09"),  # falls back deterministically
    ]
    df = attach_media(
        spark.createDataFrame(rows, "doc_id long, data binary"), "data"
    )
    out = {
        r.doc_id: (r.width, r.height, r.n_bytes)
        for r in decode_images(df).collect()
    }
    assert out[1][:2] == (300, 120)
    assert out[2][:2] == (40, 30)
    assert out[3][:2] == (55, 44)
    assert out[4][:2] == (800, 600)
    # fallback: 16 + first%64, 16 + last%64
    assert out[5][:2] == (16 + 7 % 64, 16 + 9 % 64)
    assert out[1][2] == len(rows[0][1])


def test_resize_uses_real_dims(spark):
    df = attach_media(
        spark.createDataFrame([(1, make_png(1000, 500))], "doc_id long, data binary"),
        "data",
    )
    r = resize_images(df, max_side=256).collect()[0]
    assert (r.new_width, r.new_height) == (256, 128)


def test_attach_media_format_autodetect(spark):
    rows = [
        (1, make_png(8, 8)),
        (2, make_gif(4, 4)),
        (3, make_bmp(4, 4)),
        (4, make_jpeg(4, 4)),
        (5, b"plain bytes"),
    ]
    df = attach_media(
        spark.createDataFrame(rows, "doc_id long, data binary"), "data", fmt=None
    )
    got = {r.doc_id: r.fmt for r in df.select(
        "doc_id", df.media.meta.format.alias("fmt")).collect()}
    assert got == {1: "png", 2: "gif", 3: "bmp", 4: "jpeg", 5: "bin"}


def test_wav_header_roundtrip():
    from myduckserver_spark.operators.multimodal import (
        decode_wav_header,
        synth_wav,
    )

    data = synth_wav(16000, 2, 333)
    assert decode_wav_header(data) == (16000, 2, 16, 333)
    # word-alignment: an odd-sized junk chunk before fmt must be skipped
    import struct

    padded = (
        data[:12]
        + b"JUNK" + struct.pack("<I", 3) + b"abc\x00"
        + data[12:]
    )
    hdr = padded[:4] + struct.pack("<I", len(padded) - 8) + padded[8:12]
    assert decode_wav_header(hdr + padded[12:]) == (16000, 2, 16, 333)


def test_wav_header_rejects_garbage():
    from myduckserver_spark.operators.multimodal import decode_wav_header

    assert decode_wav_header(b"") is None
    assert decode_wav_header(b"RIFFxxxxAVI ") is None
    assert decode_wav_header(b"RIFF\x00\x00\x00\x00WAVE") is None  # no chunks


def test_wav_format_autodetect(spark):
    from myduckserver_spark.operators.multimodal import (
        attach_media,
        synth_wav,
    )

    df = attach_media(
        spark.createDataFrame(
            [(1, synth_wav(8000, 1, 10)), (2, b"RIFFxxxxAVI LIST")],
            "doc_id long, data binary",
        ),
        "data",
        fmt=None,
    )
    got = {r.doc_id: r.fmt for r in df.select(
        "doc_id", df.media.meta.format.alias("fmt")).collect()}
    assert got == {1: "wav", 2: "bin"}
