"""MySQL binary-JSON codec vs the reference encoder's test vectors.

The byte-level vectors are ported from the reference's own suite
(reference: binlogreplication/binlog_json_serialization_test.go:28-117
TestJsonSerialization_EncodedBytes; :136-266 round-trip corpus) — the
encoder must be byte-identical on every vector the reference pins, and
the decoder must invert both those bytes and the shapes only a real
MySQL server emits (inlined int16 entries, int scalars) that the
reference's encode-only implementation never produces.
"""

from __future__ import annotations

import pytest

from myduckserver_spark.streaming.mysql_json import (
    MysqlJsonError,
    decode_binary_json,
    encode_binary_json,
)


def large_string(n: int) -> str:
    # same generator shape as the reference's test corpus
    sample = "abcdefghijklmnopqrstuvwxyz1234567890"
    s = ""
    while len(s) < n:
        s += sample[: n - len(s)]
    return s


# ------------------------- ported byte-level vectors (encoder parity)

VECTORS = [
    (True, bytes([0x4, 0x1])),
    (False, bytes([0x4, 0x2])),
    (None, bytes([0x4, 0x0])),
    ("foo", bytes([0xC, 0x3, 0x66, 0x6F, 0x6F])),
    (1.0, bytes([0xB, 0, 0, 0, 0, 0, 0, 0xF0, 0x3F])),
    # string length encodings: 1 byte up to 127, 2 up to 16383, 3 above
    (
        large_string(127),
        bytes([0xC, 0x7F]) + large_string(127).encode(),
    ),
    (
        large_string(128),
        bytes([0xC, 0x80, 0x1]) + large_string(128).encode(),
    ),
    (
        large_string(16383),
        bytes([0xC, 0xFF, 0x7F]) + large_string(16383).encode(),
    ),
    (
        large_string(16384),
        bytes([0xC, 0x80, 0x80, 0x1]) + large_string(16384).encode(),
    ),
    # small array
    (
        ["foo", "bar", True, "baz"],
        bytes(
            [
                0x2, 0x4, 0x0, 0x1C, 0x0, 0xC, 0x10, 0x0, 0xC, 0x14,
                0x0, 0x4, 0x1, 0x0, 0xC, 0x18, 0x0, 0x3, 0x66, 0x6F,
                0x6F, 0x3, 0x62, 0x61, 0x72, 0x3, 0x62, 0x61, 0x7A,
            ]
        ),
    ),
    # small object
    (
        {"foo": "bar", "zap": True},
        bytes(
            [
                0x0, 0x2, 0x0, 0x1C, 0x0, 0x12, 0x0, 0x3, 0x0, 0x15,
                0x0, 0x3, 0x0, 0xC, 0x18, 0x0, 0x4, 0x1, 0x0, 0x66,
                0x6F, 0x6F, 0x7A, 0x61, 0x70, 0x3, 0x62, 0x61, 0x72,
            ]
        ),
    ),
    # large array (offsets overflow 2 bytes -> 4-byte encoding)
    (
        ["a", large_string(35_000), large_string(35_000), "c"],
        bytes(
            [
                0x3, 0x4, 0x0, 0x0, 0x0, 0x96, 0x11, 0x1, 0x0, 0xC,
                0x1C, 0x0, 0x0, 0x0, 0xC, 0x1E, 0x0, 0x0, 0x0, 0xC,
                0xD9, 0x88, 0x0, 0x0, 0xC, 0x94, 0x11, 0x1, 0x0, 0x1,
                0x61,
            ]
        )
        + bytes([0xB8, 0x91, 0x2])
        + large_string(35_000).encode()
        + bytes([0xB8, 0x91, 0x2])
        + large_string(35_000).encode()
        + bytes([0x01])
        + b"c",
    ),
    # large object
    (
        {"a": large_string(35_000), "b": large_string(35_000)},
        bytes(
            [
                0x1, 0x2, 0x0, 0x0, 0x0, 0x96, 0x11, 0x1, 0x0, 0x1E,
                0x0, 0x0, 0x0, 0x1, 0x0, 0x1F, 0x0, 0x0, 0x0, 0x1,
                0x0, 0xC, 0x20, 0x0, 0x0, 0x0, 0xC, 0xDB, 0x88, 0x0,
                0x0, 0x61, 0x62,
            ]
        )
        + bytes([0xB8, 0x91, 0x2])
        + large_string(35_000).encode()
        + bytes([0xB8, 0x91, 0x2])
        + large_string(35_000).encode(),
    ),
]


@pytest.mark.parametrize("value,expected", VECTORS)
def test_encode_matches_reference_vectors(value, expected):
    assert encode_binary_json(value) == expected


@pytest.mark.parametrize("value,expected", VECTORS)
def test_decode_inverts_reference_vectors(value, expected):
    assert decode_binary_json(expected) == value


def test_string_over_cap_raises():
    with pytest.raises(MysqlJsonError):
        encode_binary_json(large_string(2_097_152))


# --------------------------- round-trip corpus (reference :203-265)

ROUNDTRIP = [
    ["foo", None],
    ["foo", "bar", 1, 2, 3],
    [1.1, [2.2, "foo"], "bar", ["baz", "bash"]],
    [1.1, [2.2, [3.3, ["foo"]]]],
    [1.1, {"foo": ["bar", "baz", "bash"]}, 2.2],
    {"foo": "bar", "baz": 1.23},
    {"foo": {"bar": {"baz": {"bash": 1.0}, "boo": 2.0}}},
    {"foo": ["bar", {"baz": {"bash": [1.123, 2.234]}, "boo": 2.0}]},
    [large_string(33_000), large_string(33_000), "baz", "bash"],
    {"foo": large_string(33_000), "bar": large_string(33_000), "z": "g"},
    # integer scalar types a real MySQL server emits (the reference's
    # Go JSON layer only ever produces doubles)
    -5,
    40_000,
    -(2**31),
    2**40,
    2**63 - 1,
    {"small": 7, "neg": -300, "big": 2**50, "arr": [1, -2, 70_000]},
]


@pytest.mark.parametrize(
    "value", ROUNDTRIP, ids=[str(i) for i in range(len(ROUNDTRIP))]
)
def test_roundtrip(value):
    assert decode_binary_json(encode_binary_json(value)) == value


def test_expected_container_type_ids():
    # small vs large encodings flip exactly on 2-byte offset overflow
    assert encode_binary_json(["foo", None])[0] == 0x02
    assert encode_binary_json({"a": 1})[0] == 0x00
    assert encode_binary_json([large_string(70_000)])[0] == 0x03
    assert encode_binary_json({"a": large_string(70_000)})[0] == 0x01


def test_decode_inlined_int16_entry():
    # hand-built small array [300] with the int16 INLINED in the value
    # entry (MySQL does this; the reference encoder never emits it)
    buf = bytes([0x02, 0x01, 0x00, 0x07, 0x00, 0x05, 0x2C, 0x01])
    assert decode_binary_json(buf) == [300]


def test_decode_opaque_surfaces_raw_bytes():
    # non-DECIMAL opaque value (e.g. a DATETIME payload, field type
    # 0x0c): surfaced as raw bytes, not guessed at
    buf = bytes([0x0F, 0x0C, 0x03, 0xAB, 0xCD, 0xEF])
    out = decode_binary_json(buf)
    assert out == {"$opaque": 0x0C, "$bytes": "abcdef"}


def test_truncated_raises():
    good = encode_binary_json({"foo": [1, 2.5, "bar"]})
    with pytest.raises(MysqlJsonError):
        decode_binary_json(good[: len(good) // 2])
    with pytest.raises(MysqlJsonError):
        decode_binary_json(b"")


def test_cdc_feed_decodes_binary_json_payloads(tmp_path):
    # a feed row carrying a binary-JSON column arrives decoded as the
    # JSON text the engine's JSON (string) columns hold
    from myduckserver_spark.streaming.cdc_source import (
        FileCdcFeed,
        wrap_binary_json,
    )

    feed = FileCdcFeed(str(tmp_path / "feed"))
    doc = {"ids": [1, 2, 3], "tag": "a", "ok": True, "score": 1.5}
    feed.append(2, {"id": 1, "data": wrap_binary_json(encode_binary_json(doc))})
    feed.append(2, {"id": 2, "data": "plain"})
    events = list(feed.events_after(0))
    assert len(events) == 2
    import json

    assert json.loads(events[0].row["data"]) == doc
    assert events[1].row["data"] == "plain"


# --------------------------- packed DECIMAL (opaque payload) codec

def test_packed_decimal_documented_vector():
    # THE canonical example from the public MySQL internals manual:
    # DECIMAL(14,4) value 1234567890.1234 -> 81 0D FB 38 D2 04 D2
    import decimal

    from myduckserver_spark.streaming.mysql_json import (
        decode_packed_decimal,
        encode_packed_decimal,
    )

    want_bytes = bytes([0x81, 0x0D, 0xFB, 0x38, 0xD2, 0x04, 0xD2])
    v = decimal.Decimal("1234567890.1234")
    assert encode_packed_decimal(v, 14, 4) == want_bytes
    assert decode_packed_decimal(want_bytes, 14, 4) == v
    # negative values complement every byte
    neg = bytes(~b & 0xFF for b in want_bytes)
    neg = bytes([neg[0] ^ 0x80 ^ 0x80]) + neg[1:]  # sign handling in codec
    assert decode_packed_decimal(
        encode_packed_decimal(-v, 14, 4), 14, 4
    ) == -v


@pytest.mark.parametrize(
    "text,precision,scale",
    [
        ("0", 1, 0),
        ("-1", 5, 0),
        ("0.5", 5, 2),
        ("-0.0001", 18, 4),
        ("99999999999999.9999", 18, 4),
        ("-99999999999999.9999", 18, 4),
        ("123456789012345678901234567.89", 29, 2),
        ("1.123456789123456789", 20, 18),
    ],
)
def test_packed_decimal_roundtrip(text, precision, scale):
    import decimal

    from myduckserver_spark.streaming.mysql_json import (
        decode_packed_decimal,
        encode_packed_decimal,
    )

    v = decimal.Decimal(text)
    raw = encode_packed_decimal(v, precision, scale)
    assert decode_packed_decimal(raw, precision, scale) == v


def test_opaque_decimal_decodes_in_binary_json():
    # a full binary-JSON value carrying an opaque NEWDECIMAL payload
    import decimal

    from myduckserver_spark.streaming.mysql_json import (
        FIELD_TYPE_NEWDECIMAL,
        encode_packed_decimal,
    )

    packed = encode_packed_decimal(decimal.Decimal("42.50"), 6, 2)
    payload = bytes([6, 2]) + packed  # precision, scale, digits
    buf = (
        bytes([0x0F, FIELD_TYPE_NEWDECIMAL, len(payload)]) + payload
    )
    assert decode_binary_json(buf) == decimal.Decimal("42.50")
