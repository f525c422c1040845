"""MySQL binary-JSON codec (pure byte decoding, no networking).

MySQL stores JSON columns — and ships them in binlog row events — in a
custom binary format (publicly documented at
https://dev.mysql.com/doc/dev/mysql-server/latest/json__binary_8h.html).
The reference implements the ENCODE half for producing binlog events
(reference: binlogreplication/binlog_json_serialization.go:26-60 type
tags, :82-132 array layout, :148-229 object layout, :304-327 varlen
string lengths) and leans on Vitess for decode. This module implements
BOTH halves in pure Python so the CDC feed can carry real binary-JSON
payloads end-to-end:

- ``decode_binary_json(buf)``: wire bytes → Python value. Handles the
  full public format, including the pieces a genuine MySQL server
  emits that the reference's encoder never produces: inlined
  int16/uint16 value entries (and int32/uint32 in the large format),
  and all integer scalar types.
- ``encode_binary_json(value)``: Python value → wire bytes. Matches
  the reference encoder byte-for-byte on its own test vectors
  (binlog_json_serialization_test.go:28-117): keys sorted, small
  encoding attempted first, literals inlined in value entries. On top
  of that, Python ints encode as proper MySQL int types (the
  reference's Go JSON layer only ever sees float64).

Format summary (all little-endian):
- 1 type byte, then the payload.
- small object 0x00 / large object 0x01: count, size, key entries
  (offset + 2-byte key length), value entries (type byte +
  offset-or-inlined-value), key bytes, value bytes. Counts, sizes and
  offsets are 2 bytes in the small format, 4 in the large; offsets are
  relative to the start of the payload (after the type byte).
- small array 0x02 / large array 0x03: count, size, value entries,
  value bytes.
- literal 0x04: one byte — 0x00 null, 0x01 true, 0x02 false.
- 0x05..0x0a: int16/uint16/int32/uint32/int64/uint64. 0x0b: float64.
- string 0x0c: varlen length (7 bits per byte, high-bit continuation),
  then UTF-8 bytes.
- 0x0f: opaque/custom (DECIMAL, DATE/TIME/DATETIME payloads) — decoded
  to a ``{"$opaque": <type-byte>, "$bytes": <hex>}`` marker rather
  than guessed at.
"""

from __future__ import annotations

import struct
from typing import Any

TYPE_SMALL_OBJECT = 0x00
TYPE_LARGE_OBJECT = 0x01
TYPE_SMALL_ARRAY = 0x02
TYPE_LARGE_ARRAY = 0x03
TYPE_LITERAL = 0x04
TYPE_INT16 = 0x05
TYPE_UINT16 = 0x06
TYPE_INT32 = 0x07
TYPE_UINT32 = 0x08
TYPE_INT64 = 0x09
TYPE_UINT64 = 0x0A
TYPE_DOUBLE = 0x0B
TYPE_STRING = 0x0C
TYPE_OPAQUE = 0x0F

LITERAL_NULL = 0x00
LITERAL_TRUE = 0x01
LITERAL_FALSE = 0x02

_MAX_SMALL_OFFSET = 0xFFFF
_MAX_STRING_LEN = 0x1FFFFF  # reference cap: 3-byte varlen


class MysqlJsonError(ValueError):
    pass


# --------------------------------------------------------------- decode


def decode_binary_json(buf: bytes) -> Any:
    """Full wire value (type byte + payload) → Python value."""
    if not buf:
        raise MysqlJsonError("empty binary JSON value")
    try:
        return _decode_value(buf[0], memoryview(buf), 1)
    except struct.error as e:  # truncated fixed-width payload
        raise MysqlJsonError(f"truncated binary JSON value: {e}") from None


def _u(view: memoryview, at: int, width: int) -> int:
    if at + width > len(view):
        raise MysqlJsonError("truncated binary JSON value")
    return int.from_bytes(view[at : at + width], "little")


def _decode_value(type_id: int, view: memoryview, at: int) -> Any:
    if type_id in (TYPE_SMALL_OBJECT, TYPE_LARGE_OBJECT):
        return _decode_container(
            view, at, large=type_id == TYPE_LARGE_OBJECT, is_object=True
        )
    if type_id in (TYPE_SMALL_ARRAY, TYPE_LARGE_ARRAY):
        return _decode_container(
            view, at, large=type_id == TYPE_LARGE_ARRAY, is_object=False
        )
    if type_id == TYPE_LITERAL:
        lit = _u(view, at, 1)
        if lit == LITERAL_NULL:
            return None
        if lit == LITERAL_TRUE:
            return True
        if lit == LITERAL_FALSE:
            return False
        raise MysqlJsonError(f"bad literal byte 0x{lit:02x}")
    if type_id == TYPE_INT16:
        return struct.unpack_from("<h", view, at)[0]
    if type_id == TYPE_UINT16:
        return _u(view, at, 2)
    if type_id == TYPE_INT32:
        return struct.unpack_from("<i", view, at)[0]
    if type_id == TYPE_UINT32:
        return _u(view, at, 4)
    if type_id == TYPE_INT64:
        return struct.unpack_from("<q", view, at)[0]
    if type_id == TYPE_UINT64:
        return _u(view, at, 8)
    if type_id == TYPE_DOUBLE:
        return struct.unpack_from("<d", view, at)[0]
    if type_id == TYPE_STRING:
        length, at = _read_string_length(view, at)
        if at + length > len(view):
            raise MysqlJsonError("truncated string payload")
        return bytes(view[at : at + length]).decode("utf-8")
    if type_id == TYPE_OPAQUE:
        # DECIMAL/DATE/TIME/DATETIME ride as opaque payloads. DECIMAL
        # (field type 0xf6, MYSQL_TYPE_NEWDECIMAL) has a fully public
        # layout — precision byte, scale byte, packed decimal — and
        # decodes exactly; other sub-types surface raw bytes honestly.
        sub = _u(view, at, 1)
        length, at2 = _read_string_length(view, at + 1)
        payload = bytes(view[at2 : at2 + length])
        if sub == FIELD_TYPE_NEWDECIMAL and len(payload) >= 2:
            return decode_packed_decimal(
                payload[2:], payload[0], payload[1]
            )
        return {"$opaque": sub, "$bytes": payload.hex()}
    raise MysqlJsonError(f"unknown binary JSON type 0x{type_id:02x}")


# ------------------------------------------------- packed DECIMAL codec

FIELD_TYPE_NEWDECIMAL = 0xF6

# bytes needed for 0..9 leftover decimal digits of a 9-digit group
_DIG2BYTES = (0, 1, 1, 2, 2, 3, 3, 4, 4, 4)


def decode_packed_decimal(raw: bytes, precision: int, scale: int):
    """MySQL packed ("myisam") decimal → ``decimal.Decimal``.

    The on-disk/binlog DECIMAL format (public, MySQL internals manual /
    strings/decimal.c `decimal2bin`): digits are stored big-endian in
    base-10^9 groups of 4 bytes, with partial leading/trailing groups
    shortened per _DIG2BYTES; the first byte's high bit is the sign
    (1 = non-negative) and every byte of a negative value is
    complemented. Canonical documented example: DECIMAL(14,4) value
    1234567890.1234 → 81 0D FB 38 D2 04 D2.
    """
    import decimal

    intg = precision - scale
    intg9, intgr = divmod(intg, 9)
    frac9, fracr = divmod(scale, 9)
    nbytes = intg9 * 4 + _DIG2BYTES[intgr] + frac9 * 4 + _DIG2BYTES[fracr]
    if len(raw) < nbytes:
        raise MysqlJsonError("truncated packed decimal")
    b = bytearray(raw[:nbytes])
    negative = not (b[0] & 0x80)
    b[0] ^= 0x80
    if negative:
        for i in range(len(b)):
            b[i] = ~b[i] & 0xFF
    pos = 0
    int_digits = ""
    if intgr:
        w = _DIG2BYTES[intgr]
        int_digits += str(int.from_bytes(b[pos : pos + w], "big"))
        pos += w
    for _ in range(intg9):
        g = int.from_bytes(b[pos : pos + 4], "big")
        int_digits += f"{g:09d}" if int_digits else str(g)
        pos += 4
    frac_digits = ""
    for _ in range(frac9):
        frac_digits += f"{int.from_bytes(b[pos:pos + 4], 'big'):09d}"
        pos += 4
    if fracr:
        w = _DIG2BYTES[fracr]
        frac_digits += (
            f"{int.from_bytes(b[pos:pos + w], 'big'):0{fracr}d}"
        )
        pos += w
    text = (int_digits or "0") + ("." + frac_digits if frac_digits else "")
    return decimal.Decimal(("-" if negative else "") + text)


def encode_packed_decimal(value, precision: int, scale: int) -> bytes:
    """``decimal.Decimal`` → MySQL packed decimal bytes (inverse of
    decode_packed_decimal; used for fixtures and round-trip tests)."""
    import decimal

    with decimal.localcontext() as ctx:
        ctx.prec = 65  # MySQL's DECIMAL precision ceiling
        v = decimal.Decimal(value).quantize(
            decimal.Decimal(1).scaleb(-scale)
            if scale
            else decimal.Decimal(1)
        )
    negative = v < 0
    v = -v if negative else v
    digits = f"{v:f}"
    int_part, _, frac_part = digits.partition(".")
    intg = precision - scale
    int_part = int_part.rjust(intg, "0")
    frac_part = frac_part.ljust(scale, "0")
    if len(int_part) > intg or len(frac_part) > scale:
        raise MysqlJsonError("value does not fit DECIMAL precision")
    out = bytearray()
    intg9, intgr = divmod(intg, 9)
    frac9, fracr = divmod(scale, 9)
    pos = 0
    if intgr:
        out += int(int_part[:intgr] or "0").to_bytes(
            _DIG2BYTES[intgr], "big"
        )
        pos = intgr
    for _ in range(intg9):
        out += int(int_part[pos : pos + 9]).to_bytes(4, "big")
        pos += 9
    pos = 0
    for _ in range(frac9):
        out += int(frac_part[pos : pos + 9]).to_bytes(4, "big")
        pos += 9
    if fracr:
        out += int(frac_part[pos : pos + fracr]).to_bytes(
            _DIG2BYTES[fracr], "big"
        )
    if negative:
        for i in range(len(out)):
            out[i] = ~out[i] & 0xFF
    out[0] ^= 0x80
    return bytes(out)


def _read_string_length(view: memoryview, at: int) -> tuple[int, int]:
    """Varlen length: 7 bits per byte, high bit = continuation."""
    length = 0
    for i in range(5):
        b = _u(view, at + i, 1)
        length |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            return length, at + i + 1
    raise MysqlJsonError("string length varint too long")


def _decode_container(
    view: memoryview, at: int, large: bool, is_object: bool
) -> Any:
    w = 4 if large else 2
    count = _u(view, at, w)
    # size field at at+w spans the whole payload; offsets are relative
    # to `at` (payload start, right after the type byte)
    entry_at = at + 2 * w
    keys: list[str] = []
    if is_object:
        for i in range(count):
            koff = _u(view, entry_at + i * (w + 2), w)
            klen = _u(view, entry_at + i * (w + 2) + w, 2)
            keys.append(
                bytes(view[at + koff : at + koff + klen]).decode("utf-8")
            )
        entry_at += count * (w + 2)
    values: list[Any] = []
    for i in range(count):
        e = entry_at + i * (1 + w)
        vtype = _u(view, e, 1)
        if vtype == TYPE_LITERAL:
            values.append(
                _decode_value(TYPE_LITERAL, view, e + 1)
            )  # inlined literal byte
        elif vtype in (TYPE_INT16, TYPE_UINT16) or (
            large and vtype in (TYPE_INT32, TYPE_UINT32)
        ):
            # MySQL inlines ints that fit the offset slot
            values.append(_decode_value(vtype, view, e + 1))
        else:
            voff = _u(view, e + 1, w)
            values.append(_decode_value(vtype, view, at + voff))
    if is_object:
        return dict(zip(keys, values))
    return values


# --------------------------------------------------------------- encode


def encode_binary_json(value: Any) -> bytes:
    """Python value → full wire value (type byte + payload)."""
    type_id, payload = _encode_value(value)
    return bytes([type_id]) + payload


def _encode_value(value: Any) -> tuple[int, bytes]:
    if value is None:
        return TYPE_LITERAL, bytes([LITERAL_NULL])
    if isinstance(value, bool):  # before int: bool subclasses int
        return TYPE_LITERAL, bytes(
            [LITERAL_TRUE if value else LITERAL_FALSE]
        )
    if isinstance(value, int):
        if -(2**15) <= value < 2**15:
            return TYPE_INT16, struct.pack("<h", value)
        if -(2**31) <= value < 2**31:
            return TYPE_INT32, struct.pack("<i", value)
        if -(2**63) <= value < 2**63:
            return TYPE_INT64, struct.pack("<q", value)
        if value < 2**64:
            return TYPE_UINT64, struct.pack("<Q", value)
        raise MysqlJsonError("integer out of 64-bit range")
    if isinstance(value, float):
        return TYPE_DOUBLE, struct.pack("<d", value)
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return TYPE_STRING, _string_length_bytes(len(raw)) + raw
    if isinstance(value, (list, tuple)):
        try:
            return _encode_container(list(value), large=False, keys=None)
        except _SmallOverflow:
            return _encode_container(list(value), large=True, keys=None)
    if isinstance(value, dict):
        keys = sorted(value)  # reference sorts keys; MySQL's own order
        # (length-then-alpha) is not required for correct replication
        items = [value[k] for k in keys]
        try:
            return _encode_container(items, large=False, keys=keys)
        except _SmallOverflow:
            return _encode_container(items, large=True, keys=keys)
    raise MysqlJsonError(f"unsupported type for binary JSON: {type(value)}")


class _SmallOverflow(Exception):
    """Small (2-byte-offset) encoding cannot hold this container."""


def _string_length_bytes(length: int) -> bytes:
    if length > _MAX_STRING_LEN:
        raise MysqlJsonError(
            "strings larger than 2,097,151 bytes not supported"
        )
    out = bytearray()
    while True:
        b = length & 0x7F
        length >>= 7
        if length:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_container(
    items: list, large: bool, keys: list[str] | None
) -> tuple[int, bytes]:
    w = 4 if large else 2
    is_object = keys is not None
    n = len(items)
    if not large and n > _MAX_SMALL_OFFSET:
        raise _SmallOverflow
    entry_w = 1 + w

    key_entries = bytearray()
    key_bytes = bytearray()
    # first key lands right after: count + size + key entries + value
    # entries (reference: calculateInitialObjectKeysOffset / ...ArrayValuesOffset)
    off = 2 * w + n * entry_w + (n * (w + 2) if is_object else 0)
    if is_object:
        for k in keys:
            raw = k.encode("utf-8")
            if not large and off + len(raw) > _MAX_SMALL_OFFSET:
                raise _SmallOverflow
            key_entries += off.to_bytes(w, "little")
            key_entries += len(raw).to_bytes(2, "little")
            key_bytes += raw
            off += len(raw)

    value_entries = bytearray()
    value_bytes = bytearray()
    for item in items:
        type_id, payload = _encode_value(item)
        inline = type_id == TYPE_LITERAL or type_id in (
            TYPE_INT16,
            TYPE_UINT16,
        ) or (large and type_id in (TYPE_INT32, TYPE_UINT32))
        if inline:
            # inlined values occupy the offset slot, zero-padded to w
            value_entries.append(type_id)
            value_entries += payload + b"\x00" * (w - len(payload))
        else:
            if not large and off + len(payload) > _MAX_SMALL_OFFSET:
                raise _SmallOverflow
            value_entries.append(type_id)
            value_entries += off.to_bytes(w, "little")
            value_bytes += payload
            off += len(payload)

    out = bytearray()
    out += n.to_bytes(w, "little")
    out += off.to_bytes(w, "little")  # total payload size
    out += key_entries
    out += value_entries
    out += key_bytes
    out += value_bytes
    if is_object:
        return (TYPE_LARGE_OBJECT if large else TYPE_SMALL_OBJECT, bytes(out))
    return (TYPE_LARGE_ARRAY if large else TYPE_SMALL_ARRAY, bytes(out))
