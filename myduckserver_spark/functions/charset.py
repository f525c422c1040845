"""Per-column charset output re-encoding.

The reference stores every string UTF-8 inside DuckDB and re-encodes to
the column's declared MySQL charset on the way OUT to the client
(reference: backend/iter.go:176-182; supported set charset/charset.go:
18-31). Spark strings are UTF-8 too, so the analog is a wire-side
projection: string columns whose metadata declares a non-UTF-8 charset
are re-encoded to BINARY.

JVM-native `encode` covers the charsets Spark's codec registry knows
(ascii, latin1, UTF-16 family); the CJK multi-byte sets (gbk, gb2312,
gb18030, big5) go through an Arrow-batched pandas UDF — Python's codec
library has them all, and the batch transfer keeps it off the
row-at-a-time path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# MySQL charset name → (spark-encode charset | None, python codec)
# Mirrors the reference's supported set (charset/charset.go:18-31).
CHARSETS: dict[str, tuple[str | None, str]] = {
    "ascii": ("US-ASCII", "ascii"),
    "latin1": ("ISO-8859-1", "latin-1"),
    "utf8": (None, "utf-8"),       # no-op: storage is already UTF-8
    "utf8mb3": (None, "utf-8"),
    "utf8mb4": (None, "utf-8"),
    "ucs2": ("UTF-16BE", "utf-16-be"),
    "utf16": ("UTF-16BE", "utf-16-be"),
    "utf16le": ("UTF-16LE", "utf-16-le"),
    "utf32": (None, "utf-32-be"),
    "gb2312": (None, "gb2312"),
    "gbk": (None, "gbk"),
    "gb18030": (None, "gb18030"),
    "big5": (None, "big5"),
}


def is_supported(name: str) -> bool:
    return name.lower() in CHARSETS


def encode_column(col: Column | str, charset: str) -> Column:
    """Re-encode a UTF-8 string column to the charset's bytes."""
    cs = charset.lower()
    if cs not in CHARSETS:
        raise ValueError(f"unsupported charset: {charset}")
    _jvm_name, py_codec = CHARSETS[cs]
    c = F.col(col) if isinstance(col, str) else col
    if py_codec == "utf-8":
        return c.cast("binary")
    # Always the Arrow-batched UDF: Spark's JVM `encode` raises
    # MALFORMED_CHARACTER_CODING on unmappable characters, while MySQL
    # substitutes '?' (errors='replace') — semantics win over the JVM
    # fast path here.
    from pyspark.sql.functions import pandas_udf

    _enc = pandas_udf(
        lambda s: s.map(
            lambda v: None if v is None else v.encode(py_codec, errors="replace")
        ),
        "binary",
    )
    return _enc(c)


def wire_encode(df: DataFrame) -> DataFrame:
    """Apply declared column charsets for wire output.

    String columns with metadata ``charset`` != utf8 become BINARY in
    the declared encoding; everything else passes through. This is the
    last projection before a protocol layer would serialize rows — the
    Spark twin of the reference's row-seam re-encode.
    """
    out_cols = []
    for f in df.schema.fields:
        cs = (f.metadata or {}).get("charset")
        if cs and cs.lower() not in ("utf8", "utf8mb3", "utf8mb4") and is_supported(cs):
            out_cols.append(encode_column(f.name, cs).alias(f.name))
        else:
            out_cols.append(F.col(f.name))
    return df.select(*out_cols)
