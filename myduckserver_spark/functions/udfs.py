"""Engine UDF registry (SURVEY.md §2.D parity).

The reference registers one extra scalar function into its frontend —
``ps_current_thread_id()`` (reference myfunc/ps.go:20-45,
myfunc/registry.go:5-7) — and uses DuckDB macros as its UDF mechanism
(catalog/internal_macro.go:17-31). Spark twins: ``spark.udf.register``
for scalars, and vectorized pandas UDFs for anything per-row heavy
(Arrow-batched; the only sanctioned Python in a hot path).
"""

from __future__ import annotations

import re
import threading

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType


def _current_thread_id() -> int:
    return threading.get_ident() % 2**31


@F.pandas_udf(DoubleType())
def vec_minmax_scale(s: pd.Series) -> pd.Series:
    """Vectorized min-max normalize within each Arrow batch — a demo
    of the Arrow-batched slow path (10-100× over row-at-a-time)."""
    lo, hi = s.min(), s.max()
    if hi == lo:
        return s * 0.0
    return (s - lo) / (hi - lo)


def _inet6_aton(s):
    """MySQL INET6_ATON: textual IPv4/IPv6 → packed binary (4 or 16
    bytes), NULL on malformed input. Real address parsing needs
    stdlib ipaddress — a scalar UDF, never a hot path (net-admin
    helper, same tier as the reference's GMS builtin)."""
    import ipaddress

    if s is None:
        return None
    try:
        return ipaddress.ip_address(s).packed
    except ValueError:
        return None


def _inet6_ntoa(b):
    import ipaddress

    if b is None or len(b) not in (4, 16):
        return None
    try:
        return str(ipaddress.ip_address(bytes(b)))
    except ValueError:
        return None


def _mysql_time_format(t, fmt):
    """MySQL TIME_FORMAT: time-only %-tokens over a TIME value that
    may exceed 24 h or be negative (manual 14.7). Scalar one-off —
    same documented slow path as INET6 (row counts are tiny: report
    formatting, not scans)."""
    if t is None or fmt is None:
        return None
    m = re.match(
        r"\s*(-)?(\d+):(\d{1,2}):(\d{1,2})(?:\.(\d{1,6}))?\s*$", str(t)
    )
    if not m:
        return None
    neg, hh, mi, ss, us = (m.group(1) or ""), int(m.group(2)), \
        int(m.group(3)), int(m.group(4)), (m.group(5) or "")
    us = us.ljust(6, "0") if us else "000000"
    h12 = hh % 24
    h12 = 12 if h12 % 12 == 0 else h12 % 12
    ampm = "AM" if (hh % 24) < 12 else "PM"
    subs = {
        "%H": f"{neg}{hh:02d}", "%k": f"{neg}{hh}",
        "%h": f"{h12:02d}", "%I": f"{h12:02d}", "%l": str(h12),
        "%i": f"{mi:02d}", "%s": f"{ss:02d}", "%S": f"{ss:02d}",
        "%f": us, "%p": ampm,
        "%r": f"{h12:02d}:{mi:02d}:{ss:02d} {ampm}",
        "%T": f"{neg}{hh:02d}:{mi:02d}:{ss:02d}", "%%": "%",
    }
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            out.append(subs.get(fmt[i:i + 2], fmt[i + 1]))
            i += 2
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


def _mysql_regexp_instr(s, pat, pos, occ, ret_opt):
    """MySQL REGEXP_INSTR(expr, pat, pos, occurrence, return_option)
    (manual 14.8.2): position of the occurrence-th match searching
    from pos; return_option 1 reports the position AFTER the match."""
    if s is None or pat is None:
        return None
    pos = int(pos or 1)
    occ = int(occ or 1)
    if pos < 1 or occ < 1:
        raise ValueError("REGEXP_INSTR: pos/occurrence must be >= 1")
    n = 0
    for m in re.finditer(pat, s[pos - 1:]):
        n += 1
        if n == occ:
            base = pos + m.start()
            return base + (m.end() - m.start()) if int(ret_opt or 0) \
                else base
    return 0


def _mysql_regexp_substr(s, pat, pos, occ):
    """MySQL REGEXP_SUBSTR(expr, pat, pos, occurrence)."""
    if s is None or pat is None:
        return None
    pos = int(pos or 1)
    occ = int(occ or 1)
    n = 0
    for m in re.finditer(pat, s[pos - 1:]):
        n += 1
        if n == occ:
            return m.group(0)
    return None


def _mysql_aes_key(key):
    """MySQL AES key derivation: XOR-fold the key string into 16
    bytes (mysys/my_aes.cc) — what lets arbitrary-length passphrases
    work where Spark demands exact 16/24/32-byte keys."""
    if key is None:
        return None
    raw = key.encode() if isinstance(key, str) else bytes(key)
    out = bytearray(16)
    for i, b in enumerate(raw):
        out[i % 16] ^= b
    return bytes(out)


def _mysql_compress(data):
    """MySQL COMPRESS: 4-byte little-endian uncompressed length header
    + zlib stream; empty input compresses to empty."""
    import struct
    import zlib

    if data is None:
        return None
    raw = bytes(data)
    if not raw:
        return b""
    return struct.pack("<I", len(raw)) + zlib.compress(raw)


def _mysql_uncompress(data):
    import zlib

    if data is None:
        return None
    raw = bytes(data)
    if not raw:
        return b""
    try:
        return zlib.decompress(raw[4:])
    except Exception:
        return None  # MySQL: NULL + warning on corrupt input


def _mysql_stmt_digest(stmt):
    """STATEMENT_DIGEST_TEXT: normalized statement with literals
    replaced by ? (whitespace collapsed, keywords uppercased —
    MySQL's digest normal form, approximated)."""
    if stmt is None:
        return None
    s = re.sub(r"'(?:[^']|'')*'", "?", stmt)
    s = re.sub(r"\b\d+(\.\d+)?\b", "?", s)
    s = re.sub(r"\s+", " ", s).strip()
    return re.sub(
        r"[A-Za-z_]+",
        lambda m: m.group(0).upper()
        if m.group(0).upper() in _DIGEST_KW else m.group(0),
        s,
    ) + (" ;" if not s.endswith(";") else "")


_DIGEST_KW = frozenset(
    "SELECT FROM WHERE AND OR NOT IN IS NULL LIKE GROUP BY ORDER "
    "HAVING LIMIT JOIN ON AS INSERT INTO VALUES UPDATE SET DELETE".split()
)


def register_engine_udfs(spark: SparkSession) -> None:
    """Register the engine's session UDFs (call once at bootstrap,
    like the reference's provider init, catalog/provider.go:108-239)."""
    from pyspark.sql.types import BinaryType, StringType

    spark.udf.register("ps_current_thread_id", _current_thread_id, LongType())
    spark.udf.register("vec_minmax_scale", vec_minmax_scale)
    spark.udf.register("inet6_aton", _inet6_aton, BinaryType())
    spark.udf.register("inet6_ntoa", _inet6_ntoa, StringType())
    spark.udf.register("mysql_time_format", _mysql_time_format,
                       StringType())
    spark.udf.register("mysql_regexp_instr", _mysql_regexp_instr,
                       LongType())
    spark.udf.register("mysql_regexp_substr", _mysql_regexp_substr,
                       StringType())
    spark.udf.register("mysql_aes_key", _mysql_aes_key, BinaryType())
    spark.udf.register("mysql_compress", _mysql_compress, BinaryType())
    spark.udf.register("mysql_uncompress", _mysql_uncompress,
                       BinaryType())
    spark.udf.register("mysql_stmt_digest", _mysql_stmt_digest,
                       StringType())
    # DuckDB-dialect integer math (the pg door exposes DuckDB SQL)
    import math

    spark.udf.register(
        "gcd", lambda a, b: (math.gcd(int(a), int(b))
                             if a is not None and b is not None
                             else None), LongType())
    spark.udf.register(
        "lcm", lambda a, b: (math.lcm(int(a), int(b))
                             if a is not None and b is not None
                             else None), LongType())
