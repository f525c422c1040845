"""MySQL-dialect SQL normalization for the Spark SQL front door.

The reference transpiles MySQL → DuckDB SQL with SQLGlot
(reference transpiler/translate.go:102; concrete cases in
transpiler/translate_test.go:10-67). SQLGlot is not in this image, so
this module implements the subset of rewrites those test cases cover —
Spark's SQL dialect is already close to MySQL, so the gap is small:

- backtick identifiers → Spark handles backticks natively (no-op),
- ``LIMIT offset, count`` → ``LIMIT count OFFSET offset``,
- ``DIV`` integer division → Spark supports DIV natively,
- function aliases (GROUP_CONCAT, NOW, CURDATE, UCASE, ...),
- DATE_FORMAT/STR_TO_DATE %-token patterns → Java datetime patterns.

This is deliberately a *normalizer*, not a full parser: queries that
are already valid Spark SQL pass through untouched.
"""

from __future__ import annotations

import re

# MySQL %-tokens → Java/Spark datetime pattern tokens
# (subset the reference's tests exercise; TestDateParse main_test.go:2177)
_FMT_TOKENS = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%c": "M", "%d": "dd", "%e": "d",
    "%H": "HH", "%k": "H", "%h": "hh", "%l": "h", "%i": "mm", "%s": "ss",
    "%S": "ss", "%f": "SSSSSS", "%p": "a", "%W": "EEEE", "%a": "EEE",
    "%b": "MMM", "%M": "MMMM", "%j": "DDD", "%%": "%",
}

_LIMIT_RE = re.compile(r"\bLIMIT\s+(\d+)\s*,\s*(\d+)", re.I)
_GROUP_CONCAT_RE = re.compile(
    r"\bGROUP_CONCAT\s*\(\s*(DISTINCT\s+)?(.*?)"
    r"(?:\s+ORDER\s+BY\s+(.+?)(\s+DESC)?)?"
    r"(?:\s+SEPARATOR\s+'([^']*)')?\s*\)",
    re.I | re.S,
)


def mysql_datetime_format(fmt: str) -> str:
    """Translate a MySQL %-format string to a Java datetime pattern."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            out.append(_FMT_TOKENS.get(tok, tok[1]))
            i += 2
        else:
            # quote literal letters so Java patterns don't eat them
            c = fmt[i]
            out.append(f"'{c}'" if c.isalpha() else c)
            i += 1
    return "".join(out)


def _rewrite_datetime_fns(sql: str) -> str:
    def repl(m: re.Match) -> str:
        fn = m.group(1).upper()
        arg = m.group(2)
        fmt = mysql_datetime_format(m.group(3))
        if fn == "DATE_FORMAT":
            return f"date_format({arg}, '{fmt}')"
        return f"to_timestamp({arg}, '{fmt}')"  # STR_TO_DATE

    return re.sub(
        r"\b(DATE_FORMAT|STR_TO_DATE)\s*\(\s*(.+?)\s*,\s*'([^']*)'\s*\)",
        repl,
        sql,
        flags=re.I,
    )


_SIMPLE_FN_ALIASES = {
    r"\bNOW\s*\(\s*\)": "current_timestamp()",
    r"\bCURDATE\s*\(\s*\)": "current_date()",
    r"\bCURTIME\s*\(\s*\)": "date_format(current_timestamp(), 'HH:mm:ss')",
    r"\bUCASE\s*\(": "upper(",
    r"\bLCASE\s*\(": "lower(",
    r"\bDAYOFWEEK\s*\(": "dayofweek(",
    r"\bUNIX_TIMESTAMP\s*\(": "unix_timestamp(",
    r"\bRAND\s*\(\s*\)": "rand()",
    r"\bLAST_INSERT_ID\s*\(\s*\)": "0",
    r"\bCHAR_LENGTH\s*\(": "char_length(",
    r"\bCHARACTER_LENGTH\s*\(": "char_length(",
}

# Single-simple-argument rewrites: FN(arg) → replacement with \1.
# Conservative: the argument must not contain parens or commas (nested
# calls fall through untouched and fail loudly rather than silently
# mis-rewriting).
_ARG_REWRITES = [
    (re.compile(r"\bDAYNAME\s*\(\s*([^(),]+?)\s*\)", re.I),
     r"date_format(\1, 'EEEE')"),
    (re.compile(r"\bMONTHNAME\s*\(\s*([^(),]+?)\s*\)", re.I),
     r"date_format(\1, 'MMMM')"),
    # MySQL WEEKDAY: 0 = Monday; Spark dayofweek: 1 = Sunday
    (re.compile(r"\bWEEKDAY\s*\(\s*([^(),]+?)\s*\)", re.I),
     r"((dayofweek(\1) + 5) % 7)"),
    # DATE_ADD/DATE_SUB(x, INTERVAL n unit) → interval arithmetic
    (re.compile(
        r"\bDATE_ADD\s*\(\s*([^(),]+?)\s*,\s*INTERVAL\s+(\d+)\s+(\w+)\s*\)",
        re.I),
     r"(\1 + INTERVAL \2 \3)"),
    (re.compile(
        r"\bDATE_SUB\s*\(\s*([^(),]+?)\s*,\s*INTERVAL\s+(\d+)\s+(\w+)\s*\)",
        re.I),
     r"(\1 - INTERVAL \2 \3)"),
    # MySQL TRUNCATE(x, d): toward-zero decimal truncation
    (re.compile(
        r"\bTRUNCATE\s*\(\s*([^(),]+?)\s*,\s*(\d+)\s*\)", re.I),
     r"(cast(\1 * pow(10, \2) as bigint) / pow(10, \2))"),
    # FIELD(x, a, b, ...) → 1-based position of x (0 when absent)
    (re.compile(r"\bFIELD\s*\(\s*([^(),]+?)\s*,\s*([^()]+?)\s*\)", re.I),
     r"array_position(array(\2), \1)"),
    # ELT(n, a, b, ...) → n-th string (NULL out of range); `get` is
    # 0-indexed and NULL-on-out-of-bounds in every ANSI mode
    (re.compile(r"\bELT\s*\(\s*([^(),]+?)\s*,\s*([^()]+?)\s*\)", re.I),
     r"get(array(\2), cast(\1 as int) - 1)"),
    # STRCMP(a, b) → -1/0/1 (NULL if either side is NULL)
    (re.compile(
        r"\bSTRCMP\s*\(\s*([^(),]+?)\s*,\s*([^(),]+?)\s*\)", re.I),
     r"(CASE WHEN (\1) IS NULL OR (\2) IS NULL THEN NULL"
     r" WHEN (\1) < (\2) THEN -1 WHEN (\1) = (\2) THEN 0 ELSE 1 END)"),
    # FORMAT(x, d) → grouped thousands with d decimals
    (re.compile(r"\bFORMAT\s*\(\s*([^(),]+?)\s*,\s*(\d+)\s*\)", re.I),
     r"format_number(\1, \2)"),
    # MAKEDATE(year, dayofyear)
    (re.compile(
        r"\bMAKEDATE\s*\(\s*([^(),]+?)\s*,\s*([^(),]+?)\s*\)", re.I),
     r"date_add(make_date(\1, 1, 1), cast(\2 as int) - 1)"),
]

# CONVERT(expr, type): MySQL cast-type names → Spark types. Spark's
# CONVERT doesn't exist; CAST does, but SIGNED/UNSIGNED/CHAR aren't
# Spark type names.
_CONVERT_TYPES = {
    "SIGNED": "bigint", "UNSIGNED": "bigint", "INTEGER": "int",
    "CHAR": "string", "BINARY": "binary", "DATE": "date",
    "DATETIME": "timestamp", "TIME": "string", "DOUBLE": "double",
    "FLOAT": "float", "JSON": "string",
}

_CONVERT_RE = re.compile(
    r"\bCONVERT\s*\(\s*([^(),]+?)\s*,\s*(\w+)(\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?\s*\)",
    re.I,
)


def _rewrite_convert(sql: str) -> str:
    def repl(m: re.Match) -> str:
        ty = m.group(2).upper()
        args = (m.group(3) or "").replace(" ", "")
        mapped = _CONVERT_TYPES.get(ty, ty.lower())
        return f"cast({m.group(1)} as {mapped}{args if ty == 'DECIMAL' else ''})"

    return _CONVERT_RE.sub(repl, sql)


# MATCH(col) AGAINST('terms') → token-overlap relevance score.
# The reference serves fulltext through GMS's index tables
# (TestFulltextIndexes main_test.go:1879); our documented fallback
# (SURVEY.md §2.B) scores by how many query terms appear in the
# column's whitespace tokens — integer relevance, boolean in WHERE.
_MATCH_AGAINST_RE = re.compile(
    r"\bMATCH\s*\(\s*([^()]+?)\s*\)\s+AGAINST\s*\(\s*'([^']*)'"
    r"(?:\s+IN\s+(?:NATURAL\s+LANGUAGE|BOOLEAN)\s+MODE)?\s*\)",
    re.I,
)


def _rewrite_match_against(sql: str) -> str:
    def repl(m: re.Match) -> str:
        col = m.group(1)
        terms = [t for t in m.group(2).lower().split() if t]
        arr = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
        return (
            f"size(array_intersect(split(lower({col}), ' '), array({arr})))"
        )

    return _MATCH_AGAINST_RE.sub(repl, sql)


def translate_mysql(sql: str) -> str:
    """Normalize a MySQL-dialect query into Spark SQL."""
    out = sql
    out = _rewrite_match_against(out)

    # LIMIT offset, count  →  LIMIT count OFFSET offset
    out = _LIMIT_RE.sub(lambda m: f"LIMIT {m.group(2)} OFFSET {m.group(1)}", out)

    # GROUP_CONCAT([DISTINCT] expr [ORDER BY o [DESC]] [SEPARATOR 'x'])
    # DISTINCT → collect_set; ORDER BY expr (the common self-order) →
    # array_sort; ORDER BY other-expr → sort structs of (key, value)
    # and project the value back out. Unordered GROUP_CONCAT is
    # order-UNDEFINED in MySQL; we emit collect_list as-is there.
    def gc(m: re.Match) -> str:
        distinct, expr, order, desc, sep = m.groups()
        sep = sep if sep is not None else ","
        coll = f"collect_set({expr})" if distinct else f"collect_list({expr})"
        if order is None:
            return f"array_join({coll}, '{sep}')"
        order = order.strip()
        if order == expr.strip():
            arr = f"array_sort({coll})"
        else:
            arr = (
                f"transform(array_sort(collect_list("
                f"named_struct('k', {order}, 'v', {expr}))), s -> s.v)"
            )
        if desc:
            arr = f"reverse({arr})"
        return f"array_join({arr}, '{sep}')"

    out = _GROUP_CONCAT_RE.sub(gc, out)
    out = _rewrite_datetime_fns(out)
    for pat, repl in _SIMPLE_FN_ALIASES.items():
        out = re.sub(pat, repl, out, flags=re.I)
    for pat, repl in _ARG_REWRITES:
        out = pat.sub(repl, out)
    out = _rewrite_convert(out)
    return out
