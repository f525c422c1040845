"""Postgres-dialect SQL normalization for the Spark SQL front door.

The reference's second wire surface passes Postgres SQL essentially
verbatim to DuckDB (reference: pgserver/connection_handler.go:411-449,
duck_handler.go:133-233), because DuckDB's dialect is pg-compatible.
Spark SQL is close but not identical, so this module rewrites the
pg-isms that appear in that passthrough surface:

- ``expr::type`` casts (incl. chained casts, ``numeric(p,s)``,
  ``double precision``, ``type[]`` arrays) → ``CAST(expr AS t)``,
- ``SELECT DISTINCT ON (keys) ...`` → ROW_NUMBER window rewrite
  (DuckDB supports DISTINCT ON natively; Spark does not),
- ``QUALIFY pred`` → boolean window column + outer filter (DuckDB/
  Snowflake clause; Spark has none),
- ``~`` / ``~*`` / ``!~`` / ``!~*`` regex operators → RLIKE,
- ``E'...'`` escape-string literals → plain literals (Spark processes
  backslash escapes by default),
- ``FETCH FIRST n ROWS ONLY`` → ``LIMIT n``,
- function shims: ``strpos``, ``string_agg(e, sep ORDER BY o)`` →
  ``listagg ... WITHIN GROUP``, ``to_char`` (common tokens),
  ``generate_series`` in FROM → ``explode(sequence(...))``.

Like mysql_compat, this is a *normalizer*, not a parser: valid Spark
SQL passes through untouched. String-literal detection is
parity-of-quotes based (no escaped-quote support inside literals —
pg doubles quotes, which parity handles: ``''`` flips twice).
"""

from __future__ import annotations

import os
import re

# ------------------------------------------------------------- type names

# Multi-word pg type names, longest first so the scanner prefers them.
_MULTIWORD_TYPES = [
    "timestamp with time zone",
    "timestamp without time zone",
    "time with time zone",
    "time without time zone",
    "double precision",
    "character varying",
]

_PG_TYPE_MAP = {
    "smallint": "SMALLINT", "int2": "SMALLINT",
    "integer": "INT", "int": "INT", "int4": "INT",
    "bigint": "BIGINT", "int8": "BIGINT",
    "real": "FLOAT", "float4": "FLOAT", "float": "DOUBLE",
    "double precision": "DOUBLE", "float8": "DOUBLE",
    "double": "DOUBLE",
    "numeric": "DECIMAL", "decimal": "DECIMAL",
    "text": "STRING", "varchar": "STRING", "character varying": "STRING",
    "char": "STRING", "character": "STRING", "bpchar": "STRING",
    "name": "STRING",
    "boolean": "BOOLEAN", "bool": "BOOLEAN",
    "bytea": "BINARY",
    "date": "DATE",
    "timestamp": "TIMESTAMP", "timestamptz": "TIMESTAMP",
    "timestamp with time zone": "TIMESTAMP",
    "timestamp without time zone": "TIMESTAMP",
    # Spark has no TIME type; the reference maps MySQL TIME to a
    # duration (SURVEY.md §1.2) — for pg casts a string is the
    # round-trippable choice.
    "time": "STRING", "time with time zone": "STRING",
    "time without time zone": "STRING",
    "json": "STRING", "jsonb": "STRING", "uuid": "STRING",
    "oid": "BIGINT", "regclass": "STRING",
    "interval": "INTERVAL DAY TO SECOND",
}


def _in_string(sql: str, idx: int) -> bool:
    """True when idx falls inside a single-quoted literal (parity scan)."""
    return sql.count("'", 0, idx) % 2 == 1


def _in_dquoted(sql: str, idx: int) -> bool:
    """True when idx falls inside a double-quoted pg identifier."""
    return sql.count('"', 0, idx) % 2 == 1


def _operand_start(s: str, end: int) -> int:
    """Start index of the expression operand ending just before `end`.

    Handles: identifier/number/dotted chains, quoted identifiers,
    string literals, and balanced-paren groups optionally preceded by a
    function name (covers ``f(x)::t`` and ``CAST(...)::t`` chains).
    """
    j = end - 1
    while j >= 0 and s[j].isspace():
        j -= 1
    if j < 0:
        return end
    if s[j] == ")":
        depth = 0
        while j >= 0:
            if s[j] == ")":
                depth += 1
            elif s[j] == "(":
                depth -= 1
                if depth == 0:
                    break
            j -= 1
        k = j - 1
        while k >= 0 and (s[k].isalnum() or s[k] in "_$"):
            k -= 1
        return k + 1 if k < j - 1 else j
    if s[j] in "'\"`":
        q = s[j]
        k = j - 1
        while k >= 0 and s[k] != q:
            k -= 1
        return max(k, 0)
    k = j
    while k >= 0 and (s[k].isalnum() or s[k] in "_$."):
        k -= 1
    return k + 1


def _operand_end(s: str, start: int) -> int:
    """End index (exclusive) of the expression operand beginning at
    or after `start` — the forward mirror of ``_operand_start``.

    Handles: optional unary sign, string literals, identifier /
    number / dotted chains, a trailing call-argument or paren group,
    and ``[i]`` subscript suffixes."""
    j = start
    n = len(s)
    while j < n and s[j].isspace():
        j += 1
    if j < n and s[j] in "+-":
        j += 1
        while j < n and s[j].isspace():
            j += 1
    if j >= n:
        return j
    if s[j] in "'\"`":
        q = s[j]
        j += 1
        while j < n:
            if s[j] == q:
                if q == "'" and j + 1 < n and s[j + 1] == "'":
                    j += 2
                    continue
                return j + 1
            j += 1
        return j
    if s[j] == "(":
        depth = 0
        while j < n:
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
                if depth == 0:
                    j += 1
                    break
            j += 1
    else:
        while j < n and (s[j].isalnum() or s[j] in "_$."):
            j += 1
        k = j
        while k < n and s[k].isspace():
            k += 1
        if k < n and s[k] == "(":
            depth = 0
            j = k
            while j < n:
                if s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
                j += 1
    # subscript suffixes: a[1], a[1][2]
    while j < n and s[j] == "[":
        depth = 0
        while j < n:
            if s[j] == "[":
                depth += 1
            elif s[j] == "]":
                depth -= 1
                if depth == 0:
                    j += 1
                    break
            j += 1
    return j


def _rewrite_power_op(sql: str) -> str:
    """pg ``a ^ b`` is exponentiation (left-associative) → Spark
    ``power(a, b)``. Runs BEFORE _rewrite_xor_op turns pg ``#`` into
    Spark's ``^`` XOR, so any ``^`` seen here is pg power — letting it
    reach Spark unchanged would silently XOR (2 ^ 10 = 8, not 1024)."""
    out = sql
    pos = 0
    while True:
        i = out.find("^", pos)
        if i < 0:
            return out
        if _in_string(out, i) or _in_dquoted(out, i):
            pos = i + 1
            continue
        start = _operand_start(out, i)
        left = out[start:i].strip()
        end = _operand_end(out, i + 1)
        right = out[i + 1:end].strip()
        if not left or not right:
            pos = i + 1
            continue
        repl = f"power({left}, {right})"
        out = out[:start] + repl + out[end:]
        pos = start  # re-scan: left-assoc chains fold outward

def _rewrite_unary_math_ops(sql: str) -> str:
    """pg unary math operators: ``|/ x`` → sqrt, ``||/ x`` → cbrt,
    ``@ x`` → abs. ``@`` is skipped when part of ``@>``/``<@``/``@@``
    (containment / text-search operators rejected elsewhere)."""
    out = sql
    for op, fn in (("||/", "cbrt"), ("|/", "sqrt"), ("@", "abs")):
        pos = 0
        while True:
            i = out.find(op, pos)
            if i < 0:
                break
            if _in_string(out, i) or _in_dquoted(out, i):
                pos = i + 1
                continue
            after = i + len(op)
            if op == "@":
                if (after < len(out) and out[after] in ">@=") or \
                        (i > 0 and out[i - 1] in "<@"):
                    pos = i + 1
                    continue
            elif op == "|/" and i > 0 and out[i - 1] == "|":
                pos = i + 2
                continue
            end = _operand_end(out, after)
            operand = out[after:end].strip()
            if not operand:
                pos = i + 1
                continue
            out = f"{out[:i]}{fn}({operand}){out[end:]}"
            pos = i
    return out


_TYPE_ARGS_RE = re.compile(r"\s*\(\s*\d+(\s*,\s*\d+)?\s*\)")
_ARRAY_SUFFIX_RE = re.compile(r"\s*\[\s*\d*\s*\]")
# negative lookahead for table-alias captures: a clause keyword after a
# FROM-position table function is NOT its alias (`FROM range(5) WHERE x`)
_NOT_CLAUSE_KW = (
    r"(?!(?:WHERE|GROUP|ORDER|LIMIT|OFFSET|HAVING|JOIN|ON|USING|UNION|"
    r"EXCEPT|INTERSECT|LEFT|RIGHT|INNER|CROSS|FULL|NATURAL|QUALIFY|"
    r"WINDOW|FETCH|SET|RETURNING|AND|OR)\b)"
)


def _parse_type(s: str, i: int) -> tuple[str, int] | None:
    """Parse a pg type name at s[i:] → (spark_type, end_index)."""
    rest = s[i:]
    low = rest.lower()
    name = None
    for mw in _MULTIWORD_TYPES:
        if low.startswith(mw):
            name, nlen = mw, len(mw)
            break
    if name is None:
        m = re.match(r"[a-zA-Z_][a-zA-Z0-9_]*", rest)
        if not m:
            return None
        name, nlen = m.group(0).lower(), m.end()
    spark = _PG_TYPE_MAP.get(name)
    if spark is None:
        return None
    end = i + nlen
    args = ""
    m = _TYPE_ARGS_RE.match(s, end)
    if m:
        if spark in ("DECIMAL", "STRING"):
            # length args on strings are dropped (STRING is unbounded);
            # precision args on DECIMAL are kept.
            if spark == "DECIMAL":
                args = re.sub(r"\s+", "", m.group(0))
        end = m.end()
    if spark == "DECIMAL" and not args:
        # bare ``numeric``: pg is arbitrary-precision; use the same
        # 38-cap the reference applies (catalog/type_mapping.go:163-169)
        # with a generous scale.
        args = "(38,9)"
    m = _ARRAY_SUFFIX_RE.match(s, end)
    if m:
        return f"ARRAY<{spark}{args}>", m.end()
    return spark + args, end


def _pg_string_literals(sql: str) -> str:
    """pg string-literal semantics → Spark: a plain ``'...'`` literal
    treats backslash LITERALLY (standard_conforming_strings=on), so
    backslashes double for Spark's C-style parser — otherwise every
    regex pattern (``'\\d+'``) and Windows path silently mangles.
    ``E'...'`` strings use the same escape grammar Spark does — the
    prefix just drops."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if (c in "Ee" and i + 1 < n and sql[i + 1] == "'"
                and (i == 0 or not (sql[i - 1].isalnum()
                                    or sql[i - 1] in "_\"`'"))):
            j = i + 2
            while j < n:
                if sql[j] == "\\":
                    j += 2
                    continue
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i + 1:min(j + 1, n)])
            i = j + 1
            continue
        if c == "'":
            j = i + 1
            body: list[str] = []
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        body.append("''")
                        j += 2
                        continue
                    break
                body.append("\\\\" if sql[j] == "\\" else sql[j])
                j += 1
            out.append("'" + "".join(body) + "'")
            i = j + 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _dquotes_to_backticks(sql: str) -> str:
    """pg double-quoted IDENTIFIERS → Spark backticks (every ORM
    quotes its identifiers: ``SELECT "t"."col" FROM "t"``). In pg a
    double-quoted token outside a single-quoted string is always an
    identifier; ``""`` inside is an escaped quote."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":  # skip string literals ('' escapes)
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i:j + 1])
            i = j + 1
            continue
        if c == '"':
            j = i + 1
            body: list[str] = []
            while j < n:
                if sql[j] == '"':
                    if j + 1 < n and sql[j + 1] == '"':
                        body.append('"')
                        j += 2
                        continue
                    break
                body.append(sql[j])
                j += 1
            out.append("`" + "".join(body).replace("`", "``") + "`")
            i = j + 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _interval_text_secs(txt: str) -> float | None:
    """'15 minutes' / '1 hour 30 minutes' → seconds; None when a unit
    is month-or-larger (not a fixed span)."""
    total = 0.0
    found = False
    for num, unit in re.findall(r"([\d.]+)\s*([A-Za-z]+)", txt):
        mult = {
            "second": 1, "seconds": 1, "sec": 1, "secs": 1, "s": 1,
            "minute": 60, "minutes": 60, "min": 60, "mins": 60,
            "hour": 3600, "hours": 3600, "h": 3600,
            "day": 86400, "days": 86400, "d": 86400,
            "week": 604800, "weeks": 604800,
        }.get(unit.lower())
        if mult is None:
            return None
        total += float(num) * mult
        found = True
    return total if found and total > 0 else None


def _rewrite_casts(sql: str) -> str:
    """``expr::type`` → ``CAST(expr AS type)``, innermost-first."""
    out = sql
    for _ in range(40):  # chained-cast fixpoint guard
        idx = out.find("::")
        while idx != -1 and _in_string(out, idx):
            idx = out.find("::", idx + 2)
        if idx == -1:
            return out
        ty_at = idx + 2
        while ty_at < len(out) and out[ty_at].isspace():
            ty_at += 1
        parsed = _parse_type(out, ty_at)
        if parsed is None:
            # unknown type name: drop the cast operator, keep operand
            out = out[:idx] + out[ty_at:]
            continue
        spark_ty, ty_end = parsed
        start = _operand_start(out, idx)
        operand = out[start:idx].strip()
        # pg hex bytea literals: '\x68690a'::bytea is hex-encoded
        # binary, not the literal text (a plain string cast would
        # keep the characters '\x68690a')
        bm = (spark_ty.upper() == "BINARY"
              and re.fullmatch(r"[Ee]?'(?:\\)?\\x([0-9a-fA-F]*)'",
                               operand))
        if bm:
            out = f"{out[:start]}unhex('{bm.group(1)}'){out[ty_end:]}"
        else:
            out = (f"{out[:start]}CAST({operand} AS {spark_ty})"
                   f"{out[ty_end:]}")
    return out


def _rewrite_xor_op(sql: str) -> str:
    """pg bitwise XOR ``a # b`` → Spark ``a ^ b`` (pg's ``^`` is
    power, but power already arrives as the POW() function from
    clients; ``#`` is the only spelling accepted here).

    ``#>``/``#>>``/``#-`` with a literal ``'{...}'`` path were already
    consumed by _rewrite_json_path_ops; any leftover (non-literal
    path) fails here with a clear message rather than being mangled
    into ``^>``. ``#`` inside single-quoted literals or double-quoted
    identifiers is untouched."""
    out = sql
    pos = 0
    while True:
        i = out.find("#", pos)
        if i < 0:
            return out
        if _in_string(out, i) or _in_dquoted(out, i):
            pos = i + 1
            continue
        if i + 1 < len(out) and out[i + 1] in ">-":
            op = "#>>" if out[i + 1:i + 3] == ">>" else out[i:i + 2]
            raise NotImplementedError(
                f"pg JSON path operator {op} is not supported; use "
                "json_extract()/the ->/->> operators instead"
            )
        out = out[:i] + "^" + out[i + 1:]
        pos = i + 1


# --------------------------------------------------------- regex operators

_REGEX_OP_RE = re.compile(r"(!~\*|!~|~\*|~)")


def _rewrite_regex_ops(sql: str) -> str:
    """``a ~ 'p'`` → anchored RLIKE; ``~*`` adds (?i); ``!~`` negates.

    Anchoring note: in the reference these operators execute in DuckDB,
    where ``~`` is regexp_full_match (anchored) — NOT pg's partial
    match (pgserver passthrough means DuckDB semantics win). We match
    the reference: the pattern is wrapped as ``^(?:p)$``.
    """
    out = sql
    # LIKE-operator aliases FIRST: `~~` = LIKE, `~~*` = ILIKE (the
    # regex scanner below would otherwise read `!~~` as `!~` + `~`)
    def _like_ops(txt: str) -> str:
        res = []
        i2 = 0
        for m2 in re.finditer(r"!?~~\*?", txt):
            if _in_string(txt, m2.start()):
                continue
            word = {"~~": " LIKE ", "!~~": " NOT LIKE ",
                    "~~*": " ILIKE ", "!~~*": " NOT ILIKE "}[m2.group(0)]
            res.append(txt[i2:m2.start()] + word)
            i2 = m2.end()
        res.append(txt[i2:])
        return "".join(res)

    if "~~" in out:
        out = _like_ops(out)
    guard = 0
    pos = 0
    while guard < 100:
        guard += 1
        m = _REGEX_OP_RE.search(out, pos)
        if not m:
            return out
        if _in_string(out, m.start()):
            pos = m.end()
            continue
        op = m.group(1)
        start = _operand_start(out, m.start())
        lhs = out[start:m.start()].strip()
        if not lhs:  # leading ~ (bitwise NOT) — leave untouched
            pos = m.end()
            continue
        # RHS: string literal or simple operand
        rest = out[m.end():]
        rm = re.match(r"\s*('(?:[^']|'')*')", rest)
        if rm:
            flags = "(?i)" if "*" in op else ""
            pat = f"'{flags}^(?:" + rm.group(1)[1:-1] + ")$'"
            rhs_end = m.end() + rm.end()
        else:
            # non-literal pattern: build the anchored pattern via concat
            rm2 = re.match(r"\s*[\w.$]+", rest)
            if not rm2:
                pos = m.end()
                continue
            flags = "(?i)" if "*" in op else ""
            pat = f"concat('{flags}^(?:', {rest[: rm2.end()].strip()}, ')$')"
            rhs_end = m.end() + rm2.end()
        neg = "NOT " if op.startswith("!") else ""
        out = f"{out[:start]}{neg}({lhs} RLIKE {pat}){out[rhs_end:]}"
        pos = 0
    return out


# ------------------------------------------------------------ DISTINCT ON

_DISTINCT_ON_RE = re.compile(r"\bSELECT\s+DISTINCT\s+ON\s*\(", re.I)


def _match_paren(s: str, open_idx: int) -> int:
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(" and not _in_string(s, i):
            depth += 1
        elif s[i] == ")" and not _in_string(s, i):
            depth -= 1
            if depth == 0:
                return i
    raise ValueError("unbalanced parens in DISTINCT ON")


def _top_level_find(s: str, pattern: re.Pattern, from_idx: int = 0) -> int:
    """Index of the last top-level (paren-depth-0) match, or -1."""
    depth = 0
    best = -1
    i = from_idx
    while i < len(s):
        c = s[i]
        if c == "'" :
            j = s.find("'", i + 1)
            i = (j if j != -1 else len(s)) + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = pattern.match(s, i)
            if m:
                best = i
        i += 1
    return best


_ORDER_BY_AT = re.compile(r"ORDER\s+BY\b", re.I)
_LIMIT_AT = re.compile(r"LIMIT\b", re.I)


def _rewrite_distinct_on(sql: str) -> str:
    """``SELECT DISTINCT ON (k) sel FROM body ORDER BY o [LIMIT n]`` →
    ROW_NUMBER()-per-key rewrite (keeps first row per key in ORDER BY
    order — pg semantics; DuckDB implements the same).

    At scale this is the right plan anyway: one shuffle on the
    partition keys, no global distinct.
    """
    m = _DISTINCT_ON_RE.search(sql)
    if not m:
        return sql
    open_idx = sql.index("(", m.start())
    close_idx = _match_paren(sql, open_idx)
    keys = sql[open_idx + 1 : close_idx].strip()
    rest = sql[close_idx + 1 :]

    from_at = _top_level_find(rest, re.compile(r"FROM\b", re.I))
    if from_at == -1:
        return sql
    sel = rest[:from_at].strip()
    tail = rest[from_at:]

    ob_at = _top_level_find(tail, _ORDER_BY_AT)
    lim_at = _top_level_find(tail, _LIMIT_AT)
    limit_clause = ""
    if lim_at != -1:
        limit_clause = " " + tail[lim_at:].strip()
        tail = tail[:lim_at]
    if ob_at != -1:
        order_by = tail[ob_at:].strip()[len("ORDER BY"):].strip()
        body = tail[:ob_at].strip()
    else:
        order_by = keys
        body = tail.strip()

    prefix = sql[: m.start()]
    sel_out = "* EXCEPT(__don_rn)" if sel == "*" else sel
    inner = (
        f"SELECT *, ROW_NUMBER() OVER (PARTITION BY {keys} "
        f"ORDER BY {order_by}) AS __don_rn {body}"
    )
    outer_ob = f" ORDER BY {order_by}" if ob_at != -1 else ""
    return (
        f"{prefix}SELECT {sel_out} FROM ({inner}) __don "
        f"WHERE __don_rn = 1{outer_ob}{limit_clause}"
    )


# --------------------------------------------------------------- QUALIFY

_QUALIFY_AT = re.compile(r"QUALIFY\b", re.I)
_SELECT_HEAD_RE = re.compile(r"\bSELECT\b", re.I)


def _rewrite_qualify(sql: str) -> str:
    """``SELECT sel FROM … QUALIFY pred [ORDER BY …] [LIMIT n]`` →
    window-predicate rewrite (DuckDB/Snowflake QUALIFY; Spark has no
    such clause). The predicate is computed as a boolean column in
    the SELECT list — windows are legal there — and filtered one
    level up:

        SELECT * EXCEPT(__q) FROM (
            SELECT sel, (pred) AS __q FROM …
        ) WHERE __q [ORDER BY …] [LIMIT n]

    Same plan Catalyst builds for a ranked-window filter: the rank
    predicate stays adjacent to the Window node, so WindowGroupLimit
    pushdown still applies for row_number()-style predicates.
    """
    q_at = _top_level_find(sql, _QUALIFY_AT)
    if q_at == -1:
        return sql
    head = sql[:q_at].rstrip()
    tail = sql[q_at + len("QUALIFY"):]

    ob_at = _top_level_find(tail, _ORDER_BY_AT)
    lim_at = _top_level_find(tail, _LIMIT_AT)
    cut = min(x for x in (ob_at, lim_at, len(tail)) if x != -1)
    pred = tail[:cut].strip()
    suffix = tail[cut:].strip()
    suffix = " " + suffix if suffix else ""

    m = _SELECT_HEAD_RE.search(head)
    if m is None:
        return sql
    sel_start = m.end()
    from_at = _top_level_find(head[sel_start:], re.compile(r"FROM\b", re.I))
    if from_at == -1:
        return sql
    sel_end = sel_start + from_at
    inner = (
        head[:sel_end].rstrip()
        + f", ({pred}) AS __q "
        + head[sel_end:]
    )
    return f"SELECT * EXCEPT(__q) FROM ({inner}) __qual WHERE __q{suffix}"


# ------------------------------------------------------------- functions

# pg to_char tokens → Java datetime pattern (common subset)
_TO_CHAR_TOKENS = [
    ("YYYY", "yyyy"), ("YY", "yy"), ("MM", "MM"), ("DD", "dd"),
    ("HH24", "HH"), ("HH12", "hh"), ("MI", "mm"), ("SS", "ss"),
    ("MS", "SSS"), ("US", "SSSSSS"), ("Month", "MMMM"), ("Mon", "MMM"),
    ("Day", "EEEE"), ("Dy", "EEE"), ("AM", "a"), ("PM", "a"),
]


def pg_datetime_format(fmt: str) -> str:
    out = fmt
    for pg, java in _TO_CHAR_TOKENS:
        out = out.replace(pg, java)
    return out


_STRING_AGG_RE = re.compile(
    r"\bstring_agg\s*\(\s*(.+?)\s*,\s*('(?:[^']|'')*')"
    r"(?:\s+ORDER\s+BY\s+(.+?))?\s*\)",
    re.I,
)

_GEN_SERIES_FROM_RE = re.compile(
    r"\bFROM\s+generate_series\s*\(\s*([^()]+?)\s*\)"
    r"(?:\s+(?:AS\s+)?([a-zA-Z_]\w*)\s*(?:\(\s*([a-zA-Z_]\w*)\s*\))?)?",
    re.I,
)

_ARRAY_AGG_RE = re.compile(
    r"\barray_agg\s*\(\s*(.+?)\s+ORDER\s+BY\s+(.+?)(\s+DESC|\s+ASC)?\s*\)",
    re.I,
)

_JSON_OBJECT_AGG_RE = re.compile(
    r"\bjsonb?_object_agg\s*\(\s*([^(),]+?)\s*,\s*([^(),]+?)\s*\)",
    re.I,
)


def _rewrite_functions(sql: str) -> str:
    out = sql
    # regexp_split_to_array(s, pat) → split(s, pat) (pg drops a
    # trailing empty field only under the 'trim' flag variants, which
    # are not accepted here; 2-arg semantics line up with Spark)
    out = re.sub(
        r"\bregexp_split_to_array\s*\(", "split(", out, flags=re.I
    )
    # pg_typeof(e) → typeof(e) (Spark type names: 'int' not 'integer' —
    # close enough for the BI handshake probes that call it)
    out = re.sub(r"\bpg_typeof\s*\(", "typeof(", out, flags=re.I)

    # to_date/to_timestamp with a pg format literal → Java pattern
    def todt(m: re.Match) -> str:
        fn, e, fmt = m.group(1).lower(), m.group(2), m.group(3)
        return f"{fn}({e}, '{pg_datetime_format(fmt)}')"

    out = re.sub(
        r"\b(to_date|to_timestamp)\s*\(\s*((?:[^(),]|\([^()]*\))+?)"
        r"\s*,\s*'([^']*)'\s*\)",
        todt, out, flags=re.I,
    )

    # extract(dow/isodow): pg numbering (dow 0=Sun, isodow 1=Mon..7)
    out = re.sub(
        r"\bextract\s*\(\s*dow\s+from\s+((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"(dayofweek(\1) - 1)", out, flags=re.I,
    )
    out = re.sub(
        r"\bextract\s*\(\s*isodow\s+from\s+"
        r"((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"(((dayofweek(\1) + 5) % 7) + 1)", out, flags=re.I,
    )
    out = re.sub(
        r"\bdate_part\s*\(\s*'(dow|isodow)'\s*,\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*\)",
        lambda m: (f"(dayofweek({m.group(2)}) - 1)"
                   if m.group(1).lower() == "dow"
                   else f"(((dayofweek({m.group(2)}) + 5) % 7) + 1)"),
        out, flags=re.I,
    )
    # pg-only extract fields Spark's EXTRACT doesn't know
    _EXTRA_FIELDS = {
        "isoyear": "extract(YEAROFWEEK FROM {x})",
        "century": "CAST(ceil(year({x}) / 100.0) AS BIGINT)",
        "millennium": "CAST(ceil(year({x}) / 1000.0) AS BIGINT)",
        "decade": "CAST(floor(year({x}) / 10) AS BIGINT)",
        # within-the-minute totals, pg's definition
        "milliseconds": ("(CAST(date_format({x}, 'ss') AS BIGINT) "
                         "* 1000 + CAST(date_format({x}, 'SSS') "
                         "AS BIGINT))"),
        "microseconds": ("(CAST(date_format({x}, 'ss') AS BIGINT) "
                         "* 1000000 + CAST(date_format({x}, "
                         "'SSSSSS') AS BIGINT))"),
    }
    for fld, tpl in _EXTRA_FIELDS.items():
        out = re.sub(
            r"\bextract\s*\(\s*" + fld + r"\s+from\s+"
            r"((?:[^(),]|\([^()]*\))+?)\s*\)",
            lambda m, t=tpl: t.format(x=m.group(1)),
            out, flags=re.I,
        )
        out = re.sub(
            r"\bdate_part\s*\(\s*'" + fld + r"'\s*,\s*"
            r"((?:[^(),]|\([^()]*\))+?)\s*\)",
            lambda m, t=tpl: t.format(x=m.group(1)),
            out, flags=re.I,
        )

    # timestamp flavors: one snapshot clock here
    out = re.sub(
        r"\b(?:clock|statement|transaction)_timestamp\s*\(\s*\)",
        "now()", out, flags=re.I,
    )
    # precision arguments are a rendering hint — drop them
    out = re.sub(r"\blocaltimestamp\s*\(\s*\d+\s*\)", "localtimestamp()",
                 out, flags=re.I)
    out = re.sub(r"\blocaltimestamp\b(?!\s*\()", "localtimestamp()",
                 out, flags=re.I)
    out = re.sub(r"\blocaltime\b(?!stamp)(?:\s*\(\s*\d*\s*\))?",
                 "date_format(now(), 'HH:mm:ss')", out, flags=re.I)
    out = re.sub(r"\bcurrent_time\b(?!stamp)(?:\s*\(\s*\d*\s*\))?",
                 "date_format(now(), 'HH:mm:ssxxx')", out, flags=re.I)
    # timeofday(): pg's legacy C-strftime clock string
    out = re.sub(
        r"\btimeofday\s*\(\s*\)",
        "date_format(now(), 'EEE MMM dd HH:mm:ss.SSSSSS yyyy zzz')",
        out, flags=re.I,
    )

    # num_nonnulls/num_nulls (variadic)
    out = _rewrite_wrapped_call(
        out, "num_nonnulls", "size(array_compact(array(", ")))"
    )
    out = _rewrite_wrapped_call(
        out, "num_nulls",
        "size(filter(array(", "), __x -> __x IS NULL))",
    )

    # div(a,b) integer division; 1-arg numeric trunc (toward zero)
    out = re.sub(
        r"\bdiv\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"((\1) div (\2))", out, flags=re.I,
    )
    # 2-arg numeric trunc(x, n): toward zero at n decimal places
    # (Spark's 2-arg trunc is the DATE one — a silent resolver trap)
    out = re.sub(
        r"\btrunc\s*\(\s*((?:[^(),']|\([^()]*\))+?)\s*,\s*"
        r"((?:[^(),']|\([^()]*\))+?)\s*\)",
        r"((CASE WHEN (\1) >= 0 THEN floor((\1) * pow(10, \2)) "
        r"ELSE ceil((\1) * pow(10, \2)) END) / pow(10, \2))",
        out, flags=re.I,
    )
    out = re.sub(
        r"\btrunc\s*\(\s*((?:[^(),']|\([^()]*\))+?)\s*\)",
        r"(CASE WHEN (\1) >= 0 THEN floor(\1) ELSE ceil(\1) END)",
        out, flags=re.I,
    )
    # (s1, e1) OVERLAPS (s2, e2): pg normalizes each pair, then
    # s1 < e2 AND s2 < e1 (half-open interval overlap)
    _OVP = r"((?:[^(),']|'[^']*')+)"
    out = re.sub(
        r"(?i)\(\s*" + _OVP + r"\s*,\s*" + _OVP + r"\s*\)\s+OVERLAPS"
        r"\s+\(\s*" + _OVP + r"\s*,\s*" + _OVP + r"\s*\)",
        r"(least(\1, \2) < greatest(\3, \4) "
        r"AND least(\3, \4) < greatest(\1, \2))",
        out,
    )
    # BETWEEN SYMMETRIC: pg swaps the bounds when reversed
    out = re.sub(
        r"(?i)\bBETWEEN\s+SYMMETRIC\s+((?:[^()\s,]+|\([^()]*\))+)"
        r"\s+AND\s+((?:[^()\s,]+|\([^()]*\))+)",
        r"BETWEEN least(\1, \2) AND greatest(\1, \2)",
        out,
    )
    out = re.sub(r"\bstarts_with\s*\(", "startswith(", out, flags=re.I)

    # uuid generators (pgcrypto / uuid-ossp spellings) → Spark uuid()
    out = re.sub(r"\b(?:gen_random_uuid|uuid_generate_v4)\s*\(\s*\)",
                 "uuid()", out, flags=re.I)
    # pgcrypto sha family → sha2(x, bits); hex-string output matches
    # DuckDB's sha256 (pg renders bytea as \x-prefixed hex)
    for _bits in (224, 256, 384, 512):
        if re.search(rf"(?i)\bsha{_bits}\s*\(", out):
            out = _rewrite_wrapped_call(
                out, f"sha{_bits}", "sha2((", f"), {_bits})")
    # advisory locks: single-process snapshot engine — grants always
    # succeed (try-variants true, lock/unlock void → true)
    out = re.sub(
        r"\bpg_(?:try_)?advisory_(?:xact_)?(?:lock|unlock)"
        r"(?:_shared|_all)?\s*\(\s*[^)]*\)",
        "true", out, flags=re.I,
    )
    # ROW(a, b) constructor → struct (pg composites compare
    # field-wise, exactly Spark's struct semantics)
    out = re.sub(r"(?i)\bROW\s*\(", "struct(", out)
    # admin/introspection shims BI tools call (single-node answers)
    out = re.sub(r"\bpg_sleep\s*\(\s*[^)]*\)", "cast(0 as int)",
                 out, flags=re.I)
    out = re.sub(r"\bpg_get_userbyid\s*\(\s*[^)]*\)", "'root'",
                 out, flags=re.I)
    out = re.sub(r"\bobj_description\s*\(\s*[^)]*\)",
                 "CAST(NULL AS STRING)", out, flags=re.I)
    out = re.sub(r"\btxid_current\s*\(\s*\)", "CAST(0 AS BIGINT)",
                 out, flags=re.I)
    out = re.sub(r"\bpg_is_in_recovery\s*\(\s*\)", "false",
                 out, flags=re.I)
    out = re.sub(r"\bpg_postmaster_start_time\s*\(\s*\)", "now()",
                 out, flags=re.I)
    out = re.sub(r"\binet_(?:client|server)_addr\s*\(\s*\)",
                 "'127.0.0.1'", out, flags=re.I)
    out = re.sub(
        r"\bhas_(?:table|schema|database|column)_privilege"
        r"\s*\(\s*[^)]*\)",
        "true", out, flags=re.I,
    )
    out = re.sub(
        r"\bpg_size_pretty\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*\)",
        lambda m: (
            f"CASE WHEN abs({m.group(1)}) >= 1099511627776 THEN "
            f"concat(round({m.group(1)} / 1099511627776, 0), ' TB') "
            f"WHEN abs({m.group(1)}) >= 1073741824 THEN "
            f"concat(round({m.group(1)} / 1073741824, 0), ' GB') "
            f"WHEN abs({m.group(1)}) >= 1048576 THEN "
            f"concat(round({m.group(1)} / 1048576, 0), ' MB') "
            f"WHEN abs({m.group(1)}) >= 10240 THEN "
            f"concat(round({m.group(1)} / 1024, 0), ' kB') "
            f"ELSE concat(cast({m.group(1)} as string), ' bytes') END"
        ),
        out, flags=re.I,
    )

    # array_length(a, 1) → size(a) (Spark arrays are 1-dimensional;
    # any other dimension is NULL in pg for a 1-D array)
    out = re.sub(
        r"\barray_length\s*\(\s*(.+?)\s*,\s*1\s*\)", r"size(\1)",
        out, flags=re.I,
    )

    # 4-arg regexp_replace(s, p, r, 'flags'): Spark replaces ALL
    # matches by default (pg's 'g'); 'i' folds to an inline flag;
    # pg's first-match-only default (no 'g') has no Spark equivalent
    # and is left to fail visibly rather than silently replace all
    def rr4(m: re.Match) -> str:
        s_, p, r_, fl = m.groups()
        if "g" not in fl:
            return m.group(0)
        pre = "(?i)" if "i" in fl else ""
        pm = re.fullmatch(r"'((?:[^']|'')*)'", p.strip())
        if pm:
            return f"regexp_replace({s_}, '{pre}{pm.group(1)}', {r_})"
        if pre:
            return (f"regexp_replace({s_}, concat('{pre}', {p}), {r_})")
        return f"regexp_replace({s_}, {p}, {r_})"

    out = re.sub(
        r"\bregexp_replace\s*\(\s*([^(),]+?)\s*,\s*('(?:[^']|'')*'|[^(),]+?)"
        r"\s*,\s*('(?:[^']|'')*'|[^(),]+?)\s*,\s*'([gimnpqswx]*)'\s*\)",
        rr4, out, flags=re.I,
    )

    # DuckDB string_split/str_split are the same literal-delimiter split
    out = re.sub(r"\bstr(?:ing)?_split\s*\(", "string_to_array(", out,
                 flags=re.I)
    # string_to_array(s, 'd'[, nullstr]) → split on the regex-escaped
    # LITERAL delimiter (pg delimiters are literal, Spark split takes a
    # regex); 3-arg maps nullstr elements to NULL. Non-literal
    # delimiters pass through to split() as regexes.
    def sta(m: re.Match) -> str:
        s_, d, nullstr = m.group(1), m.group(2), m.group(3)
        esc = re.escape(d).replace("\\", "\\\\").replace("'", "''")
        base = f"split({s_}, '{esc}')"
        if nullstr is not None:
            base = f"transform({base}, __x -> nullif(__x, {nullstr}))"
        return base

    out = re.sub(
        r"\bstring_to_array\s*\(\s*([^(),]+?)\s*,\s*'([^']*)'"
        r"(?:\s*,\s*('(?:[^']|'')*'))?\s*\)",
        sta, out, flags=re.I,
    )
    out = re.sub(r"\bstring_to_array\s*\(", "split(", out, flags=re.I)

    # array helpers: array_to_string ≡ array_join (same 2/3-arg
    # signature incl. null_string), array_cat ≡ concat,
    # array_prepend swaps (pg: elem first; Spark: array first)
    out = re.sub(r"\barray_to_string\s*\(", "array_join(", out,
                 flags=re.I)
    out = re.sub(r"\barray_cat\s*\(", "concat(", out, flags=re.I)
    # array_positions: every 1-based index of a match (null-safe =)
    out = re.sub(
        r"\barray_positions\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"((?:[^(),']|'(?:[^']|'')*'|\([^()]*\))+?)\s*\)",
        r"filter(transform(\1, (__v, __i) -> "
        r"IF(__v <=> \2, __i + 1, CAST(NULL AS INT))), "
        r"__p -> __p IS NOT NULL)",
        out, flags=re.I,
    )
    # array_fill(value, ARRAY[n]) — 1-D form only
    out = re.sub(
        r"\barray_fill\s*\(\s*((?:[^(),']|'(?:[^']|'')*'|\([^()]*\))+?)"
        r"\s*,\s*array\s*\(\s*(\d+)\s*\)\s*\)",
        r"array_repeat(\1, \2)", out, flags=re.I,
    )
    # trim_array(a, n): drop the last n elements
    out = re.sub(
        r"\btrim_array\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"slice(\1, 1, greatest(size(\1) - (\2), 0))",
        out, flags=re.I,
    )
    # array_ndims: arrays here are 1-D storable columns; literal
    # nested ARRAY[ARRAY[..]] counts its textual nesting depth
    while True:
        nm = re.search(r"\barray_ndims\s*\(", out, re.I)
        if not nm or _in_string(out, nm.start()):
            break
        close = _match_bracket(out, nm.end() - 1, "(", ")")
        if close < 0:
            break
        arg = out[nm.end():close].strip().lower()
        depth = 0
        while arg.startswith("array("):
            depth += 1
            arg = arg[6:].lstrip()
        out = out[:nm.start()] + str(max(depth, 1)) + out[close + 1:]
    out = re.sub(
        r"\barray_prepend\s*\(\s*([^(),]+?)\s*,\s*((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"array_prepend(\2, \1)", out, flags=re.I,
    )

    # pg format() %I (identifier) / %L (literal) specifiers: rewrite
    # each to %s and wrap the matching argument in the quote_ident /
    # quote_literal expansion (%L renders SQL NULL as the unquoted
    # keyword, pg's rule); plain %s/%d calls fall through to the
    # format_string rename below
    pos = 0
    while True:
        m = re.search(r"\bformat\s*\(", out[pos:], re.I)
        if not m:
            break
        start, op = pos + m.start(), pos + m.end() - 1
        if _in_string(out, start):
            pos = op + 1
            continue
        close = _match_bracket(out, op, "(", ")")
        if close < 0:
            break
        from myduckserver_spark.statements import split_top_level

        parts = split_top_level(out[op + 1:close], ",")
        mfmt = re.fullmatch(r"'((?:[^']|'')*)'",
                            parts[0].strip() if parts else "")
        if not mfmt or not re.search(r"%[IL]", mfmt.group(1)):
            pos = close + 1
            continue
        fmt, args = mfmt.group(1), [p.strip() for p in parts[1:]]
        newfmt: list[str] = []
        newargs: list[str] = []
        ai, i2, ok = 0, 0, True
        while i2 < len(fmt):
            c = fmt[i2]
            if c == "%" and i2 + 1 < len(fmt):
                spec = fmt[i2 + 1]
                if spec == "%":
                    newfmt.append("%%")
                elif ai >= len(args):
                    ok = False
                    break
                elif spec == "I":
                    newargs.append(
                        'concat(\'"\', replace(cast(' + args[ai]
                        + ' as string), \'"\', \'""\'), \'"\')')
                    newfmt.append("%s")
                    ai += 1
                elif spec == "L":
                    newargs.append(
                        f"(CASE WHEN ({args[ai]}) IS NULL THEN 'NULL' "
                        f"ELSE concat('''', replace(cast({args[ai]} "
                        f"as string), '''', ''''''), '''') END)")
                    newfmt.append("%s")
                    ai += 1
                else:
                    newargs.append(args[ai])
                    newfmt.append("%" + spec)
                    ai += 1
                i2 += 2
            else:
                newfmt.append(c)
                i2 += 1
        if not ok:
            pos = close + 1
            continue
        repl = ("format_string('" + "".join(newfmt) + "'"
                + "".join(", " + a_ for a_ in newargs) + ")")
        out = out[:start] + repl + out[close + 1:]
        pos = start + len(repl)

    # format('%s', ...) ≡ format_string (same %-conversions for the
    # common %s/%d cases)
    out = re.sub(r"\bformat\s*\(", "format_string(", out, flags=re.I)

    # quote_literal / quote_ident: always-quote forms (pg quotes
    # conditionally, but the always-quoted spelling is equally valid)
    out = re.sub(
        r"\bquote_nullable\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"coalesce(concat('''', replace(cast(\1 as string), "
        r"'''', ''''''), ''''), 'NULL')",
        out, flags=re.I,
    )
    out = re.sub(
        r"\bquote_literal\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"concat('''', replace(cast(\1 as string), '''', ''''''), '''')",
        out, flags=re.I,
    )
    # parse_ident('"A".b') → text[] of parts (dots inside quoted
    # identifiers are not split-safe in this textual form)
    out = re.sub(
        r"\bparse_ident\s*\(\s*((?:[^(),]|'(?:[^']|'')*')+?)\s*\)",
        r"""transform(split(\1, '[.]'), """
        r"""__p -> regexp_replace(trim(__p), '^"|"$', ''))""",
        out, flags=re.I,
    )
    out = re.sub(
        r"\bquote_ident\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"""concat('"', replace(\1, '"', '""'), '"')""",
        out, flags=re.I,
    )

    # encode/decode for the hex and base64 codecs
    def enc(m: re.Match) -> str:
        e, codec = m.group(1), m.group(2).lower()
        if codec == "hex":
            return f"lower(hex({e}))"
        if codec == "base64":
            return f"base64({e})"
        return m.group(0)

    out = re.sub(
        r"\bencode\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*'(\w+)'\s*\)",
        enc, out, flags=re.I,
    )

    def dec(m: re.Match) -> str:
        e, codec = m.group(1), m.group(2).lower()
        if codec == "hex":
            return f"unhex({e})"
        if codec == "base64":
            return f"unbase64({e})"
        return m.group(0)

    out = re.sub(
        r"\bdecode\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*'(\w+)'\s*\)",
        dec, out, flags=re.I,
    )

    # substring(s from 'regex'): pg's regex form — whole match, or
    # first group when the pattern has one (the FROM n FOR m numeric
    # form is Spark-native and left alone)
    def sub_rx(m: re.Match) -> str:
        s_, pat = m.group(1), m.group(2)
        idx = 1 if "(" in pat else 0
        return f"regexp_extract({s_}, '{pat}', {idx})"

    out = re.sub(
        r"\bsubstring\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s+from\s+"
        r"'((?:[^']|'')*)'\s*\)",
        sub_rx, out, flags=re.I,
    )

    # age(a[, b]) → timestamp subtraction (day-time interval; pg
    # normalizes to years/months — documented divergence)
    out = re.sub(
        r"\bage\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"(\1 - \2)", out, flags=re.I,
    )
    out = re.sub(
        r"\bage\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"(current_timestamp() - \1)", out, flags=re.I,
    )

    # jsonb_* length + set-returning element iteration
    out = re.sub(r"\bjsonb?_array_length\s*\(", "json_array_length(",
                 out, flags=re.I)
    out = re.sub(r"\bjsonb?_typeof\s*\(", "json_pg_typeof(",
                 out, flags=re.I)
    # jsonb_object(keys[], values[]) — pg casts values to text
    out = re.sub(
        r"\bjsonb?_object\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"to_json(map_from_arrays(\1, \2))", out, flags=re.I,
    )
    out = re.sub(
        r"\bjsonb?_exists\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"array_contains(json_object_keys(\1), \2)", out, flags=re.I,
    )
    # SQL/JSON path functions (subset evaluator in json_udfs.py);
    # jsonb_path_query proper is set-returning — point at the
    # supported spellings instead of failing opaquely
    if re.search(r"(?i)\bjsonb?_path_query\s*\(", out):
        raise NotImplementedError(
            "jsonb_path_query() is set-returning — use "
            "jsonb_path_query_array() / jsonb_path_query_first()"
        )
    out = re.sub(r"\bjsonb?_path_exists\s*\(",
                 "1 = jsonb_path_exists1(", out, flags=re.I)
    out = re.sub(r"\bjsonb?_path_match\s*\(",
                 "1 = jsonb_path_match1(", out, flags=re.I)
    out = re.sub(r"\bjsonb?_path_query_array\s*\(",
                 "jsonb_path_query_array1(", out, flags=re.I)
    out = re.sub(r"\bjsonb?_path_query_first\s*\(",
                 "jsonb_path_query_first1(", out, flags=re.I)
    # encoding conversions — pg charset spellings → Java's
    _ENC = {"utf8": "UTF-8", "utf-8": "UTF-8", "unicode": "UTF-8",
            "latin1": "ISO-8859-1", "iso88591": "ISO-8859-1",
            "sql_ascii": "US-ASCII", "win1252": "ISO-8859-1"}

    def _cenc(m: re.Match) -> str:
        fn = ("decode" if m.group(1).lower() == "convert_from"
              else "encode")
        enc = _ENC.get(m.group(3).lower(), m.group(3))
        return f"{fn}({m.group(2)}, '{enc}')"

    out = re.sub(
        r"(?i)\b(convert_from|convert_to)\s*\(\s*"
        r"((?:[^(),']|'(?:[^']|'')*'|\([^()]*\))+?)\s*,\s*"
        r"'([^']+)'\s*\)",
        _cenc, out,
    )
    # numeric scale introspection over the value's string form
    out = re.sub(
        r"\bscale\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"length(regexp_extract(cast(\1 as string), '[.](\\\\d+)$', 1))",
        out, flags=re.I,
    )
    out = re.sub(
        r"\bmin_scale\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"length(regexp_replace(regexp_extract(cast(\1 as string), "
        r"'[.](\\\\d+)$', 1), '0+$', ''))",
        out, flags=re.I,
    )
    out = re.sub(
        r"\btrim_scale\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"cast(\1 as double)", out, flags=re.I,
    )
    out = re.sub(r"\bsetseed\s*\(\s*[^)]*\)", "CAST(NULL AS DOUBLE)",
                 out, flags=re.I)
    # make_time → the engine's TIME string convention (sec_to_time)
    out = re.sub(
        r"\bmake_time\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*\)",
        lambda m: (
            f"concat(lpad(cast(({m.group(1)}) as string), 2, '0'), ':',"
            f" lpad(cast(({m.group(2)}) as string), 2, '0'), ':', "
            f"CASE WHEN ({m.group(3)}) = floor({m.group(3)}) THEN "
            f"lpad(cast(cast(({m.group(3)}) as int) as string), 2, '0')"
            f" ELSE lpad(cast(({m.group(3)}) as string), 4, '0') END)"
        ),
        out, flags=re.I,
    )
    out = _rewrite_wrapped_call(
        out, "jsonb?_array_elements_text",
        "explode(json_arr_elems_text(", "))",
    )
    out = _rewrite_wrapped_call(
        out, "jsonb?_array_elements", "explode(json_arr_elems(", "))",
    )

    # json[b]_to_record / json[b]_to_recordset with the mandatory
    # AS t(col type, ...) definition list → from_json over the
    # equivalent Spark struct schema (recordset explodes the array)
    if re.search(r"(?i)\bjsonb?_to_record(?:set)?\s*\(", out):
        _PGT = {
            "int": "int", "integer": "int", "int4": "int",
            "smallint": "smallint", "int2": "smallint",
            "bigint": "bigint", "int8": "bigint",
            "text": "string", "varchar": "string", "char": "string",
            "bpchar": "string", "name": "string", "json": "string",
            "jsonb": "string", "uuid": "string",
            "boolean": "boolean", "bool": "boolean",
            "real": "float", "float4": "float",
            "float8": "double", "double precision": "double",
            "numeric": "double", "decimal": "double",
            "date": "date", "timestamp": "timestamp",
            "timestamptz": "timestamp",
        }

        def _coldefs_schema(defs: str) -> tuple[str, str]:
            from myduckserver_spark.statements import split_top_level
            fields, names = [], []
            for cd in split_top_level(defs, ","):
                dm = re.match(
                    r'\s*("[^"]+"|`[^`]+`|\w+)\s+([\w ]+?)'
                    r"(?:\s*\(\s*[\d,\s]*\s*\))?\s*(?:\[\s*\])?\s*$",
                    cd,
                )
                if not dm:
                    raise ValueError(
                        f"cannot parse record column definition {cd!r}"
                    )
                nm = dm.group(1).strip('"`')
                ty = _PGT.get(dm.group(2).strip().lower(), "string")
                fields.append(f"{nm} {ty}")
                names.append(nm)
            return ", ".join(fields), ", ".join(names)

        def _jtr_gen(fn: str, args: str, defs: str) -> str:
            schema, _ = _coldefs_schema(defs)
            sch = ("array<struct<"
                   + schema.replace(" ", ":").replace(",:", ", ")
                   + ">>")
            if fn.lower().endswith("set"):
                return f"inline(from_json({args}, '{sch}'))"
            return (f"inline(from_json(concat('[', {args}, ']'), "
                    f"'{sch}'))")

        def jtr_comma(m: re.Match) -> str:
            fn, args, tbl, defs = m.groups()
            return (f" LATERAL VIEW {_jtr_gen(fn, args, defs)} {tbl}")

        _JTR_TAIL = (r"(jsonb?_to_record(?:set)?)\s*"
                     r"\(((?:[^()]|\([^()]*\))*)\)\s+"
                     r"(?:AS\s+)?(\w+)\s*\(([^()]*)\)")
        out = re.sub(r"(?i),\s*" + _JTR_TAIL, jtr_comma, out)

        def jtr_from(m: re.Match) -> str:
            kw, fn, args, tbl, defs = m.groups()
            return (f"{kw} (SELECT {_jtr_gen(fn, args, defs)}) {tbl}")

        out = re.sub(r"(?i)\b(FROM|JOIN)\s+" + _JTR_TAIL, jtr_from,
                     out)

    # set-returning json_each / jsonb_each[_text] / json_object_keys
    # in FROM position — pg's lateral JSON-object iteration.  Spark
    # spellings: inline() over an array<struct<key,value>> UDF
    # (columns named key/value, exactly pg's), explode() for the key
    # list.  Both the comma (implicit lateral) and the standalone
    # FROM forms are covered.
    if re.search(r"(?i)\bjsonb?_(?:each(?:_text)?|object_keys)\s*\(",
                 out):
        _ARGS = r"((?:[^()]|\([^()]*\))*)"

        def _entries_fn(name: str) -> str:
            return ("json_obj_entries_text"
                    if name.lower().endswith("_text")
                    else "json_obj_entries")

        def je_comma(m: re.Match) -> str:
            fn, args = _entries_fn(m.group(1)), m.group(2)
            tbl = m.group(3) or "__je"
            k, v = m.group(4) or "key", m.group(5) or "value"
            return (f" LATERAL VIEW inline({fn}({args})) "
                    f"{tbl} AS {k}, {v}")

        out = re.sub(
            r"(?i),\s*(jsonb?_each(?:_text)?)\s*\(" + _ARGS + r"\)"
            r"(?:\s+(?:AS\s+)?" + _NOT_CLAUSE_KW + r"(\w+)"
            r"(?:\s*\(\s*(\w+)\s*,\s*(\w+)\s*\))?)?",
            je_comma, out,
        )

        def je_from(m: re.Match) -> str:
            kw, fn = m.group(1), _entries_fn(m.group(2))
            args, tbl = m.group(3), m.group(4) or "__je"
            k, v = m.group(5), m.group(6)
            cols = f" AS ({k}, {v})" if k else ""
            return (f"{kw} (SELECT inline({fn}({args})){cols}) {tbl}")

        out = re.sub(
            r"(?i)\b(FROM|JOIN)\s+(jsonb?_each(?:_text)?)\s*\("
            + _ARGS + r"\)"
            r"(?:\s+(?:AS\s+)?" + _NOT_CLAUSE_KW + r"(\w+)"
            r"(?:\s*\(\s*(\w+)\s*,\s*(\w+)\s*\))?)?",
            je_from, out,
        )

        def jk_comma(m: re.Match) -> str:
            args = m.group(1)
            # pg: a single-column SRF's alias names the COLUMN
            col = m.group(3) or m.group(2) or "json_object_keys"
            return (f" LATERAL VIEW explode(json_obj_keys({args})) "
                    f"__jk_{col} AS {col}")

        out = re.sub(
            r"(?i),\s*jsonb?_object_keys\s*\(" + _ARGS + r"\)"
            r"(?:\s+(?:AS\s+)?" + _NOT_CLAUSE_KW + r"(\w+)"
            r"(?:\s*\(\s*(\w+)\s*\))?)?",
            jk_comma, out,
        )

        def jk_from(m: re.Match) -> str:
            kw, args = m.group(1), m.group(2)
            col = m.group(4) or m.group(3) or "json_object_keys"
            tbl = m.group(3) or f"__jk_{col}"
            return (f"{kw} (SELECT explode(json_obj_keys({args})) "
                    f"AS {col}) {tbl}")

        out = re.sub(
            r"(?i)\b(FROM|JOIN)\s+jsonb?_object_keys\s*\(" + _ARGS
            + r"\)"
            r"(?:\s+(?:AS\s+)?" + _NOT_CLAUSE_KW + r"(\w+)"
            r"(?:\s*\(\s*(\w+)\s*\))?)?",
            jk_from, out,
        )

    # ARRAY(SELECT ...) subquery constructor → scalar collect_list
    while True:
        m = re.search(r"\bARRAY\s*\(\s*(?=SELECT\b)", out, re.I)
        if not m or _in_string(out, m.start()):
            break
        op2 = out.index("(", m.start())
        close2 = _match_bracket(out, op2, "(", ")")
        if close2 < 0:
            break
        sub = out[op2 + 1:close2]
        out = (out[:m.start()]
               + f"(SELECT collect_list(__c) FROM ({sub}) "
               + "__arr_src(__c))" + out[close2 + 1:])

    # expr SIMILAR TO 'pat': SQL-regex dialect (% any, _ one char,
    # full-string anchored; | ( ) [] quantifiers pass through)
    def sim(m: re.Match) -> str:
        neg, pat = m.group(1), m.group(2)
        rx = []
        for ch in pat:
            if ch == "%":
                rx.append(".*")
            elif ch == "_":
                rx.append(".")
            elif ch in ".^$\\":
                rx.append("\\" + ch)
            else:
                rx.append(ch)
        body = "".join(rx).replace("'", "''")
        pre = "NOT " if neg else ""
        return f" {pre}RLIKE '^(?:{body})$'"

    out = re.sub(
        r"\s+(NOT\s+)?SIMILAR\s+TO\s+'((?:[^']|'')*)'",
        sim, out, flags=re.I,
    )

    # DuckDB vector-similarity family (the SQL-first spelling of the
    # vector workflow — VECTOR_SEARCH's cosine SQL, operators/vindex)
    if re.search(r"(?i)\b(?:list|array)_(?:cosine_similarity|"
                 r"cosine_distance|distance|inner_product|"
                 r"negative_inner_product)\s*\(", out):
        _VA = r"((?:[^(),]|\([^()]*\))+?)"

        def _vdot(a: str, b: str) -> str:
            return (f"aggregate(zip_with({a}, {b}, "
                    f"(__zx, __zy) -> __zx * __zy), 0.0D, "
                    f"(__ac, __v) -> __ac + __v)")

        def _vnorm(a: str) -> str:
            return (f"sqrt(aggregate(transform({a}, "
                    f"__x -> __x * __x), 0.0D, "
                    f"(__ac, __v) -> __ac + __v))")

        def _vcos(m: re.Match) -> str:
            a, b = m.group(1), m.group(2)
            return (f"({_vdot(a, b)} / "
                    f"({_vnorm(a)} * {_vnorm(b)}))")

        out = re.sub(
            r"(?i)\b(?:list|array)_cosine_similarity\s*\(\s*"
            + _VA + r"\s*,\s*" + _VA + r"\s*\)", _vcos, out)
        out = re.sub(
            r"(?i)\b(?:list|array)_cosine_distance\s*\(\s*"
            + _VA + r"\s*,\s*" + _VA + r"\s*\)",
            lambda m: f"(1.0D - {_vcos(m)})", out)
        out = re.sub(
            r"(?i)\b(?:list|array)_distance\s*\(\s*"
            + _VA + r"\s*,\s*" + _VA + r"\s*\)",
            lambda m: (
                f"sqrt(aggregate(zip_with({m.group(1)}, {m.group(2)},"
                f" (__zx, __zy) -> (__zx - __zy) * (__zx - __zy)), "
                f"0.0D, (__ac, __v) -> __ac + __v))"), out)
        out = re.sub(
            r"(?i)\b(?:list|array)_negative_inner_product\s*\(\s*"
            + _VA + r"\s*,\s*" + _VA + r"\s*\)",
            lambda m: f"(-{_vdot(m.group(1), m.group(2))})", out)
        out = re.sub(
            r"(?i)\b(?:list|array)_inner_product\s*\(\s*"
            + _VA + r"\s*,\s*" + _VA + r"\s*\)",
            lambda m: _vdot(m.group(1), m.group(2)), out)

    # DuckDB list_*/date/regex dialect (the reference's pg door
    # exposes DuckDB SQL verbatim) — 1:1 Spark names
    for src, dst in (
        ("list_value", "array"), ("list_contains", "array_contains"),
        ("list_filter", "filter"), ("list_transform", "transform"),
        ("list_sort", "array_sort"), ("list_distinct", "array_distinct"),
        ("list_extract", "element_at"), ("list_concat", "concat"),
        ("list_append", "array_append"), ("list_position", "array_position"),
        ("list_min", "array_min"),
        ("list_max", "array_max"),
        ("list_reverse", "reverse"), ("list_zip", "arrays_zip"),
        ("list_has_any", "arrays_overlap"),
        ("string_split_regex", "split"),
        ("datetrunc", "date_trunc"),
        ("greatest_common_divisor", "gcd"),
        ("least_common_multiple", "lcm"),
    ):
        out = re.sub(rf"\b{src}\s*\(", dst + "(", out, flags=re.I)
    out = _rewrite_wrapped_call(
        out, "monthname", "date_format(", ", 'MMMM')")
    out = _rewrite_wrapped_call(
        out, "dayname", "date_format(", ", 'EEEE')")
    out = _rewrite_wrapped_call(
        out, "list_reverse_sort|array_reverse_sort",
        "reverse(array_sort(", "))",
    )
    out = _rewrite_wrapped_call(
        out, "list_unique", "size(array_distinct(", "))",
    )  # DuckDB list_unique COUNTS the distinct elements
    out = _rewrite_wrapped_call(out, "isinf", "(abs(", ") = double('Infinity'))")
    # even(x): round away from zero to the next even number
    _A1 = r"((?:'(?:[^']|'')*'|[^(),']|\([^()]*\))+?)"
    out = re.sub(
        r"(?i)\beven\s*\(\s*" + _A1 + r"\s*\)",
        r"(CASE WHEN (\1) >= 0 THEN (CASE WHEN ceil(\1) % 2 = 0 "
        r"THEN ceil(\1) ELSE ceil(\1) + 1 END) ELSE (CASE WHEN "
        r"floor(\1) % 2 = 0 THEN floor(\1) ELSE floor(\1) - 1 END) "
        r"END)", out,
    )
    # list_avg / array_slice / list_has_all need their argument twice
    out = re.sub(
        r"(?i)\blist_avg\s*\(\s*" + _A1 + r"\s*\)",
        r"(aggregate(\1, cast(0 as double), (__a, __x) -> __a + __x)"
        r" / size(\1))", out,
    )
    out = re.sub(
        r"(?i)\b(?:array_slice|list_slice)\s*\(\s*" + _A1
        + r"\s*,\s*" + _A1 + r"\s*,\s*" + _A1 + r"\s*\)",
        r"slice(\1, \2, (\3) - (\2) + 1)", out,
    )
    out = re.sub(
        r"(?i)\blist_has_all\s*\(\s*" + _A1 + r"\s*,\s*" + _A1
        + r"\s*\)",
        r"forall(\2, __k -> array_contains(\1, __k))", out,
    )
    # hamming / jaccard over character sequences (DuckDB semantics)
    out = re.sub(
        r"(?i)\bhamming\s*\(\s*" + _A1 + r"\s*,\s*" + _A1 + r"\s*\)",
        r"aggregate(zip_with(split(\1, ''), split(\2, ''), "
        r"(__x, __y) -> CASE WHEN __x <> __y THEN 1 ELSE 0 END), 0, "
        r"(__a, __v) -> __a + __v)", out,
    )
    out = re.sub(
        r"(?i)\bjaccard\s*\(\s*" + _A1 + r"\s*,\s*" + _A1 + r"\s*\)",
        r"(CAST(size(array_intersect(split(\1, ''), split(\2, ''))) "
        r"AS DOUBLE) / size(array_union(split(\1, ''), "
        r"split(\2, ''))))", out,
    )
    # struct_extract(s, 'name') → dotted field access
    out = re.sub(
        r"(?i)\bstruct_extract\s*\(\s*" + _A1 + r"\s*,\s*"
        r"'(\w+)'\s*\)",
        r"(\1).\2", out,
    )
    # list_reduce(a, (x, y) -> body): first element seeds the fold
    out = re.sub(
        r"(?i)\blist_reduce\s*\(\s*" + _A1 + r"\s*,\s*"
        r"\(\s*(\w+)\s*,\s*(\w+)\s*\)\s*->\s*([^()]+?)\s*\)",
        r"reduce(slice(\1, 2, size(\1) - 1), element_at(\1, 1), "
        r"(\2, \3) -> \4)", out,
    )

    def fbytes(m: re.Match) -> str:
        from myduckserver_spark.functions.mysql_compat import (
            _FN_HANDLERS,
        )

        return _FN_HANDLERS["FORMAT_BYTES"]([m.group(1)])

    out = re.sub(r"(?i)\bformat_bytes\s*\(\s*" + _A1 + r"\s*\)",
                 fbytes, out)
    out = _rewrite_wrapped_call(
        out, "list_sum",
        "aggregate(", ", cast(0 as double), (__a, __x) -> __a + __x)",
    )

    def lagg(m: re.Match) -> str:
        l, fn = m.group(1), m.group(2).lower()
        if fn in ("min", "max"):
            return f"array_{fn}({l})"
        if fn == "sum":
            return (f"aggregate({l}, cast(0 as double), "
                    "(__a, __x) -> __a + __x)")
        if fn == "avg":
            return (f"(aggregate({l}, cast(0 as double), "
                    f"(__a, __x) -> __a + __x) / size({l}))")
        if fn == "count":
            return f"size({l})"
        return m.group(0)

    out = re.sub(
        r"\blist_aggregate\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"'(\w+)'\s*\)",
        lagg, out, flags=re.I,
    )
    # struct_pack(x := 1, ...) → named_struct('x', 1, ...)
    while True:
        m = re.search(r"\bstruct_pack\s*\(", out, re.I)
        if not m or _in_string(out, m.start()):
            break
        close2 = _match_bracket(out, m.end() - 1, "(", ")")
        if close2 < 0:
            break
        from myduckserver_spark.statements import split_top_level

        kvs = []
        for part in split_top_level(out[m.end():close2], ","):
            pm = re.match(r"\s*(\w+)\s*:=\s*(.+)$", part, re.S)
            if pm is None:
                kvs = None
                break
            kvs.append(f"'{pm.group(1)}', {pm.group(2).strip()}")
        if kvs is None:
            break
        out = (out[:m.start()] + "named_struct(" + ", ".join(kvs)
               + ")" + out[close2 + 1:])
    # regexp: DuckDB regexp_matches is a PARTIAL-match boolean;
    # 2-arg regexp_extract defaults to group 0 (Spark defaults to 1)
    out = re.sub(
        r"\bregexp_matches\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"(\1 RLIKE \2)", out, flags=re.I,
    )
    out = re.sub(
        r"\bregexp_extract\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"('(?:[^']|'')*')\s*\)",
        r"regexp_extract(\1, \2, 0)", out, flags=re.I,
    )
    out = re.sub(
        r"\bregexp_extract_all\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"('(?:[^']|'')*')\s*\)",
        r"regexp_extract_all(\1, \2, 0)", out, flags=re.I,
    )
    # strftime/strptime: C-style % tokens — the MySQL format mapper
    # speaks exactly this dialect
    from myduckserver_spark.functions.mysql_compat import (
        mysql_fmt_sql,
    )

    out = re.sub(
        r"\bstrftime\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*'([^']*)'\s*\)",
        lambda m: (f"date_format({m.group(1)}, "
                   f"'{mysql_fmt_sql(m.group(2))}')"),
        out, flags=re.I,
    )
    out = re.sub(
        r"\bstrptime\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*'([^']*)'\s*\)",
        lambda m: (f"to_timestamp({m.group(1)}, "
                   f"'{mysql_fmt_sql(m.group(2), parsing=True)}')"),
        out, flags=re.I,
    )
    out = re.sub(r"\bepoch_ms\s*\(", "unix_millis(", out, flags=re.I)
    out = re.sub(r"\bepoch\s*\(", "unix_timestamp(", out, flags=re.I)
    out = re.sub(
        r"\bdate_diff\s*\(\s*'(\w+)'\s*,\s*((?:[^(),]|\([^()]*\))+?)"
        r"\s*,\s*((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"timestampdiff(\1, \2, \3)", out, flags=re.I,
    )
    out = re.sub(
        r"\bdate_add\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"(INTERVAL\s+[^(),]+?)\s*\)",
        r"(\1 + \2)", out, flags=re.I,
    )
    # FROM-position range(): a table source (DuckDB/Spark both allow
    # it in FROM, but with different arg semantics — normalize to an
    # exploded end-exclusive sequence)
    def frng(m: re.Match) -> str:
        kw, a, b, alias, col = (m.group(1), m.group(2), m.group(3),
                                m.group(4) or "range", m.group(5))
        lo, hi = ("0", f"({a}) - 1") if b is None else (a, f"({b}) - 1")
        c = col or alias
        return (f"{kw} (SELECT explode(sequence({lo}, {hi})) AS {c}) "
                f"{alias}")

    out = re.sub(
        r"(?i)\b(FROM|JOIN)\s+range\s*\(\s*([^(),]+?)"
        r"(?:\s*,\s*([^(),]+?))?\s*\)"
        r"(?:\s+(?:AS\s+)?" + _NOT_CLAUSE_KW + r"(\w+)"
        r"(?:\s*\((\w+)\))?)?",
        frng, out,
    )
    # select-position range(): DuckDB returns a list, end-exclusive
    out = re.sub(
        r"\brange\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"sequence(\1, (\2) - 1)", out, flags=re.I,
    )
    out = re.sub(
        r"\brange\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"sequence(0, (\1) - 1)", out, flags=re.I,
    )
    # to_hex(n) → lowercase hex (Spark's hex() is uppercase)
    out = _rewrite_wrapped_call(out, "to_hex", "lower(hex(", "))")
    # isfinite(date/ts): no infinity values exist here — non-NULL is
    # finite
    out = _rewrite_wrapped_call(out, "isfinite", "((", ") IS NOT NULL)")
    # justify_hours/days/interval renormalize DISPLAY units; the value
    # is unchanged — identity preserves comparison semantics
    out = _rewrite_wrapped_call(
        out, "justify_(?:hours|days|interval)", "((", "))")
    # strpos(s, sub) → position(sub, s)  (argument swap)
    out = re.sub(
        r"\bstrpos\s*\(\s*([^(),]+?)\s*,\s*([^(),]+?)\s*\)",
        r"position(\2, \1)",
        out,
        flags=re.I,
    )

    # string_agg(e, 'sep' [ORDER BY o]) → listagg WITHIN GROUP
    def sa(m: re.Match) -> str:
        e, sep, ob = m.group(1), m.group(2), m.group(3)
        wg = f" WITHIN GROUP (ORDER BY {ob})" if ob else ""
        return f"listagg({e}, {sep}){wg}"

    out = _STRING_AGG_RE.sub(sa, out)

    # to_char(expr, 'fmt') → date_format(expr, java_fmt) for datetime
    # templates; numeric templates (9/0 digits, G/D group separators —
    # pg report formatting) translate onto Spark's native numeric
    # to_char, with FM (fill-mode) mapped to a trim of the space pad.
    def tc(m: re.Match) -> str:
        expr, fmt = m.group(1), m.group(2)
        if re.fullmatch(r"(?i)[FM90GDS,.$LPRMITHVBE ]*", fmt) and \
                re.search(r"[90]", fmt):
            fm = fmt.upper().startswith("FM")
            nf = fmt[2:] if fm else fmt
            nf = (nf.replace("G", ",").replace("D", ".")
                    .replace("L", "$").replace("TH", "").replace("g", ",")
                    .replace("d", ".").replace("l", "$").replace("th", ""))
            # Spark's to_char rejects (renders '#') any value whose
            # scale exceeds the template's — pg rounds; match pg by
            # casting to the template's decimal shape first
            frac = len(nf.split(".", 1)[1].replace(",", "")) \
                if "." in nf else 0
            call = (f"to_char(cast(({expr}) as decimal(38, {frac})), "
                    f"'{nf}')")
            return f"trim({call})" if fm else call
        return f"date_format({expr}, '{pg_datetime_format(fmt)}')"

    out = re.sub(
        r"\bto_char\s*\(\s*(.+?)\s*,\s*'([^']*)'\s*\)", tc, out, flags=re.I
    )

    # generate_subscripts(arr, 1) ≡ generate_series(1, array_length):
    # fold onto the series machinery (FROM and scalar forms alike);
    # only dimension 1 exists for Spark arrays, the reverse flag stays
    # unsupported and fails visibly
    out = re.sub(
        r"(?i)\bgenerate_subscripts\s*\(\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*,\s*1\s*\)",
        r"generate_series(1, size(\1))", out,
    )
    # array_replace(arr, from, to): every matching element (NULL-safe)
    out = re.sub(
        r"(?i)\barray_replace\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"transform(\1, __e -> CASE WHEN __e <=> (\2) THEN (\3) "
        r"ELSE __e END)", out,
    )
    # string_to_table(s, 'sep'): literal separator — regex-escape it
    # and fold onto the regexp_split_to_table machinery below
    def stt(m: re.Match) -> str:
        esc = re.escape(m.group(2)).replace("\\", "\\\\") \
            .replace("'", "''")
        return f"regexp_split_to_table({m.group(1)}, '{esc}')"

    out = re.sub(
        r"(?i)\bstring_to_table\s*\(\s*"
        r"((?:'(?:[^']|'')*'|[^(),']|\([^()]*\))+?)"
        r"\s*,\s*'((?:[^']|'')*)'\s*\)",
        stt, out,
    )
    # DuckDB time_bucket(interval, ts): date_bin with DuckDB's default
    # origin (2000-01-03, Monday-aligned for week strides)
    out = re.sub(
        r"(?i)\btime_bucket\s*\(\s*(interval\s+'[^']+')\s*,\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"date_bin(\1, \2, TIMESTAMP '2000-01-03 00:00:00')", out,
    )
    # date_bin(interval 'stride', ts, origin): origin-aligned bucket
    def dbin(m: re.Match) -> str:
        secs = _interval_text_secs(m.group(1))
        if secs is None:
            return m.group(0)
        ts, org = m.group(2), m.group(3)
        s = int(secs) if float(secs).is_integer() else secs
        return (f"to_timestamp(unix_timestamp({org}) + "
                f"CAST(floor((unix_timestamp({ts}) - "
                f"unix_timestamp({org})) / {s}) AS BIGINT) * {s})")

    out = re.sub(
        r"(?i)\bdate_bin\s*\(\s*(?:interval\s+)?'([^']+)'\s*,\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*,\s*"
        r"((?:[^(),]|\([^()]*\))+?)\s*\)",
        dbin, out,
    )
    # regexp_split_to_table(s, p): set-returning split — FROM / comma
    # / scalar positions (single-column SRF: an alias names the column)
    if re.search(r"(?i)\bregexp_split_to_table\s*\(", out):
        _RA = r"((?:[^()]|\([^()]*\))*)"

        def rst_comma(m: re.Match) -> str:
            args = m.group(1)
            col = m.group(3) or m.group(2) or "regexp_split_to_table"
            return (f" LATERAL VIEW explode(split({args})) "
                    f"__rs_{col} AS {col}")

        out = re.sub(
            r"(?i),\s*regexp_split_to_table\s*\(" + _RA + r"\)"
            r"(?:\s+(?:AS\s+)?" + _NOT_CLAUSE_KW + r"(\w+)"
            r"(?:\s*\(\s*(\w+)\s*\))?)?",
            rst_comma, out,
        )

        def rst_from(m: re.Match) -> str:
            kw, args = m.group(1), m.group(2)
            col = m.group(4) or m.group(3) or "regexp_split_to_table"
            tbl = m.group(3) or f"__rs_{col}"
            return (f"{kw} (SELECT explode(split({args})) AS {col}) "
                    f"{tbl}")

        out = re.sub(
            r"(?i)\b(FROM|JOIN)\s+regexp_split_to_table\s*\("
            + _RA + r"\)"
            r"(?:\s+(?:AS\s+)?" + _NOT_CLAUSE_KW + r"(\w+)"
            r"(?:\s*\(\s*(\w+)\s*\))?)?",
            rst_from, out,
        )
        out = _rewrite_wrapped_call(
            out, "regexp_split_to_table", "explode(split(", "))",
        )  # scalar position

    # FROM generate_series(a, b[, step]) [AS] alias[(col)]
    #   → FROM (SELECT explode(sequence(a, b[, step])) AS col) alias
    def gs(m: re.Match) -> str:
        args = m.group(1)
        alias = m.group(2) or "generate_series"
        col = m.group(3) or "generate_series"
        return (
            f"FROM (SELECT explode(sequence({args})) AS {col}) {alias}"
        )

    out = _GEN_SERIES_FROM_RE.sub(gs, out)

    # array_agg(e ORDER BY k [DESC]) → sort-by-key struct fold
    # (collect_list has no ORDER BY; array_sort on (key, value)
    # structs is the deterministic equivalent)
    def aa(m: re.Match) -> str:
        e, ob, dr = m.group(1), m.group(2), (m.group(3) or "").strip()
        dm = re.match(r"(?is)^DISTINCT\s+(.*)$", e)
        if dm:
            # pg requires the DISTINCT ORDER BY key to be the argument
            # itself — sorted set semantics
            e = dm.group(1)
            base = f"array_sort(collect_set({e}))"
        else:
            base = (
                f"transform(array_sort(collect_list(struct(({ob}) AS "
                f"__k, ({e}) AS __v))), __s -> __s.__v)"
            )
        return f"reverse({base})" if dr.upper() == "DESC" else base

    out = _ARRAY_AGG_RE.sub(aa, out)
    # orderless DISTINCT form
    out = re.sub(
        r"\barray_agg\s*\(\s*DISTINCT\s+((?:[^(),]|\([^()]*\))+?)\s*\)",
        r"collect_set(\1)", out, flags=re.I,
    )

    # FROM-comma unnest (implicit lateral): `FROM t, unnest(e) AS a`
    # or `AS t(x)` → LATERAL VIEW explode; `WITH ORDINALITY` adds the
    # 1-based index column via inline(transform(.., (x, i) -> struct));
    # select-position unnest falls through to the plain explode rename
    # below
    _UN_ORD = (r"unnest\s*\(((?:[^()]|\([^()]*\))*)\)"
               r"(\s+WITH\s+ORDINALITY)?"
               r"(?:\s+(?:AS\s+)?" + _NOT_CLAUSE_KW + r"(\w+)"
               r"(?:\s*\(\s*([\w\s,]+?)\s*\))?)?")

    def _un_parts(m: re.Match):
        from myduckserver_spark.statements import split_top_level
        args, ordi, a1, clist = (m.group(1), m.group(2), m.group(3),
                                 m.group(4))
        cols = ([c.strip() for c in clist.split(",")] if clist
                else [])
        arr_list = [a.strip() for a in split_top_level(args, ",")]
        n_arr = len(arr_list)
        # pg default output column names: `unnest` (single array) /
        # the alias; multi-array zip defaults to unnest, unnest_1, …
        while len(cols) < n_arr + (1 if ordi else 0):
            k = len(cols)
            if k < n_arr:
                cols.append(a1 or "unnest" if k == 0
                            else f"unnest_{k}")
            else:
                cols.append("ordinality")
        col = cols[0]
        tbl = a1 or f"__uv_{col}"
        oc = cols[n_arr] if ordi else "ordinality"
        return args, bool(ordi), tbl, col, oc, arr_list, cols

    def _un_gen(args: str, tbl: str, col: str, oc: str,
                ordi: bool, lateral: bool, arr_list=None,
                cols=None) -> str:
        arr_list = arr_list if arr_list is not None else [args]
        if len(arr_list) > 1:
            # multi-array zip (pg NULL-pads to the longest input):
            # index walk with try_element_at keeps ANSI mode happy
            sizes = ", ".join(f"size({a})" for a in arr_list)
            idx = (f"CASE WHEN greatest({sizes}) <= 0 THEN "
                   f"array() ELSE sequence(0, greatest({sizes}) - 1) "
                   "END")
            fields = ", ".join(
                f"try_element_at({a}, __ui + 1) AS {c}"
                for a, c in zip(arr_list, cols)
            )
            if ordi:
                fields += f", CAST(__ui + 1 AS BIGINT) AS {oc}"
            gen = (f"inline(transform({idx}, __ui -> "
                   f"struct({fields})))")
            if lateral:
                return f" LATERAL VIEW {gen} {tbl}"
            return f"(SELECT {gen}) {tbl}"
        if ordi:
            gen = (f"inline(transform({args}, (__ux, __ui) -> "
                   f"struct(__ux AS {col}, "
                   f"CAST(__ui + 1 AS BIGINT) AS {oc})))")
            if lateral:
                return f" LATERAL VIEW {gen} {tbl}"
            return f"(SELECT {gen}) {tbl}"
        if lateral:
            return f" LATERAL VIEW explode({args}) {tbl} AS {col}"
        return f"(SELECT explode({args}) AS {col}) {tbl}"

    fm = re.search(r"(?i)\bFROM\b", out)
    if fm and re.search(r"(?i),\s*unnest\s*\(", out):
        def lat(m: re.Match) -> str:
            args, ordi, tbl, col, oc, arrs, cols = _un_parts(m)
            return _un_gen(args, tbl, col, oc, ordi, lateral=True,
                           arr_list=arrs, cols=cols)

        head, tail = out[:fm.end()], out[fm.end():]
        tail = re.sub(r",\s*" + _UN_ORD, lat, tail, flags=re.I)
        out = head + tail
    # standalone `FROM unnest(...) [WITH ORDINALITY] [AS t(u[, o])]`
    if re.search(r"(?i)\b(?:FROM|JOIN)\s+unnest\s*\(", out):
        def un_from(m: re.Match) -> str:
            kw = m.group(1)
            args, ordi, tbl, col, oc, arrs, cols = _un_parts(
                re.match(_UN_ORD, m.group(0)[len(kw):].lstrip(),
                         re.I))
            return f"{kw} " + _un_gen(args, tbl, col, oc, ordi,
                                      lateral=False, arr_list=arrs,
                                      cols=cols)

        out = re.sub(r"\b(FROM|JOIN)\s+" + _UN_ORD, un_from, out,
                     flags=re.I)

    # scalar-position generate_series/unnest → explode (the FROM form
    # was consumed above)
    out = _rewrite_wrapped_call(
        out, "generate_series", "explode(sequence(", "))"
    )
    out = re.sub(r"\bunnest\s*\(", "explode(", out, flags=re.I)

    # jsonpath existence `x @? 'path'` (before `?` key-existence so
    # the bare-? scan never sees the @? spelling)
    while True:
        m = re.search(r"@\?\s*('(?:[^']|'')*')", out)
        if not m or _in_string(out, m.start()):
            break
        start = _operand_start(out, m.start())
        while out[max(0, start - 2):start] == "::":
            start = _operand_start(out, start - 2)
        operand = out[start:m.start()].strip()
        if not operand:
            break
        out = (out[:start]
               + f"1 = jsonb_path_exists1({operand}, " + m.group(1)
               + ")" + out[m.end():])
    # jsonb key-existence `x ? 'k'`; containment @>/<@ rejects clearly
    while True:
        m = re.search(r"\?\s*('(?:[^']|'')*')", out)
        if not m or _in_string(out, m.start()):
            break
        start = _operand_start(out, m.start())
        while out[max(0, start - 2):start] == "::":
            start = _operand_start(out, start - 2)
        operand = out[start:m.start()].strip()
        if not operand:
            break
        out = (out[:start]
               + f"array_contains(json_object_keys({operand}), "
               + m.group(1) + ")" + out[m.end():])
    # `?|` / `?&`: ANY / ALL of the key array present in the document
    for op_rx, mode in ((r"\?\|", "any"), (r"\?&", "all")):
        while True:
            m = re.search(
                op_rx + r"\s*(array\s*\((?:[^()]|\([^()]*\))*\)"
                r"|[\w.]+)", out, re.I)
            if not m or _in_string(out, m.start()):
                break
            start = _operand_start(out, m.start())
            while out[max(0, start - 2):start] == "::":
                start = _operand_start(out, start - 2)
            operand = out[start:m.start()].strip()
            if not operand:
                break
            rhs = m.group(1)
            if mode == "any":
                repl = (f"arrays_overlap(json_object_keys({operand}),"
                        f" {rhs})")
            else:
                repl = (f"forall({rhs}, __k -> array_contains("
                        f"json_object_keys({operand}), __k))")
            out = out[:start] + repl + out[m.end():]
    # @> / <@ containment.  Array operands (textually ARRAY[...] /
    # array(...) — the literal rewrite has already run) use element
    # containment; everything else goes through the jsonb containment
    # UDF (pg 9.4 recursive semantics, jsonb_contains1 in
    # json_udfs.py).  Range types are not supported.
    def _is_arrayish(t: str) -> bool:
        t = t.strip().lower()
        return t.startswith(("array[", "array(")) or bool(
            re.match(r"(?:sequence|split|collect_list|collect_set|"
                     r"array_\w+|sort_array|slice|concat)\s*\(", t))

    scan = 0
    while True:
        cm2 = re.compile(r"@>|<@").search(out, scan)
        if not cm2:
            break
        if _in_string(out, cm2.start()):
            scan = cm2.end()
            continue
        lstart = _operand_start(out, cm2.start())
        while out[max(0, lstart - 2):lstart] == "::":
            lstart = _operand_start(out, lstart - 2)
        lhs = out[lstart:cm2.start()].strip()
        rend = _operand_end(out, cm2.end())
        rhs = out[cm2.end():rend].strip()
        if not lhs or not rhs:
            raise NotImplementedError(
                f"pg operator {cm2.group(0)!r}: could not parse "
                "operands (range containment is not supported)"
            )
        big, small = (lhs, rhs) if cm2.group(0) == "@>" else (rhs, lhs)
        if _is_arrayish(lhs) or _is_arrayish(rhs):
            repl = (f"forall({small}, __e -> "
                    f"array_contains({big}, __e))")
        else:
            repl = f"1 = jsonb_contains1({big}, {small})"
        out = out[:lstart] + repl + out[rend:]
        scan = 0

    # array overlap `a && b` (pg's only && spelling — boolean AND is
    # the AND keyword)
    scan = 0
    while True:
        am = out.find("&&", scan)
        if am < 0:
            break
        if _in_string(out, am):
            scan = am + 2
            continue
        lstart = _operand_start(out, am)
        lhs = out[lstart:am].strip()
        rend = _operand_end(out, am + 2)
        rhs = out[am + 2:rend].strip()
        if not lhs or not rhs:
            break
        out = (out[:lstart] + f"arrays_overlap({lhs}, {rhs})"
               + out[rend:])
        scan = 0

    # jsonb_set(doc, '{a,b,0}', val[, create_missing]) → the MySQL
    # mutation UDFs (same path grammar after '{a,b}' → '$.a.b[0]');
    # the new value is JSON text, boxed as a 1-element JSON array for
    # the _first_val decoding contract
    def jset(m: re.Match) -> str:
        doc, path, val, create = (m.group(1), m.group(2),
                                  m.group(3), m.group(4))
        legs = []
        for leg in path.split(","):
            leg = leg.strip().strip('"')
            if not leg:
                continue
            legs.append(f"[{leg}]" if leg.isdigit() else f".{leg}")
        fn = "json_set1"
        if create and create.strip().lower() == "false":
            fn = "json_replace1"
        return (f"{fn}({doc}, '${''.join(legs)}', "
                f"concat('[', {val}, ']'))")

    _JARG = r"((?:'(?:[^']|'')*'|[^(),']|\([^()]*\))+?)"
    out = re.sub(
        r"(?i)\bjsonb?_set\s*\(\s*" + _JARG + r"\s*,\s*"
        r"'\{([^}']*)\}'\s*,\s*" + _JARG +
        r"(?:\s*,\s*" + _JARG + r")?\s*\)",
        jset, out,
    )
    out = re.sub(r"(?i)\bjsonb?_strip_nulls\s*\(", "json_strip_nulls1(",
                 out)
    out = re.sub(r"(?i)\bjsonb_pretty\s*\(", "json_pretty_pg(", out)

    # pg json constructors/aggregates → to_json over Spark complex
    # types. map()/array() coerce mixed values to one type (1 → "1"),
    # so the builders reuse the MySQL door's per-value encoding
    # (functions/mysql_compat.py _fn_json_array/_fn_json_object):
    # homogeneous literals take the fast native path, mixed types
    # JSON-encode each value independently and splice in a UDF.
    out = _rewrite_json_builders(out)
    # json_agg(x ORDER BY k [DESC]) — collect_list has no ORDER BY;
    # same sort-by-key struct fold as array_agg above
    def ja(m: re.Match) -> str:
        e, ob, dr = m.group(1), m.group(2), (m.group(3) or "").strip()
        base = (
            f"transform(array_sort(collect_list(struct(({ob}) AS __k, "
            f"({e}) AS __v))), __s -> __s.__v)"
        )
        if dr.upper() == "DESC":
            base = f"reverse({base})"
        return f"to_json({base})"

    out = re.sub(
        r"\bjsonb?_agg\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s+ORDER\s+BY\s+"
        r"((?:[^(),]|\([^()]*\))+?)(\s+DESC|\s+ASC)?\s*\)",
        ja, out, flags=re.I,
    )
    out = _rewrite_wrapped_call(
        out, "jsonb?_agg", "to_json(collect_list(", "))"
    )
    # row_to_json(alias) over a FROM-item alias → the row as a JSON
    # object; a struct() argument (from the ROW() rewrite) serializes
    # directly (field names col1… — pg's f1… naming is a documented
    # divergence); composite-expression arguments reject naturally
    out = re.sub(
        r"(?i)\brow_to_json\s*\(\s*([a-zA-Z_]\w*)\s*\)",
        r"to_json(struct(\1.*))", out,
    )
    out = re.sub(r"(?i)\brow_to_json\s*\(\s*(?=struct\s*\()",
                 "to_json(", out)
    # user to_json/to_jsonb accept ANY argument in pg (scalars too);
    # Spark's to_json wants complex types — box in a 1-element array
    # and unwrap (pg_scalar_json1), type-faithful for every input.
    # Single-argument calls only (Spark's options form passes through).
    for _nm in ("to_jsonb", "to_json"):
        rx = re.compile(rf"(?i)\b{_nm}\s*\(")
        pos = 0
        while True:
            m = rx.search(out, pos)
            if not m or (_in_string(out, m.start())):
                break
            close = _match_bracket(out, m.end() - 1, "(", ")")
            if close < 0:
                break
            inner = out[m.end():close]
            from myduckserver_spark.statements import split_top_level
            if len(split_top_level(inner, ",")) != 1:
                pos = close + 1
                continue
            repl = f"pg_scalar_json1(to_json(array({inner})))"
            out = out[:m.start()] + repl + out[close + 1:]
            pos = m.start() + len(repl)
    # timezone(zone, ts) ≡ ts AT TIME ZONE zone (function spelling)
    out = re.sub(
        r"(?i)\btimezone\s*\(\s*((?:[^(),']|'(?:[^']|'')*')+?)\s*,\s*"
        r"((?:[^(),']|'(?:[^']|'')*'|\([^()]*\))+?)\s*\)",
        r"to_utc_timestamp(\2, \1)", out,
    )
    # array_upper/array_lower: Spark arrays have exactly one dimension
    # with lower bound 1; pg returns NULL on empty arrays
    out = re.sub(
        r"(?i)\barray_upper\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*1\s*\)",
        r"nullif(size(\1), 0)", out,
    )
    out = re.sub(
        r"(?i)\barray_lower\s*\(\s*((?:[^(),]|\([^()]*\))+?)\s*,\s*1\s*\)",
        r"(CASE WHEN size(\1) > 0 THEN 1 END)", out,
    )

    # make_interval(named => args) → positional (pg and Spark share the
    # signature years, months, weeks, days, hours, mins, secs)
    def mki(m: re.Match) -> str:
        order = ["years", "months", "weeks", "days", "hours", "mins",
                 "secs"]
        vals = {k: "0" for k in order}
        for part in m.group(1).split(","):
            part = part.strip()
            if not part:
                continue
            am = re.match(r"(?i)(\w+)\s*=>\s*(.+)", part)
            if not am or am.group(1).lower() not in vals:
                return m.group(0)  # positional / unknown: leave as-is
            vals[am.group(1).lower()] = am.group(2).strip()
        # pick the concrete Spark interval family when the named args
        # stay on one side of the year-month / day-time split (a bare
        # make_interval yields CalendarIntervalType, which clients
        # cannot even fetch)
        if vals["years"] == "0" and vals["months"] == "0":
            days = vals["days"]
            if vals["weeks"] != "0":
                days = f"({vals['weeks']}) * 7 + ({days})"
            return (f"make_dt_interval({days}, {vals['hours']}, "
                    f"{vals['mins']}, {vals['secs']})")
        if all(vals[k] == "0" for k in ("weeks", "days", "hours",
                                        "mins", "secs")):
            return f"make_ym_interval({vals['years']}, {vals['months']})"
        return "make_interval(" + ", ".join(vals[k] for k in order) + ")"

    if re.search(r"(?i)\bmake_interval\s*\([^)]*=>", out):
        out = re.sub(r"(?i)\bmake_interval\s*\(([^()]*)\)", mki, out)

    def joa(m: re.Match) -> str:
        k, v = m.group(1), m.group(2)
        return (
            "to_json(map_from_entries(collect_list("
            f"struct(cast(({k}) as string), ({v})))))"
        )

    out = _JSON_OBJECT_AGG_RE.sub(joa, out)

    # EXTRACT(EPOCH FROM interval 'lit' [unit]) → total seconds,
    # computed here (pg: months count 30 days, days 86400 s —
    # timestamp.c interval_part); must run before the generic
    # timestamp EPOCH rewrite below, which would cast the interval
    out = re.sub(
        r"\bEXTRACT\s*\(\s*EPOCH\s+FROM\s+INTERVAL\s+"
        r"'([^']+)'\s*(\w+(?:\s+TO\s+\w+)?)?\s*\)",
        lambda m: _interval_epoch_seconds(m.group(1), m.group(2))
        or m.group(0),
        out, flags=re.I,
    )
    # EXTRACT(EPOCH FROM x) → seconds-with-fraction since the epoch
    out = re.sub(
        r"\bEXTRACT\s*\(\s*EPOCH\s+FROM\s+"
        r"([^()]*(?:\([^()]*\)[^()]*)*)\)",
        r"cast(cast((\1) as timestamp) as double)",
        out, flags=re.I,
    )

    # TABLESAMPLE BERNOULLI/SYSTEM(pct) → Spark's percent sampling
    out = re.sub(
        r"\bTABLESAMPLE\s+(?:BERNOULLI|SYSTEM)\s*\(\s*([\d.]+)\s*\)",
        r"TABLESAMPLE (\1 PERCENT)",
        out, flags=re.I,
    )
    return out


_ESTRING_RE = re.compile(r"\bE'")
_FETCH_FIRST_RE = re.compile(
    r"\bFETCH\s+FIRST\s+(\d+)\s+ROWS?\s+ONLY\b", re.I
)
_ARRAY_LIT_RE = re.compile(r"\bARRAY\s*\[", re.I)


def _match_bracket(s: str, i: int, op: str = "[", cl: str = "]") -> int:
    depth = 0
    for j in range(i, len(s)):
        if s[j] == op:
            depth += 1
        elif s[j] == cl:
            depth -= 1
            if depth == 0:
                return j
    return -1


def _rewrite_star_modifiers(sql: str, schema_fn=None) -> str:
    """DuckDB star modifiers through the pg door (the reference's pg
    port exposes full DuckDB syntax verbatim; the reference itself
    generates EXCLUDE(...), delta/controller.go:377-379):
      ``* EXCLUDE (a, b)``  → ``* EXCEPT (a, b)`` (Spark-native)
      ``* REPLACE (e AS c)`` → an explicit projection with the
    replacement IN PLACE when ``schema_fn(table) -> [col, ...]`` can
    resolve the FROM table (DuckDB keeps ordinal position); otherwise
    ``* EXCEPT (c), e AS c`` — name/values identical, position moves
    to the end."""
    out = sql
    # EXCLUDE → EXCEPT, with or without parens
    while True:
        m = re.search(r"\*\s+EXCLUDE\s*(\()?", out, re.I)
        if not m or _in_string(out, m.start()):
            break
        if m.group(1):
            close = _match_bracket(out, m.end() - 1, "(", ")")
            if close < 0:
                break
            out = (out[:m.start()] + "* EXCEPT ("
                   + out[m.end():close] + ")" + out[close + 1:])
        else:
            wm = re.match(r"[\w`\"]+", out[m.end():])
            if not wm:
                break
            out = (out[:m.start()] + f"* EXCEPT ({wm.group(0)})"
                   + out[m.end() + wm.end():])
    # REPLACE (e AS c, ...) after a star
    while True:
        m = re.search(r"(\w+\s*\.\s*)?\*\s+REPLACE\s*\(", out, re.I)
        if not m or _in_string(out, m.start()):
            break
        close = _match_bracket(out, m.end() - 1, "(", ")")
        if close < 0:
            break
        from myduckserver_spark.statements import split_top_level

        items = [
            p.strip() for p in split_top_level(out[m.end():close], ",")
            if p.strip()
        ]
        cols = []
        for it in items:
            am = re.search(r"(?is)\sAS\s+([\w`\"]+)\s*$", it)
            if am is None:
                return out  # not the modifier shape: leave untouched
            cols.append(am.group(1))
        prefix = (m.group(1) or "").replace(" ", "")
        repl = None
        if schema_fn is not None:
            # resolve the FROM table to expand the star explicitly —
            # the replaced column keeps its ordinal position
            fm = re.search(
                r"(?is)\bFROM\s+([\w.\"`]+)"
                r"(?:\s+(?:AS\s+)?(?!WHERE|GROUP|ORDER|LIMIT|JOIN|ON"
                r"|LEFT|RIGHT|INNER|CROSS|FULL|UNION|HAVING\b)(\w+))?"
                r"\s*(?=$|WHERE|GROUP|ORDER|LIMIT|UNION|HAVING|;)",
                out[close + 1:],
            )
            if fm:
                tbl = fm.group(1).strip('"`')
                alias = fm.group(2)
                qual = prefix[:-1].strip('"`') if prefix else None
                if qual in (None, alias, tbl.split(".")[-1]):
                    names = schema_fn(tbl.split(".")[-1])
                    if names:
                        rep_map = {
                            c.strip('`"').lower(): it
                            for c, it in zip(cols, items)
                        }
                        p = prefix  # keep the user's qualifier
                        proj = [
                            rep_map.get(nm.lower(), f"{p}{nm}")
                            for nm in names
                        ]
                        repl = ", ".join(proj)
        if repl is None:
            repl = (
                f"{prefix}* EXCEPT ({', '.join(cols)}), "
                + ", ".join(items)
            )
        out = out[:m.start()] + repl + out[close + 1:]
    return out


_PRE_LITERAL_KW = frozenset({
    "SELECT", "WHERE", "AND", "OR", "NOT", "THEN", "ELSE", "WHEN",
    "CASE", "IN", "ON", "BY", "HAVING", "SET", "VALUES", "RETURN",
    "RETURNING", "ALL", "DISTINCT", "UNION", "INTERSECT", "EXCEPT",
})


def _rewrite_duckdb_literals(sql: str) -> str:
    """DuckDB bare collection literals through the pg door:
    ``[1, 2, 3]`` → ``array(1, 2, 3)`` (only where ``[`` cannot be a
    subscript — not preceded by an identifier/``)``/``]``);
    ``{'k': v, ...}`` → ``named_struct('k', v, ...)``. Rescans, so
    nesting works."""
    from myduckserver_spark.statements import split_top_level

    out = sql
    changed = True
    while changed:
        changed = False
        i = 0
        while i < len(out):
            ch = out[i]
            if ch not in "[{" or _in_string(out, i):
                i += 1
                continue
            k = i - 1
            while k >= 0 and out[k].isspace():
                k -= 1
            if ch == "[":
                if k >= 0 and (out[k].isalnum() or out[k] in "_$)]`\""):
                    # a preceding KEYWORD means literal, not subscript
                    w = k
                    while w >= 0 and (out[w].isalnum() or out[w] == "_"):
                        w -= 1
                    if out[w + 1:k + 1].upper() not in _PRE_LITERAL_KW:
                        i += 1
                        continue  # subscript site
                close = _match_bracket(out, i, "[", "]")
                if close < 0:
                    i += 1
                    continue
                inner = out[i + 1:close]
                if ":" in inner and "'" not in inner:
                    i += 1
                    continue  # slice syntax
                out = out[:i] + "array(" + inner + ")" + out[close + 1:]
                changed = True
                break
            # '{' — struct literal only when body is 'key': value pairs
            close = _match_bracket(out, i, "{", "}")
            if close < 0:
                i += 1
                continue
            parts = [
                p.strip() for p in split_top_level(out[i + 1:close], ",")
                if p.strip()
            ]
            kvs = []
            ok = bool(parts)
            for p in parts:
                pm = re.match(r"(?s)^('(?:[^']|'')*')\s*:\s*(.+)$", p)
                if pm is None:
                    ok = False
                    break
                kvs.append(f"{pm.group(1)}, {pm.group(2).strip()}")
            if not ok:
                i += 1
                continue
            out = (out[:i] + "named_struct(" + ", ".join(kvs) + ")"
                   + out[close + 1:])
            changed = True
            break
    return out


def _rewrite_array_literals(sql: str) -> str:
    """``ARRAY[a, b]`` → ``array(a, b)`` (rescans, so nesting works)."""
    out = sql
    while True:
        pos, m = 0, None
        while True:
            m = _ARRAY_LIT_RE.search(out, pos)
            if not m or not _in_string(out, m.start()):
                break
            pos = m.end()
        if not m:
            return out
        close = _match_bracket(out, m.end() - 1)
        if close < 0:
            return out
        out = (out[: m.start()] + "array(" + out[m.end():close] + ")"
               + out[close + 1:])


def _rewrite_subscripts(sql: str) -> str:
    """pg array subscript ``expr[i]`` → ``element_at(expr, i)``
    (1-based on both sides; slices ``[a:b]`` are left untouched)."""
    out = sql
    changed = True
    while changed:
        changed = False
        i = 0
        while i < len(out):
            if out[i] == "[" and not _in_string(out, i):
                k = i - 1
                while k >= 0 and out[k].isspace():
                    k -= 1
                if k >= 0 and (out[k].isalnum() or out[k] in "_$)`\""):
                    close = _match_bracket(out, i)
                    inner = out[i + 1: close] if close > 0 else ""
                    start = _operand_start(out, i)
                    operand = out[start:i].strip()
                    if close > 0 and operand and inner.strip() \
                            and ":" not in inner:
                        out = (out[:start]
                               + f"element_at({operand}, {inner})"
                               + out[close + 1:])
                        changed = True
                        break
                    sm = re.fullmatch(
                        r"\s*(-?\d+)\s*:\s*(-?\d+)\s*", inner)
                    if close > 0 and operand and sm:
                        # slice [a:b] → slice(arr, a, b-a+1) —
                        # inclusive bounds on both sides
                        a_, b_ = int(sm.group(1)), int(sm.group(2))
                        out = (out[:start]
                               + f"slice({operand}, {a_}, "
                               + f"{max(0, b_ - a_ + 1)})"
                               + out[close + 1:])
                        changed = True
                        break
            i += 1
    return out


def _pg_path_to_json(path: str) -> str:
    """pg text[] path literal body ``a,b,1`` → JSONPath ``$.a.b[1]``
    (numeric elements index arrays — the overwhelmingly common shape;
    an object KEY that is all digits would need ->'2' instead)."""
    out = "$"
    for el in path.split(","):
        el = el.strip().strip('"')
        if re.fullmatch(r"-?\d+", el):
            out += f"[{el}]"
        else:
            out += f".{el}"
    return out


def _rewrite_json_path_ops(sql: str) -> str:
    """pg ``x #> '{a,b}'`` / ``x #>> '{a,b}'`` →
    get_json_object(x, '$.a.b'); ``x #- '{a,b}'`` → json_remove1
    (the engine-registered JSON mutation UDF, functions/json_udfs.py).
    The reference passes all three through to DuckDB
    (pgserver/connection_handler.go ships text verbatim). Runs BEFORE
    _rewrite_xor_op so ``#`` XOR never mangles them."""
    out = sql
    scan = 0
    while True:
        found = out.find("#", scan)
        if found == -1:
            return out
        if _in_string(out, found) or _in_dquoted(out, found):
            scan = found + 1
            continue
        if out[found:found + 3] == "#>>":
            op, alen = "#>>", 3
        elif out[found:found + 2] == "#>":
            op, alen = "#>", 2
        elif out[found:found + 2] == "#-":
            op, alen = "#-", 2
        else:
            scan = found + 1
            continue
        r = found + alen
        while r < len(out) and out[r].isspace():
            r += 1
        if r >= len(out) or out[r] != "'":
            scan = found + alen
            continue
        e = out.find("'", r + 1)
        if e < 0:
            scan = found + alen
            continue
        body = out[r + 1:e].strip()
        if not (body.startswith("{") and body.endswith("}")):
            scan = found + alen
            continue
        jpath = _pg_path_to_json(body[1:-1])
        rhs_end = e + 1
        # pg allows ::text[] on the path literal
        cm = re.match(r"\s*::\s*text\s*\[\s*\]", out[rhs_end:])
        if cm:
            rhs_end += cm.end()
        start = _operand_start(out, found)
        while out[max(0, start - 2):start] == "::":
            start = _operand_start(out, start - 2)
        operand = out[start:found].strip()
        if not operand:
            scan = found + alen
            continue
        if op == "#-":
            repl = f"json_remove1({operand}, '{jpath}')"
        else:
            repl = f"get_json_object({operand}, '{jpath}')"
        out = out[:start] + repl + out[rhs_end:]
        scan = start + len(repl)


_JSONBISH_RE = re.compile(
    r"(?is)(?:::\s*jsonb?\s*$"
    r"|^(?:jsonb?_set|jsonb?_build_object|jsonb?_build_array|to_jsonb"
    r"|jsonb_concat1|jsonb_del_key1|jsonb_del_idx1|json_remove1"
    r"|json_strip_nulls1|get_json_object|json_set1|json_insert1"
    r"|json_replace1|jsonb?_insert|jsonb?_object)\s*\()"
)


def _is_jsonbish(expr: str) -> bool:
    return bool(_JSONBISH_RE.search(expr.strip()))


def _rewrite_jsonb_value_ops(sql: str) -> str:
    """pg jsonb value operators on recognizably-jsonb operands
    (a ``::jsonb`` cast or a jsonb-producing call): ``a || b`` →
    merge/concat, ``a - 'k'`` → key delete, ``a - n`` → index delete
    (UDFs in functions/json_udfs.py; pg semantics incl. RHS-wins
    object merge and negative indexes). Operands Spark can't prove
    jsonb pass through untouched — ``||`` stays string concat there,
    exactly pg's behavior for text operands."""
    out = sql
    scan = 0
    while True:
        # find the next candidate operator
        m = re.compile(r"\|\||-").search(out, scan)
        if not m:
            return out
        found = m.start()
        tok = m.group(0)
        if _in_string(out, found):
            scan = found + len(tok)
            continue
        if tok == "-" and found + 1 < len(out) and out[found + 1] in ">-":
            scan = found + 2  # -> / ->> / comment --
            continue
        start = _operand_start(out, found)
        while out[max(0, start - 2):start] == "::":
            start = _operand_start(out, start - 2)
        lhs = out[start:found].strip()
        if not lhs or not _is_jsonbish(lhs):
            scan = found + len(tok)
            continue
        r = found + len(tok)
        while r < len(out) and out[r].isspace():
            r += 1
        if tok == "-":
            if r < len(out) and out[r] == "'":
                e = out.find("'", r + 1)
                while 0 < e < len(out) - 1 and out[e + 1] == "'":
                    e = out.find("'", e + 2)
                if e < 0:
                    scan = found + 1
                    continue
                key = out[r:e + 1]
                repl = f"jsonb_del_key1({lhs}, {key})"
                rhs_end = e + 1
            else:
                im = re.match(r"-?\d+", out[r:])
                if not im:
                    scan = found + 1
                    continue
                repl = f"jsonb_del_idx1({lhs}, {im.group(0)})"
                rhs_end = r + im.end()
        else:  # ||
            rm = re.match(
                r"('(?:[^']|'')*'|[a-zA-Z_]\w*(?:\s*\()?)", out[r:])
            if not rm:
                scan = found + 2
                continue
            if rm.group(1).endswith("("):
                close = _match_bracket(out, r + rm.end() - 1, "(", ")")
                if close < 0:
                    scan = found + 2
                    continue
                rhs_end = close + 1
            else:
                rhs_end = r + rm.end()
            cm = re.match(r"\s*::\s*\w+(?:\s*\[\s*\])?", out[rhs_end:])
            if cm:
                rhs_end += cm.end()
            rhs = out[r:rhs_end].strip()
            repl = f"jsonb_concat1({lhs}, {rhs})"
        out = out[:start] + repl + out[rhs_end:]
        scan = start + len(repl)


def _rewrite_json_ops(sql: str) -> str:
    """pg ``x -> 'k'`` / ``x ->> 'k'`` / ``x -> 2`` →
    get_json_object(x, '$.k' / '$[2]'). Runs BEFORE any rewrite that
    injects Spark lambda arrows; a non-literal right side is left
    alone, so lambdas could never match anyway."""
    out = sql
    scan = 0
    while True:
        found = out.find("->", scan)
        if found == -1:
            return out
        if _in_string(out, found):
            scan = found + 2
            continue
        alen = 3 if out[found:found + 3] == "->>" else 2
        r = found + alen
        while r < len(out) and out[r].isspace():
            r += 1
        path = rhs_end = None
        if r < len(out) and out[r] == "'":
            e = out.find("'", r + 1)
            if e > 0:
                key = out[r + 1: e]
                path = f"'$.{key}'" if not key.startswith("$") else f"'{key}'"
                rhs_end = e + 1
        elif r < len(out) and (
            out[r].isdigit()
            or (out[r] == "-" and r + 1 < len(out)
                and out[r + 1].isdigit())
        ):
            e = r + (1 if out[r] == "-" else 0)
            while e < len(out) and out[e].isdigit():
                e += 1
            path = f"'$[{out[r:e]}]'"
            rhs_end = e
        if path is None:
            scan = found + alen  # not a pg json operator site
            continue
        start = _operand_start(out, found)
        # extend through ::type cast chains ('{"a":1}'::jsonb ->> 'a')
        while out[max(0, start - 2):start] == "::":
            start = _operand_start(out, start - 2)
        operand = out[start:found].strip()
        if not operand:
            scan = found + alen
            continue
        if path.startswith("'$[-"):
            # negative index counts from the end (pg 13+);
            # get_json_object has no such path leg — element_at over
            # the decoded array does (try_: out-of-range → NULL)
            idx = path[3:-2]
            dec = ("json_arr_elems_text" if alen == 3
                   else "json_arr_elems")
            repl = f"try_element_at({dec}({operand}), {idx})"
        else:
            repl = f"get_json_object({operand}, {path})"
        out = out[:start] + repl + out[rhs_end:]
        scan = start + len(repl)


def _rewrite_wrapped_call(out: str, name: str, open_repl: str,
                          close_repl: str) -> str:
    """Replace ``name( args )`` with ``open_repl args close_repl``
    (balanced-paren aware, for rewrites that change nesting depth)."""
    rx = re.compile(rf"\b{name}\s*\(", re.I)
    while True:
        pos, m = 0, None
        while True:
            m = rx.search(out, pos)
            if not m or not _in_string(out, m.start()):
                break
            pos = m.end()
        if not m:
            return out
        close = _match_bracket(out, m.end() - 1, "(", ")")
        if close < 0:
            return out
        inner = out[m.end():close]
        out = out[: m.start()] + open_repl + inner + close_repl \
            + out[close + 1:]


_SCALAR_LIT_RE = re.compile(
    r"\s*('(?:[^']|'')*'|[-+]?\d+(?:\.\d+)?)(?!\s*\|\|)"
)


def _rewrite_array_elem_concat(out: str) -> str:
    """pg ``anyarray || anyelement`` / ``anyelement || anyarray`` →
    array_append / array_prepend, for the decidable shapes: an
    ``array(...)`` literal on one side and a scalar literal on the
    other. An identifier operand could itself be an array column
    (where ``||`` must stay concat), so those pass through untouched
    and fail visibly on type mismatch."""
    # array(...) || lit
    while True:
        m = re.search(r"(?i)\barray\s*\(", out)
        pos = 0
        found = None
        while m:
            close = _match_bracket(out, m.end() - 1, "(", ")")
            if close < 0:
                break
            after = re.match(r"\s*\|\|", out[close + 1:])
            if after:
                lm = _SCALAR_LIT_RE.match(
                    out, close + 1 + after.end())
                if lm:
                    found = (m.start(), close, lm)
                    break
            pos = m.end()
            m = re.compile(r"(?i)\barray\s*\(").search(out, pos)
        if not found:
            break
        s0, close, lm = found
        arr = out[s0:close + 1]
        out = (out[:s0] + f"array_append({arr}, {lm.group(1)})"
               + out[lm.end():])
    # lit || array(...)
    lit_rx = re.compile(
        r"(?i)('(?:[^']|'')*'|(?<![\w.)])[-+]?\d+(?:\.\d+)?)"
        r"\s*\|\|\s*(array\s*\()"
    )
    while True:
        m = lit_rx.search(out)
        if not m or _in_string(out, m.start()):
            break
        close = _match_bracket(out, m.end() - 1, "(", ")")
        if close < 0:
            break
        arr = out[m.start(2):close + 1]
        out = (out[:m.start()]
               + f"array_prepend({arr}, {m.group(1)})"
               + out[close + 1:])
    return out


_IVL_UNIT_SECONDS = {
    "microsecond": 1e-6, "millisecond": 1e-3, "second": 1.0,
    "minute": 60.0, "hour": 3600.0, "day": 86400.0, "week": 604800.0,
    # pg's justified constants (timestamp.c): month = 30 days,
    # year = 12 months
    "month": 2592000.0, "year": 31104000.0,
    "decade": 311040000.0, "century": 3110400000.0,
    "mon": 2592000.0,
}
_IVL_ABBREV = {
    "us": "microsecond", "usec": "microsecond", "usecs": "microsecond",
    "microseconds": "microsecond", "ms": "millisecond",
    "msec": "millisecond", "msecs": "millisecond",
    "milliseconds": "millisecond", "s": "second", "sec": "second",
    "secs": "second", "seconds": "second", "m": "minute",
    "min": "minute", "mins": "minute", "minutes": "minute",
    "h": "hour", "hr": "hour", "hrs": "hour", "hours": "hour",
    "d": "day", "days": "day", "w": "week", "weeks": "week",
    "mon": "month", "mons": "month", "months": "month", "y": "year",
    "yr": "year", "yrs": "year", "years": "year",
    "decades": "decade", "centuries": "century",
}


def _interval_epoch_seconds(lit: str, qual: str | None) -> str | None:
    """Total seconds of a pg interval literal (``'2 hours'``,
    ``'1 day 02:03:04'``, ``'90' MINUTE``); None when unparseable so
    the caller leaves the SQL to fail visibly."""
    total = 0.0
    text = lit.strip()
    if qual and re.fullmatch(r"[-+]?\d+(?:\.\d+)?", text):
        unit = _IVL_ABBREV.get(qual.split()[0].lower(),
                               qual.split()[0].lower())
        if unit not in _IVL_UNIT_SECONDS:
            return None
        secs = float(text) * _IVL_UNIT_SECONDS[unit]
        return f"CAST({secs!r} AS DOUBLE)"
    pos = 0
    for m in re.finditer(
        r"([-+]?\d+(?:\.\d+)?)\s*([a-zA-Z]+)"
        r"|([-+]?)(\d+):(\d{1,2})(?::(\d{1,2}(?:\.\d+)?))?",
        text,
    ):
        if text[pos:m.start()].strip():
            return None  # junk between components
        pos = m.end()
        if m.group(2) is not None:
            unit = _IVL_ABBREV.get(m.group(2).lower(),
                                   m.group(2).lower())
            if unit not in _IVL_UNIT_SECONDS:
                return None
            total += float(m.group(1)) * _IVL_UNIT_SECONDS[unit]
        else:
            sign = -1.0 if m.group(3) == "-" else 1.0
            hms = (float(m.group(4)) * 3600 + float(m.group(5)) * 60
                   + float(m.group(6) or 0))
            total += sign * hms
    if pos == 0 or text[pos:].strip():
        return None
    # pg returns numeric; DOUBLE keeps the gate's no-DECIMAL rule
    return f"CAST({total!r} AS DOUBLE)"


def _rewrite_json_builders(out: str) -> str:
    """``json[b]_build_object/array(args)`` → type-preserving JSON
    text (pg keeps each value's JSON type; Spark's map()/array()
    coerce to one type). Delegates to the MySQL door's constructor
    builders, which pick native-vs-UDF per argument mix."""
    from myduckserver_spark.functions.mysql_compat import (
        _fn_json_array, _fn_json_object,
    )
    from myduckserver_spark.statements import split_top_level

    for name, builder in (("jsonb?_build_object", _fn_json_object),
                          ("jsonb?_build_array", _fn_json_array)):
        rx = re.compile(rf"\b{name}\s*\(", re.I)
        while True:
            pos, m = 0, None
            while True:
                m = rx.search(out, pos)
                if not m or not _in_string(out, m.start()):
                    break
                pos = m.end()
            if not m:
                break
            close = _match_bracket(out, m.end() - 1, "(", ")")
            if close < 0:
                break
            inner = out[m.end():close].strip()
            args = ([a.strip() for a in split_top_level(inner, ",")]
                    if inner else [""])
            repl = builder(args)
            if repl is None:  # odd arg count etc. — leave to fail
                break
            out = out[: m.start()] + repl + out[close + 1:]
    return out


# ---------------------------------------------------------------- fulltext
# pg text search compiled to generated SQL over a 'simple'-config
# normalization (lowercase, non-alphanumerics fold to spaces — pg's
# own 'simple' dictionary; stemming configs like 'english' normalize
# the same way here, a documented divergence). Same discipline as the
# MySQL door's BOOLEAN MODE compiler (mysql_compat._ft_bool_sql):
# pure generated SQL, no per-row Python. Reference parity: the
# reference serves MATCH fulltext through GMS (main_test.go:1879) and
# has no pg tsearch path at all — this is strictly wider coverage.


def _tsquery_parse(q: str):
    """Parse a tsquery string: ``&`` AND, ``|`` OR, ``!`` NOT,
    ``<->``/``<N>`` phrase-follows, parens, ``:*`` prefix. Returns a
    node tree of ('term', w, prefix) / ('phrase', [terms]) /
    ('and'|'or', l, r) / ('not', x)."""
    toks = re.findall(
        r"<->|<\d+>|[&|!()]|'(?:[^']|'')*'|[^\s&|!()<]+", q)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def norm_word(w: str) -> tuple[str, bool]:
        w = w.strip()
        if w.startswith("'") and w.endswith("'") and len(w) >= 2:
            w = w[1:-1].replace("''", "'")
        prefix = w.endswith(":*")
        if prefix:
            w = w[:-2]
        return w.lower(), prefix

    def atom():
        t = peek()
        if t is None:
            raise ValueError("tsquery: unexpected end of input")
        if t == "(":
            take()
            node = or_expr()
            if peek() == ")":
                take()
            return node
        if t == "!":
            take()
            return ("not", atom())
        w, prefix = norm_word(take())
        if not w:
            raise ValueError("tsquery: empty lexeme")
        return ("term", w, prefix)

    def phrase_expr():
        node = atom()
        while peek() and (peek() == "<->" or re.fullmatch(
                r"<\d+>", peek() or "")):
            op = take()
            if op != "<->" and op != "<1>":
                raise NotImplementedError(
                    f"tsquery distance operator {op} is not supported "
                    "(<-> adjacency is)"
                )
            rhs = atom()
            lt = ([node[1]] if node[0] == "term" else
                  node[1] if node[0] == "phrase" else None)
            rt = ([rhs[1]] if rhs[0] == "term" else
                  rhs[1] if rhs[0] == "phrase" else None)
            if lt is None or rt is None or (
                    node[0] == "term" and node[2]) or (
                    rhs[0] == "term" and rhs[2]):
                raise NotImplementedError(
                    "tsquery <-> supports plain lexemes and phrases "
                    "only (no prefix/negation operands)"
                )
            node = ("phrase", lt + rt)
        return node

    def and_expr():
        node = phrase_expr()
        while peek() == "&":
            take()
            node = ("and", node, phrase_expr())
        return node

    def or_expr():
        node = and_expr()
        while peek() == "|":
            take()
            node = ("or", node, and_expr())
        return node

    tree = or_expr()
    if peek() is not None:
        raise ValueError(f"tsquery: unexpected token {peek()!r}")
    return tree


def _websearch_parse(q: str):
    """websearch_to_tsquery grammar: bare words AND together,
    ``"..."`` is a phrase, ``-`` excludes, ``or`` is OR (pg docs,
    textsearch-controls)."""
    items = re.findall(r'"[^"]*"|\S+', q)
    groups: list[list] = [[]]  # OR-separated groups of AND nodes
    for it in items:
        if it.lower() == "or":
            groups.append([])
            continue
        neg = it.startswith("-")
        if neg:
            it = it[1:]
        if it.startswith('"'):
            words = re.findall(r"[a-z0-9]+", it.lower())
            if not words:
                continue
            node = (("phrase", words) if len(words) > 1
                    else ("term", words[0], False))
        else:
            w = re.sub(r"[^a-z0-9]+", "", it.lower())
            if not w:
                continue
            node = ("term", w, False)
        groups[-1].append(("not", node) if neg else node)

    def and_of(nodes):
        if not nodes:
            return None
        t = nodes[0]
        for x in nodes[1:]:
            t = ("and", t, x)
        return t

    trees = [and_of(g) for g in groups if and_of(g) is not None]
    if not trees:
        return None
    t = trees[0]
    for x in trees[1:]:
        t = ("or", t, x)
    return t


def _tsquery_sql(doc: str, tree) -> str:
    """Boolean match SQL for a tsquery tree over document expr."""
    norm = (f"concat(' ', regexp_replace(lower({doc}), "
            "'[^a-z0-9]+', ' '), ' ')")

    def gen(node) -> str:
        kind = node[0]
        if kind == "term":
            _, w, prefix = node
            lit = w.replace("'", "''")
            if prefix:
                esc = (lit.replace("\\", "\\\\")
                       .replace("%", "\\%").replace("_", "\\_"))
                return f"({norm} LIKE '% {esc}%')"
            return f"(instr({norm}, ' {lit} ') > 0)"
        if kind == "phrase":
            lit = " ".join(node[1]).replace("'", "''")
            return f"(instr({norm}, ' {lit} ') > 0)"
        if kind == "not":
            return f"(NOT {gen(node[1])})"
        op = " AND " if kind == "and" else " OR "
        return f"({gen(node[1])}{op}{gen(node[2])})"

    return gen(tree)


def _tsquery_positive_leaves(tree, acc):
    if tree[0] in ("term", "phrase"):
        acc.append(tree)
    elif tree[0] == "not":
        return
    else:
        _tsquery_positive_leaves(tree[1], acc)
        _tsquery_positive_leaves(tree[2], acc)


_TSQUERY_FNS = r"(?:to|plainto|phraseto|websearch_to)_tsquery"


def _parse_ts_call(out: str, start: int, names: str):
    """Match ``name( args )`` at `start`; returns (name, args, end)."""
    m = re.compile(rf"({names})\s*\(", re.I).match(out, start)
    if not m:
        return None
    close = _match_bracket(out, m.end() - 1, "(", ")")
    if close < 0:
        return None
    from myduckserver_spark.statements import split_top_level
    args = [a.strip() for a in
            split_top_level(out[m.end():close], ",")]
    return m.group(1).lower(), args, close + 1


def _ts_tree_of(fn: str, args: list[str]):
    """tsquery-builder call → node tree (query must be a literal)."""
    q = args[-1] if len(args) in (1, 2) else None
    if q is None or not re.fullmatch(r"'(?:[^']|'')*'", q or ""):
        raise NotImplementedError(
            f"{fn}() requires a string-literal query"
        )
    text = q[1:-1].replace("''", "'")
    if fn == "to_tsquery":
        return _tsquery_parse(text)
    if fn == "plainto_tsquery":
        words = re.findall(r"[a-z0-9]+", text.lower())
        if not words:
            return None
        t = ("term", words[0], False)
        for w in words[1:]:
            t = ("and", t, ("term", w, False))
        return t
    if fn == "phraseto_tsquery":
        words = re.findall(r"[a-z0-9]+", text.lower())
        if not words:
            return None
        return (("phrase", words) if len(words) > 1
                else ("term", words[0], False))
    return _websearch_parse(text)


def _rewrite_tsearch(out: str) -> str:
    """``to_tsvector([cfg,] doc) @@ <builder>([cfg,] 'q')`` →
    generated boolean SQL; ``ts_rank([w,] vec, query)`` → matched
    positive-leaf count as DOUBLE (rank ordering for simple queries;
    pg's frequency weighting is a documented divergence)."""
    # ts_rank first (its args contain @@-free builder calls)
    while True:
        m = re.search(r"(?i)\bts_rank(?:_cd)?\s*\(", out)
        if not m or _in_string(out, m.start()):
            break
        close = _match_bracket(out, m.end() - 1, "(", ")")
        if close < 0:
            break
        from myduckserver_spark.statements import split_top_level
        args = [a.strip() for a in
                split_top_level(out[m.end():close], ",")]
        if len(args) == 3:  # leading weights array — ignored
            args = args[1:]
        if len(args) != 2:
            raise NotImplementedError(
                "ts_rank(vector, query) takes a to_tsvector and a "
                "tsquery builder"
            )
        vec = _parse_ts_call(args[0] + " ", 0, "to_tsvector")
        qc = _parse_ts_call(args[1] + " ", 0, _TSQUERY_FNS)
        if not vec or not qc:
            raise NotImplementedError(
                "ts_rank operands must be to_tsvector(...) and a "
                "*_tsquery(...) call"
            )
        doc = vec[1][-1]
        tree = _ts_tree_of(qc[0], qc[1])
        leaves: list = []
        if tree is not None:
            _tsquery_positive_leaves(tree, leaves)
        if leaves:
            total = " + ".join(
                f"(CASE WHEN {_tsquery_sql(doc, lf)} THEN 1 ELSE 0 "
                "END)" for lf in leaves
            )
            repl = f"CAST(({total}) AS DOUBLE)"
        else:
            repl = "CAST(0 AS DOUBLE)"
        out = out[:m.start()] + repl + out[close + 1:]

    # vec @@ query (either operand order)
    while True:
        i, p = -1, 0
        while True:
            i = out.find("@@", p)
            if i < 0 or not _in_string(out, i):
                break
            p = i + 2
        if i < 0:
            break
        # jsonb @@ 'jsonpath predicate' (string-literal RHS)
        jm = re.match(r"\s*('(?:[^']|'')*')", out[i + 2:])
        if jm:
            start = _operand_start(out, i)
            while out[max(0, start - 2):start] == "::":
                start = _operand_start(out, start - 2)
            operand = out[start:i].strip()
            if operand:
                out = (out[:start]
                       + f"1 = jsonb_path_match1({operand}, "
                       + jm.group(1) + ")" + out[i + 2 + jm.end():])
                continue
        # left operand: balanced call ending just before @@
        left_end = i
        while left_end > 0 and out[left_end - 1].isspace():
            left_end -= 1
        if left_end == 0 or out[left_end - 1] != ")":
            raise NotImplementedError(
                "@@ supports to_tsvector(...) @@ *_tsquery(...) for "
                "text search and jsonb @@ 'jsonpath' for JSON "
                "predicates (tsvector columns are not a stored type)"
            )
        depth, k = 0, left_end - 1
        while k >= 0:
            if out[k] == ")":
                depth += 1
            elif out[k] == "(":
                depth -= 1
                if depth == 0:
                    break
            k -= 1
        nm = re.search(r"(\w+)\s*$", out[:k])
        if not nm:
            raise NotImplementedError(
                "@@ left operand must be a function call"
            )
        lstart = nm.start(1)
        lcall = _parse_ts_call(out, lstart,
                               f"to_tsvector|{_TSQUERY_FNS}")
        # right operand
        j = i + 2
        while j < len(out) and out[j].isspace():
            j += 1
        rcall = _parse_ts_call(out, j,
                               f"to_tsvector|{_TSQUERY_FNS}")
        if not lcall or not rcall:
            raise NotImplementedError(
                "@@ supports to_tsvector(...) @@ *_tsquery(...) "
                "and the reversed order"
            )
        if lcall[0] == "to_tsvector":
            vec, qc = lcall, rcall
        elif rcall[0] == "to_tsvector":
            vec, qc = rcall, lcall
        else:
            raise NotImplementedError(
                "@@ needs a to_tsvector(...) on one side"
            )
        doc = vec[1][-1]
        tree = _ts_tree_of(qc[0], qc[1])
        repl = ("false" if tree is None
                else _tsquery_sql(doc, tree))
        out = out[:lstart] + repl + out[rcall[2]:]
    return out


def _rewrite_filter_over_window(sql: str) -> str:
    """``agg(args) FILTER (WHERE cond) OVER (…)`` →
    ``agg(CASE WHEN cond THEN args END) OVER (…)``.

    Spark executes aggregate FILTER natively in GROUP BY / HAVING /
    select positions but rejects it on WINDOW functions; the CASE
    rewrite is exactly equivalent for NULL-skipping aggregates
    (COUNT(*) counts a sentinel 1 instead). Non-window FILTER is left
    for Spark itself."""
    from myduckserver_spark.statements import mask_strings

    out = sql
    while True:
        mask = mask_strings(out)
        hit = None
        for m in re.finditer(r"(?i)\bFILTER\s*\(", mask):
            open_i = m.end() - 1
            try:
                close_i = _match_paren(mask, open_i)
            except ValueError:
                continue
            if not re.match(r"\s*OVER\b", mask[close_i + 1:], re.I):
                continue
            wm = re.match(r"\s*WHERE\s+(.+)$",
                          out[open_i + 1:close_i], re.I | re.S)
            if not wm:
                continue
            # the aggregate call immediately before FILTER
            j = m.start() - 1
            while j >= 0 and out[j].isspace():
                j -= 1
            if j < 0 or out[j] != ")":
                continue
            depth, k = 0, j
            while k >= 0:
                if mask[k] == ")":
                    depth += 1
                elif mask[k] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                k -= 1
            fm = re.search(r"([A-Za-z_]\w*)\s*$", out[:k])
            if not fm:
                continue
            hit = (fm.start(1), fm.group(1), out[k + 1:j],
                   wm.group(1).strip(), close_i)
            break
        if hit is None:
            return out
        start, fname, args, cond, close_i = hit
        payload = "1" if args.strip() == "*" else args
        out = (
            out[:start]
            + f"{fname}(CASE WHEN {cond} THEN {payload} END)"
            + out[close_i + 1:]
        )


_AT_TIME_ZONE_RE = re.compile(
    r"\bAT\s+TIME\s+ZONE\s+('(?:[^']|'')*')", re.I
)


def _rewrite_at_time_zone(sql: str) -> str:
    """``expr AT TIME ZONE 'z'`` → ``to_utc_timestamp(expr, 'z')``:
    pg interprets a plain timestamp as wall-clock time in z and
    converts to the session zone (UTC here) — exactly
    to_utc_timestamp's contract."""
    out = sql
    guard = 0
    while guard < 100:
        guard += 1
        m = _AT_TIME_ZONE_RE.search(out)
        if not m or _in_string(out, m.start()):
            return out
        start = _operand_start(out, m.start())
        # fold a typed-literal prefix (TIMESTAMP '...') into the operand
        pm = re.search(r"(?i)\b(TIMESTAMP|DATE|TIME)\s*$", out[:start])
        if pm and not _in_string(out, pm.start(1)):
            start = pm.start(1)
        operand = out[start:m.start()].strip()
        if not operand:
            return out
        out = (f"{out[:start]}to_utc_timestamp({operand}, "
               f"{m.group(1)}){out[m.end():]}")
    return out


_PG_SESSION_FNS = [
    # psql/BI clients parse version(); the reference's pg door reports
    # a PostgreSQL server_version (doltgres config)
    (re.compile(r"\bversion\s*\(\s*\)", re.I),
     "'PostgreSQL 15.0 myduckserver-spark (Spark SQL engine)'"),
    (re.compile(r"\bcurrent_schema\s*\(\s*\)", re.I), "'main'"),
    # bare spelling (no parens) is equally valid pg: SELECT current_schema
    (re.compile(r"\bcurrent_schema\b(?!\s*\()", re.I), "'main'"),
    (re.compile(r"\bpg_backend_pid\s*\(\s*\)", re.I), str(os.getpid())),
]


def _rewrite_pg_session_fns(sql: str) -> str:
    out = sql
    for rx, repl in _PG_SESSION_FNS:
        pos = 0
        while True:
            m = rx.search(out, pos)
            if not m:
                break
            if _in_string(out, m.start()):
                pos = m.end()
                continue
            out = out[: m.start()] + repl + out[m.end():]
            pos = m.start() + len(repl)
    return out


_HYPOTHETICAL_RE = re.compile(
    r"(?i)\b(rank|dense_rank|percent_rank|cume_dist)\s*\(\s*"
    r"((?:[^()']|'(?:[^']|'')*'|\([^()]*\))+?)\s*\)\s*"
    r"WITHIN\s+GROUP\s*\(\s*ORDER\s+BY\s+"
    r"((?:[^()']|'(?:[^']|'')*'|\([^()]*\))+?)"
    r"(?:\s+(ASC|DESC))?\s*\)"
)


def _rewrite_hypothetical_set(sql: str) -> str:
    """pg hypothetical-set aggregates — rank(v)/dense_rank(v)/
    percent_rank(v)/cume_dist(v) WITHIN GROUP (ORDER BY e) — lowered
    onto plain conditional aggregates (the rank of v had it been
    inserted into the sorted set). Single sort key; NULL sort rows
    follow pg's ASC=NULLS LAST placement."""
    def hs(m: re.Match) -> str:
        fn = m.group(1).lower()
        v, e = m.group(2).strip(), m.group(3).strip()
        if "," in st_split_guard(v) or "," in st_split_guard(e):
            return m.group(0)  # multi-arg form: leave to fail visibly
        desc = (m.group(4) or "").upper() == "DESC"
        lt, le = ("( %s ) > ( %s )", "( %s ) >= ( %s )") if desc else \
                 ("( %s ) < ( %s )", "( %s ) <= ( %s )")
        c_lt = "count_if(" + (lt % (e, v)) + ")"
        c_le = "count_if(" + (le % (e, v)) + ")"
        if fn == "rank":
            return f"({c_lt} + 1)"
        if fn == "dense_rank":
            cond = lt % (e, v)
            return (f"(count(DISTINCT CASE WHEN {cond} THEN ({e}) END)"
                    " + 1)")
        if fn == "percent_rank":
            return f"(CAST({c_lt} AS DOUBLE) / count(*))"
        return f"(CAST(({c_le} + 1) AS DOUBLE) / (count(*) + 1))"

    return _HYPOTHETICAL_RE.sub(hs, sql)


def st_split_guard(expr: str) -> str:
    """expr with parenthesized and quoted spans blanked, so a top-level
    comma test doesn't trip on commas inside calls/literals."""
    out, depth, i, q = [], 0, 0, False
    while i < len(expr):
        c = expr[i]
        if q:
            if c == "'":
                q = False
            out.append(" ")
        elif c == "'":
            q = True
            out.append(" ")
        elif c == "(":
            depth += 1
            out.append(" ")
        elif c == ")":
            depth -= 1
            out.append(" ")
        else:
            out.append(c if depth == 0 else " ")
        i += 1
    return "".join(out)


def dollar_quotes_to_std(sql: str) -> str:
    """pg dollar-quoted literals ``$$...$$`` / ``$tag$...$tag$`` →
    standard single-quoted literals with '' escaping. Linear scan
    that respects ordinary single-quoted spans."""
    out = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i:j + 1])
            i = j + 1
            continue
        if c == "$":
            m = re.match(r"\$(\w*)\$", sql[i:])
            if m:
                closer = m.group(0)
                end = sql.find(closer, i + m.end())
                if end >= 0:
                    body = sql[i + m.end():end]
                    out.append("'" + body.replace("'", "''") + "'")
                    i = end + len(closer)
                    continue
        out.append(c)
        i += 1
    return "".join(out)


def translate_postgres(sql: str, schema_fn=None) -> str:
    """Normalize a Postgres-dialect query into Spark SQL.

    ``schema_fn(table) -> [col, ...] | None`` (optional, supplied by
    the engine) lets schema-aware rewrites — star REPLACE ordinal
    position — resolve table columns."""
    out = sql
    if "$" in out:
        out = dollar_quotes_to_std(out)
    # bit-string literals: a direct ::int cast folds to the numeric
    # value (pg bit→int); bare literals render as pg's text form
    # (B'1010' → '1010', X'1f' expands hex to bits)
    _INTTY = r"(?:int2|int4|int8|int|integer|bigint|smallint)\b"
    out = re.sub(
        r"\b[xX]'([0-9A-Fa-f]+)'\s*::\s*" + _INTTY,
        lambda m: str(int(m.group(1), 16)), out, flags=re.I,
    )
    out = re.sub(
        r"\b[bB]'([01]+)'\s*::\s*" + _INTTY,
        lambda m: str(int(m.group(1), 2)), out, flags=re.I,
    )
    out = re.sub(r"\b[bB]'([01]+)'", r"'\1'", out)
    out = re.sub(
        r"\b[xX]'([0-9A-Fa-f]+)'",
        lambda m: "'" + bin(int(m.group(1), 16))[2:]
        .zfill(4 * len(m.group(1))) + "'",
        out,
    )
    if "'" in out:
        # plain-literal backslashes double; E'..' prefixes drop
        out = _pg_string_literals(out)
    if '"' in out:
        out = _dquotes_to_backticks(out)
    # inheritance scoping: no child tables here — ONLY is a no-op
    out = re.sub(r"(?i)\b(FROM|JOIN)\s+ONLY\s+(?=[\w`\"])", r"\1 ",
                 out)
    # pg 12 CTE materialization hints are planner advice — Catalyst
    # makes its own call; strip them
    out = re.sub(r"(?i)\bAS\s+(?:NOT\s+)?MATERIALIZED\s*\(", "AS (",
                 out)
    # window frame EXCLUDE: NO OTHERS is the default (strip); the
    # real exclusions have no Spark frame equivalent — reject with
    # the workaround instead of a bare ParseException
    out = re.sub(r"(?i)\s+EXCLUDE\s+NO\s+OTHERS\b", "", out)
    if re.search(r"(?i)\bEXCLUDE\s+(?:CURRENT\s+ROW|GROUP\b|TIES\b)",
                 out):
        raise NotImplementedError(
            "window frame EXCLUDE CURRENT ROW/GROUP/TIES is not "
            "supported (Spark frames have no exclusion clause) — "
            "subtract the excluded rows' contribution explicitly, "
            "e.g. sum(v) OVER (frame) - v"
        )
    # FETCH FIRST n ROWS WITH TIES: peers of the n-th row stay —
    # a rank() window predicate (lowered by the QUALIFY rewrite below)
    out = re.sub(
        r"(?is)\bORDER\s+BY\s+(.+?)\s+"
        r"FETCH\s+FIRST\s+(\d+)\s+ROWS?\s+WITH\s+TIES\b",
        r"QUALIFY rank() OVER (ORDER BY \1) <= \2 ORDER BY \1",
        out,
    )
    out = _FETCH_FIRST_RE.sub(r"LIMIT \1", out)
    # full ANSI paging: OFFSET n ROWS [FETCH FIRST|NEXT m ROWS ONLY]
    # (the JPA/Hibernate pagination spelling) → LIMIT m OFFSET n;
    # count-less FETCH means 1 row
    out = re.sub(
        r"(?i)\bOFFSET\s+(\d+)\s+ROWS?"
        r"(?:\s+FETCH\s+(?:FIRST|NEXT)\s+(\d+)?\s*ROWS?\s+ONLY)?",
        lambda m: (f"LIMIT {m.group(2) or 1} OFFSET {m.group(1)}"
                   if re.search(r"(?i)FETCH", m.group(0))
                   else f"OFFSET {m.group(1)}"),
        out,
    )
    out = re.sub(r"(?i)\bFETCH\s+(?:FIRST|NEXT)\s+(\d+)?\s*ROWS?\s+ONLY",
                 lambda m: f"LIMIT {m.group(1) or 1}", out)
    out = re.sub(r"(?i)\bLIMIT\s+ALL\b", "", out)
    # ORDER BY expr USING < / USING > — operator-class direction
    if re.search(r"(?i)\bUSING\s*[<>]", out):
        out = re.sub(r"(?i)\bUSING\s*<(?![<=])", "ASC", out)
        out = re.sub(r"(?i)\bUSING\s*>(?![>=])", "DESC", out)
    if re.search(r"(?i)\bWITHIN\s+GROUP\b", out):
        out = _rewrite_hypothetical_set(out)
    out = _rewrite_pg_session_fns(out)
    out = _rewrite_at_time_zone(out)
    out = _rewrite_star_modifiers(out, schema_fn)
    out = _rewrite_array_literals(out)
    if "@@" in out or re.search(r"(?i)\bts_rank", out):
        out = _rewrite_tsearch(out)
    if "||" in out:
        out = _rewrite_array_elem_concat(out)
    if re.search(r"(?i)\b(?:ANY|SOME|ALL)\s*\(", out):
        from myduckserver_spark.functions.mysql_compat import (
            rewrite_pg_quantifiers,
        )

        out = rewrite_pg_quantifiers(out)
    out = _rewrite_duckdb_literals(out)
    out = _rewrite_json_ops(out)
    out = _rewrite_json_path_ops(out)
    if "||" in out or "-" in out:
        out = _rewrite_jsonb_value_ops(out)
    out = _rewrite_distinct_on(out)
    out = _rewrite_qualify(out)
    out = _rewrite_filter_over_window(out)
    out = _rewrite_functions(out)
    out = _rewrite_casts(out)
    if "^" in out:
        out = _rewrite_power_op(out)
    if "|/" in out or "@" in out:
        out = _rewrite_unary_math_ops(out)
    out = _rewrite_regex_ops(out)
    out = _rewrite_xor_op(out)
    out = _rewrite_subscripts(out)
    if re.search(r"(?i)\bOVER\b", out):
        from myduckserver_spark.functions.mysql_compat import (
            fix_orderless_ranking_windows,
        )

        out = fix_orderless_ranking_windows(out)
    return out
