"""MySQL <-> Postgres quote-style conversion.

The reference normalizes every MySQL query's string/identifier quoting
into Postgres form before handing it to its engine, and converts back
for results that must read as MySQL (reference:
transpiler/converter.go:52 NormalizeStrings, :172 DenormalizeStrings).
This module reproduces those semantics on top of the repo's MySQL
lexer (functions/mysql_lexer.py) — token decode/re-encode rather than
a character state machine, which keeps the quote logic in one place
and guarantees rewrites cannot fire inside the wrong literal kind.

Observable semantics (pinned by tests ported from
transpiler/converter_test.go):

MySQL -> PG (`normalize_strings`):
  * 'str' and "str" both become 'str' (MySQL double-quote-as-string).
  * MySQL backslash escapes are resolved: ``\\\\`` -> ``\\``,
    ``\\'`` -> quote char, any other ``\\c`` drops the backslash.
  * Doubled quote chars inside the literal collapse to one.
  * Re-encoding doubles single quotes only (PG standard strings).
  * `ident` -> "ident"; doubled backticks collapse; inner double
    quotes are NOT re-escaped (reference behavior, converter_test.go
    "f\"o'o" case).

PG -> MySQL (`denormalize_strings`):
  * 'str' stays a single-quoted string ('' stays '').
  * "ident" -> `ident`; doubled double-quotes collapse to one; inner
    backticks double.
"""

from __future__ import annotations

from .mysql_lexer import Tok, tokenize


def _decode_quoted(body: str, quote: str, backslash_escapes: bool) -> str:
    """Decode the inner text of a quoted literal: collapse doubled
    quote chars; optionally resolve MySQL backslash escapes (the
    backslash is consumed; only a doubled backslash survives)."""
    out: list[str] = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if backslash_escapes and c == "\\" and i + 1 < n:
            out.append(body[i + 1])  # \\ -> \, \' -> ', \c -> c
            i += 2
            continue
        if c == quote and i + 1 < n and body[i + 1] == quote:
            out.append(quote)
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _strip_quotes(text: str, quote: str) -> str:
    body = text[1:] if text.startswith(quote) else text
    return body[:-1] if body.endswith(quote) else body


def normalize_strings(sql: str) -> str:
    """MySQL quoting -> Postgres quoting (reference NormalizeStrings)."""
    out: list[Tok] = []
    for t in tokenize(sql):
        if t.kind == "str":
            quote = t.text[0]
            content = _decode_quoted(
                _strip_quotes(t.text, quote), quote, backslash_escapes=True
            )
            out.append(Tok("str", "'" + content.replace("'", "''") + "'"))
        elif t.kind == "bq":
            body = _strip_quotes(t.text, "`").replace("``", "`")
            # reference does not re-escape inner double quotes
            out.append(Tok("bq", '"' + body + '"'))
        else:
            out.append(t)
    return "".join(t.text for t in out)


def denormalize_strings(sql: str) -> str:
    """Postgres quoting -> MySQL quoting (reference DenormalizeStrings).

    Input is PG-flavored: double quotes delimit identifiers, single
    quotes strings, neither processes backslash escapes beyond what the
    reference's state machine tolerates (a lone backslash before the
    closing quote keeps the literal open, same as the reference)."""
    out: list[str] = []
    for t in tokenize(sql, ansi_quotes=True):
        if t.kind == "bq":
            # tokenize(ansi_quotes) re-emits "ident" as a backtick token
            body = _strip_quotes(t.text, "`").replace("``", "`")
            out.append("`" + body.replace("`", "``") + "`")
        elif t.kind == "str":
            out.append(t.text)  # single-quoted strings pass through
        else:
            out.append(t.text)
    return "".join(out)
