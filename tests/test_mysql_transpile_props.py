"""Property-based transpiler invariants (hypothesis).

1. The lexer round-trips arbitrary SQL-ish text byte-identically.
2. translate_mysql never alters the content of string literals.
3. Clean Spark-compatible SQL (no MySQL-only constructs) is a fixpoint.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from myduckserver_spark.functions.mysql_compat import translate_mysql
from myduckserver_spark.functions.mysql_lexer import render, tokenize

# Fragments that exercise the lexer: keywords, operators, quotes, numbers
_frag = st.sampled_from(
    [
        "SELECT", "FROM", "WHERE", "GROUP BY", "ORDER BY", "LIMIT 5, 10",
        "t1", "`weird col`", "a.b", "+", "-", "*", "/", "<=", "<=>", "!=",
        "42", "1.5e-3", "0x1F", "?", "@uvar", "@@sysvar", ",", "(", ")",
        "NOW()", "UCASE(x)", "-- comment\n", "/* block */", "\n", "  ",
        "'it''s'", "'back\\\\slash'", '"dquoted"', "'LIMIT 1, 2'",
        "'NOW() and UCASE(y)'", "STRAIGHT_JOIN", "CAST(a AS SIGNED)",
    ]
)


@given(st.lists(_frag, min_size=1, max_size=30))
@settings(max_examples=300, deadline=None)
def test_lexer_roundtrip(parts):
    sql = " ".join(parts)
    assert render(tokenize(sql)) == sql


@given(st.lists(_frag, min_size=1, max_size=30))
@settings(max_examples=300, deadline=None)
def test_string_literals_never_altered(parts):
    sql = " ".join(parts)
    toks = [t for t in tokenize(sql) if t.kind not in ("ws", "comment")]
    # literals ADJACENT TO AN ARITHMETIC OPERATOR are exempt: MySQL
    # coerces them to their numeric prefix ('3abc' + 1 = 4) and the
    # translator folds that at translate time (round 10)
    _ARITH = {"+", "-", "*", "/", "%"}

    def _arith_adjacent(k: int) -> bool:
        for nb in (k - 1, k + 1):
            if 0 <= nb < len(toks) and (
                (toks[nb].kind == "op" and toks[nb].text in _ARITH)
                or (toks[nb].kind == "word"
                    and toks[nb].text.upper() in ("DIV", "MOD"))
            ):
                return True
        return False

    before = [t.text for k, t in enumerate(toks)
              if t.kind == "str" and not _arith_adjacent(k)]
    after = [t.text for t in tokenize(translate_mysql(sql)) if t.kind == "str"]
    # every original literal must survive verbatim (rewrites may ADD
    # literals, e.g. date_format patterns, but never change existing ones)
    remaining = list(after)
    for lit in before:
        assert lit in remaining, f"literal {lit!r} altered in translation"
        remaining.remove(lit)


_clean = st.sampled_from(
    [
        "SELECT a, b FROM t WHERE x = 1",
        "SELECT count(*) AS n FROM t GROUP BY k ORDER BY n DESC LIMIT 10",
        "SELECT * FROM t1 JOIN t2 ON t1.id = t2.id",
        "SELECT 'string with NOW() inside' FROM t",
        "SELECT CAST(a AS DECIMAL(10,2)) FROM t",
        "WITH c AS (SELECT 1 AS x) SELECT x FROM c",
        "SELECT upper(name), lower(name) FROM users WHERE id IN (1, 2, 3)",
    ]
)


@given(_clean)
@settings(max_examples=50, deadline=None)
def test_clean_sql_is_fixpoint(sql):
    assert translate_mysql(sql) == sql
    # idempotence on anything it does rewrite
    once = translate_mysql("SELECT UCASE(x) FROM t LIMIT 2, 3")
    assert translate_mysql(once) == once
