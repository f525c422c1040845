"""Property-based tests (hypothesis) — the randomized layer of the
test strategy (SURVEY.md §5: the reference leans on a huge generated
conformance corpus; hypothesis plays that role here).

Two load-bearing invariants:
1. the statement parser round-trips arbitrary literals,
2. CDC apply of a whole batch == applying its events one at a time
   (condense is a pure optimization, never a semantic change).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st_

from myduckserver_spark.statements import parse_statement

# ---------------------------------------------------------- parser


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


_scalar = st_.one_of(
    st_.none(),
    st_.booleans(),
    st_.integers(min_value=-(2**62), max_value=2**62),
    st_.floats(allow_nan=False, allow_infinity=False, width=64),
    st_.text(
        alphabet=st_.characters(
            codec="utf-8", exclude_characters="\\\x00"
        ),
        max_size=40,
    ),
)


@given(st_.lists(st_.lists(_scalar, min_size=1, max_size=5), min_size=1,
                 max_size=4).filter(
                     lambda rows: len({len(r) for r in rows}) == 1))
@settings(max_examples=200, deadline=None)
def test_insert_values_roundtrip(rows):
    ncols = len(rows[0])
    cols = ", ".join(f"c{i}" for i in range(ncols))
    values = ", ".join(
        "(" + ", ".join(_sql_literal(v) for v in row) + ")" for row in rows
    )
    stmt = parse_statement(f"INSERT INTO t ({cols}) VALUES {values}")
    assert len(stmt.rows) == len(rows)
    for parsed, orig in zip(stmt.rows, rows):
        for p, o in zip(parsed, orig):
            if isinstance(o, float):
                # decimal literals parse EXACT (MySQL semantics:
                # 1.23 is a DECIMAL, not a DOUBLE); engine._py_cast
                # narrows per target column type
                assert float(p) == pytest.approx(o)
            elif isinstance(o, bool) or o is None or isinstance(o, int):
                assert p is o or p == o
            else:
                assert p == str(o)


# ---------------------------------------------------------- CDC

_pk = st_.integers(min_value=0, max_value=5)
_event = st_.tuples(
    _pk,
    st_.integers(min_value=0, max_value=2),      # action: del/upd/ins
    st_.integers(min_value=0, max_value=99),     # payload
)


def _binlogify(events):
    """Coerce an arbitrary event list into a VALID binlog stream: an
    INSERT only for an absent key, UPDATE/DELETE only for a live one
    (MySQL's PK constraint guarantees this upstream — the reference's
    insert-only direct-append fast path, delta/controller.go:150-190,
    is sound only under that invariant)."""
    live: set[int] = set()
    out = []
    for pk, action, v in events:
        if pk in live:
            action = 1 if action == 2 else action  # insert → update
            if action == 0:
                live.discard(pk)
        else:
            action = 2  # only an insert is legal for an absent key
            live.add(pk)
        out.append((pk, action, v))
    return out


@given(st_.lists(_event, min_size=1, max_size=12))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cdc_batch_equals_sequential_apply(spark, events):
    """apply(base, whole batch) == fold(apply, one event at a time).

    This is exactly the contract the reference's condense step must
    keep (delta/controller.go:654-697): batching is invisible."""
    from myduckserver_spark.operators.cdc import apply_cdc

    events = _binlogify(events)

    base = spark.createDataFrame([], "pk int, v int")

    def mk_delta(evts, seq0):
        rows = [
            (pk, v, action, "tag", bytearray(b"s"), "g", seq0 + i, 0)
            for i, (pk, action, v) in enumerate(evts)
        ]
        return spark.createDataFrame(
            rows,
            "pk int, v int, action tinyint, txn_tag string, "
            "txn_server binary, txn_group string, txn_seq long, "
            "txn_stmt long",
        )

    batched = apply_cdc(base, mk_delta(events, 0), ["pk"])

    seq = base
    for i, e in enumerate(events):
        seq = apply_cdc(seq, mk_delta([e], i), ["pk"])

    assert sorted(map(tuple, batched.collect())) == \
        sorted(map(tuple, seq.collect()))


# --------------------------------------------------------------- pg casts

_PG_TYPES = [
    "text", "int", "int4", "int8", "bigint", "smallint", "float8",
    "double precision", "numeric(10,2)", "numeric", "boolean", "date",
    "varchar(5)", "uuid", "int[]",
]

_ident = st_.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)


@given(
    ident=_ident,
    ty=st_.sampled_from(_PG_TYPES),
    depth=st_.integers(min_value=0, max_value=2),
)
@settings(max_examples=60, deadline=None)
def test_pg_cast_rewrite_balanced(ident, ty, depth):
    """translate_postgres on arbitrary `expr::type` chains always
    produces balanced parens, no leftover `::`, and a CAST per cast."""
    from myduckserver_spark.functions.pg_compat import translate_postgres

    expr = ident
    for _ in range(depth):
        expr = f"({expr} + 1)"
    src = f"SELECT {expr}::{ty} FROM t"
    out = translate_postgres(src)
    assert "::" not in out
    assert out.count("(") == out.count(")")
    assert out.upper().count("CAST") == 1
    assert ident in out


@given(
    ident=_ident,
    types=st_.lists(st_.sampled_from(_PG_TYPES[:8]), min_size=2, max_size=4),
)
@settings(max_examples=40, deadline=None)
def test_pg_cast_chains_nest(ident, types):
    from myduckserver_spark.functions.pg_compat import translate_postgres

    src = "SELECT " + ident + "".join(f"::{t}" for t in types) + " FROM t"
    out = translate_postgres(src)
    assert "::" not in out
    assert out.count("(") == out.count(")")
    assert out.upper().count("CAST(") == len(types)
