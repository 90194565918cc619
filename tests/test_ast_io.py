"""format / to_json / from_json parity (reference
prql-compiler/src/lib.rs:34-44, prql-python src/lib.rs:13-16).

The contract: formatting is semantics-preserving and idempotent
(parse(format(x)) == parse(x)); the JSON encoding is lossless
(from_json(to_json(x)) == parse(x)); and a JSON-loaded AST compiles
to the SAME SQL as the source it came from."""

from __future__ import annotations

import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

import __spark_entry__ as entry_mod
from prql_spark.ast_io import (
    format_prql,
    from_json,
    to_json,
)
from prql_spark.parser import parse

ALL_PRQL = {
    name: prql
    for name, (prql, _sql) in entry_mod._PRQL_QUERIES.items()
}

EXTRA = {
    "header": "prql dialect:postgres version:0.1\nfrom t\ntake 1",
    "func_default": "func add a b:2 -> a + b\nfrom t\nderive [x = (add y)]",
    "param": "from t\nfilter id == $1",
    "jinja": "from {{ ref('model') }}\ntake 5",
    "interval_range": (
        "from t\nwindow range:-7days..0days (derive [s = sum x])"
    ),
    "neg_null_range": "from t\nfilter x == -3.5 and y != null\ntake 2..4",
    "interp": (
        'from t\nderive [z = s"CAST({x} AS INT)", w = f"{a}-{b}"]'
    ),
    "sort_dirs": "from e=events\nsort [-ts, +user_id]\ntake 10",
}


@pytest.mark.parametrize("name", sorted(ALL_PRQL) + sorted(EXTRA))
def test_format_and_json_roundtrip(name):
    src = ALL_PRQL.get(name) or EXTRA[name]
    q0 = parse(src)
    formatted = format_prql(src)
    assert parse(formatted) == q0, formatted
    # idempotent: formatting its own output is a fixpoint
    assert format_prql(formatted) == formatted
    assert from_json(to_json(src)) == q0


def test_from_json_compiles_to_same_sql(catalog):
    """A JSON-loaded AST must emit byte-identical SQL to the source
    it was serialized from — the reference's from_json contract —
    across a dozen representative entries and two dialects."""
    from prql_spark.sql_backend import to_sql

    picked = sorted(ALL_PRQL)[:12]
    for name in picked:
        src = ALL_PRQL[name]
        q = from_json(to_json(src))
        for dialect in ("spark", "duckdb"):
            assert to_sql(q, catalog, dialect=dialect) == to_sql(
                src, catalog, dialect=dialect
            ), name


def test_from_json_compile_prql_runs(spark, catalog):
    """The JSON-AST path drives the DataFrame compiler end-to-end."""
    from prql_spark import compile_prql

    src = "from nation\nselect [n_name, n_nationkey]\nsort [n_name]\ntake 3"
    direct = compile_prql(src, catalog).collect()
    loaded = compile_prql(from_json(to_json(src)), catalog).collect()
    assert direct == loaded and len(direct) == 3


def test_from_json_rejects_non_query():
    with pytest.raises(ValueError, match="Query"):
        from_json('{"_type": "Ident", "name": "x"}')
    with pytest.raises(ValueError, match="unknown AST node"):
        from_json('{"_type": "Nope"}')


def test_format_drops_only_nonsemantic_trivia():
    """Comments and type annotations vanish (the parser does not
    retain them — reference v0 behavior); everything semantic
    survives."""
    src = (
        "# a comment\n"
        "func temp<float> c<int> -> c * 1.8 + 32\n"
        "from t  # trailing comment\n"
        "derive [f = (temp x)]\n"
    )
    out = format_prql(src)
    assert "#" not in out and "<" not in out
    assert parse(out) == parse(src)


@settings(max_examples=200, deadline=None)
@given(v=st.text(alphabet="\"'\nab ", max_size=10))
@example(v="a'b\"")  # r6 ADVICE shape: both quote kinds, ends with "
@example(v='a"b\'')
@example(v="'\"")
@example(v='a""')
def test_quote_lexes_back_exactly(v):
    """_quote output must lex back to the exact value (the lexer has
    no escapes and terminates at the FIRST closing run, so trailing
    quote chars are the hazard shape)."""
    from prql_spark.ast_io import _quote
    from prql_spark.parser import _lex_quoted

    try:
        q = _quote(v)
    except ValueError:
        # only genuinely unrepresentable shapes may raise: BOTH
        # triple forms blocked (and such values can never come from
        # a parse — the lexer cannot produce them)
        assert '"""' in v or v.endswith('"')
        assert "'''" in v or v.endswith("'")
        return
    inner, nxt = _lex_quoted(q, 0)
    assert inner == v, (v, q)
    assert nxt == len(q), (v, q)


@settings(max_examples=60, deadline=None)
@given(v=st.text(alphabet="\"'ab ", min_size=1, max_size=8))
@example(v="a'b\"")
def test_string_literal_format_roundtrip(v):
    """End-to-end: a pipeline holding a nasty string literal survives
    parse → format → parse unchanged."""
    from prql_spark.ast_io import _quote

    try:
        lit = _quote(v)
    except ValueError:
        return
    src = f"from t\nfilter s == {lit}\ntake 1"
    q0 = parse(src)
    assert parse(format_prql(src)) == q0, format_prql(src)


def test_reference_integration_query_roundtrips():
    """The reference repo's own integration query (the most complex
    PRQL in its test suite) survives format and JSON roundtrips."""
    src = open(
        "/root/reference/prql-compiler/tests/integration/queries/"
        "invoice_totals.prql"
    ).read()
    q0 = parse(src)
    assert parse(format_prql(src)) == q0
    assert format_prql(format_prql(src)) == format_prql(src)
    assert from_json(to_json(src)) == q0
