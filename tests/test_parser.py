from __future__ import annotations

import pytest

from prql_spark.parser import PrqlParseError, parse
from prql_spark.plans.nodes import (
    Assign,
    Binary,
    ExprPipeline,
    FuncCall,
    Ident,
    Lit,
    ListExpr,
    RangeLit,
    SString,
    Unary,
)


def steps(src):
    return parse(src).pipeline.steps


def test_basic_pipeline():
    s = steps("from employees\nfilter age > 25\ntake 10")
    assert [x.name for x in s] == ["from", "filter", "take"]
    cond = s[1].args[0]
    assert isinstance(cond, Binary) and cond.op == ">"
    assert s[2].args[0] == Lit(10, "int")


def test_pipe_separator():
    s = steps("from t | select [a, b]")
    assert [x.name for x in s] == ["from", "select"]


def test_func_call_greedy_args():
    # `sum a * b` == sum(a * b): args are full expressions
    (d,) = steps("from t\naggregate [x = sum a * b]")[1].args
    item = d.items[0]
    assert isinstance(item, Assign)
    call = item.expr
    assert isinstance(call, FuncCall) and call.name == "sum"
    assert isinstance(call.args[0], Binary) and call.args[0].op == "*"


def test_leading_operator_ends_args():
    # `a - b` is subtraction, not a call with arg `-b`
    s = steps("from t\nderive [x = a - b]")
    item = s[1].args[0].items[0]
    assert isinstance(item.expr, Binary) and item.expr.op == "-"


def test_named_args_and_alias():
    s = steps("from e\njoin side:left p=positions [id==employee_id]")
    j = s[1]
    assert j.named["side"] == Ident("left")
    a = j.named["_assigns"][0]
    assert a.name == "p" and a.expr == Ident("positions")
    assert isinstance(j.args[0], ListExpr)


def test_sort_signs():
    s = steps("from t\nsort [-age, +name, tenure]")
    items = s[1].args[0].items
    assert isinstance(items[0], Unary) and items[0].op == "-"
    assert isinstance(items[1], Unary) and items[1].op == "+"
    assert items[2] == Ident("tenure")


def test_take_range():
    s = steps("from t\nsort x\ntake 101..110")
    r = s[2].args[0]
    assert r == RangeLit(Lit(101, "int"), Lit(110, "int"))


def test_date_literals_and_range_filter():
    s = steps("from events\nfilter (date | in @1776-07-04..@1787-09-17)")
    pipe = s[1].args[0]
    assert isinstance(pipe, ExprPipeline)
    rng = pipe.steps[1].args[0]
    assert rng.start == Lit("1776-07-04", "date")


def test_s_string_interpolation():
    s = steps('from t\nderive [m = s"STRFTIME(\'%Y\', {x.d})"]')
    ss = s[1].args[0].items[0].expr
    assert isinstance(ss, SString)
    assert ss.parts[0].startswith("STRFTIME")
    assert ss.parts[1] == Ident("x.d")


def test_nested_group_pipeline():
    s = steps("from t\ngroup [a] (\n  sort b\n  take 1\n)")
    g = s[1]
    inner = g.args[1]
    assert isinstance(inner, ExprPipeline)
    assert [x.name for x in inner.steps] == ["sort", "take"]


def test_func_def_and_table():
    q = parse(
        "func add a b -> a + b\n"
        "table big = (\n  from t\n  filter x > 0\n)\n"
        "from big\nderive [y = (add x 1)]"
    )
    assert "add" in q.func_defs
    assert q.tables[0].name == "big"
    assert q.func_defs["add"].pos_params == ["a", "b"]


def test_coalesce_operator():
    s = steps("from t\nderive [x = a ?? 0]")
    e = s[1].args[0].items[0].expr
    assert isinstance(e, Binary) and e.op == "??"


def test_comments_ignored():
    s = steps("from t  # comment\n# whole line\nselect [a]")
    assert [x.name for x in s] == ["from", "select"]


def test_parse_error_has_position():
    with pytest.raises(PrqlParseError):
        parse("from t\nselect [a,,b]")


def test_reference_integration_query_parses():
    src = open(
        "/root/reference/prql-compiler/tests/integration/queries/"
        "invoice_totals.prql"
    ).read()
    q = parse(src)
    assert [x.name for x in q.pipeline.steps] == [
        "from",
        "join",
        "derive",
        "group",
        "group",
        "sort",
        "derive",
    ]


def test_dialect_header_parsed_and_validated():
    q = parse("prql dialect:postgres version:1\n\nfrom t\ntake 10")
    assert q.dialect == "postgres"
    assert q.version == "1"
    assert parse("from t").dialect is None
    # parity: prql-compiler/src/ast/dialect.rs rejects unknown names
    with pytest.raises(PrqlParseError, match="unknown dialect"):
        parse("prql dialect:oracle\n\nfrom t")
    with pytest.raises(PrqlParseError, match="header key"):
        parse("prql flavor:x\n\nfrom t")


def test_trailing_s_or_f_identifier():
    # 's'/'f' as the final character must lex as an identifier, not
    # crash probing for an s-/f-string opener past end of input
    q = parse("from t\nselect s")
    assert q.pipeline.steps[-1].name == "select"
    q = parse("from t\nselect f")
    assert q.pipeline.steps[-1].args[0].name == "f"


def test_parser_never_raises_raw_exceptions():
    # fuzz: any input either parses or raises PrqlParseError with a
    # position — never IndexError/AttributeError/etc. (the lexer's
    # end-of-input s-string probe bug was exactly this class)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from prql_spark.parser import PrqlParseError

    alphabet = st.sampled_from(
        list("abs f\"'|[](){}=<>!.,:+-*/%@#\n\t0123456789_ ")
    )

    @settings(max_examples=400, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=60))
    def run(text):
        try:
            parse("from t\n" + text)
        except PrqlParseError:
            pass

    run()
