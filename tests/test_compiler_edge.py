"""Edge-case PRQL semantics vs DuckDB (fills SURVEY §2 gaps)."""

from __future__ import annotations

import pytest

from prql_spark import PrqlCompileError, compile_prql

from tests.conftest import assert_df_matches_sql


def test_join_right_side(catalog, oracle):
    df = compile_prql(
        "from orders\n"
        "join side:right c=customer [c_custkey == o_custkey]\n"
        "group [c_custkey] (aggregate [n = s\"COUNT({o_orderkey})\"])\n"
        "sort [c_custkey]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT c_custkey, count(o_orderkey) AS n FROM orders"
        " RIGHT JOIN customer ON c_custkey = o_custkey"
        " GROUP BY c_custkey ORDER BY c_custkey",
    )


def test_join_full_outer(catalog, oracle):
    df = compile_prql(
        "table big_cust = (\n  from customer\n  filter c_acctbal > 9000\n)\n"
        "table big_sup = (\n  from supplier\n  filter s_acctbal > 9000\n)\n"
        "from c=big_cust\n"
        "join side:full s=big_sup [s_nationkey == c_nationkey]\n"
        "select [c_custkey, s_suppkey]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "WITH big_cust AS (SELECT * FROM customer WHERE c_acctbal > 9000),"
        " big_sup AS (SELECT * FROM supplier WHERE s_acctbal > 9000)"
        " SELECT c_custkey, s_suppkey FROM big_cust c"
        " FULL JOIN big_sup s ON s_nationkey = c_nationkey",
        sort=True,
    )


def test_select_star_qualified(catalog, oracle):
    df = compile_prql(
        "from n=nation\n"
        "join r=region [r_regionkey == n_regionkey]\n"
        "select [n.*]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT n.* FROM nation n"
        " JOIN region r ON r_regionkey = n_regionkey",
        sort=True,
    )


def test_having_filter_after_group(catalog, oracle):
    df = compile_prql(
        "from lineitem\n"
        "group [l_suppkey] (\n"
        "  aggregate [total = round (sum l_extendedprice) 2, n = count]\n"
        ")\n"
        "filter n > 500\n"
        "sort [l_suppkey]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT l_suppkey, round(sum(l_extendedprice), 2) AS total,"
        " count(*) AS n FROM lineitem GROUP BY l_suppkey"
        " HAVING count(*) > 500 ORDER BY l_suppkey",
    )


def test_interval_date_arith(catalog, oracle):
    df = compile_prql(
        "from orders\n"
        "derive [due = o_orderdate + 30days]\n"
        "filter due < @1994-01-31\n"
        "select [o_orderkey, due]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT o_orderkey, o_orderdate + INTERVAL 30 DAY AS due"
        " FROM orders WHERE o_orderdate + INTERVAL 30 DAY"
        " < TIMESTAMP '1994-01-31'",
        sort=True,
    )


def test_take_range_inside_group(catalog, oracle):
    df = compile_prql(
        "from orders\n"
        "group [o_orderstatus] (\n"
        "  sort [-o_totalprice, o_orderkey]\n"
        "  take 2..3\n"
        ")\n"
        "select [o_orderstatus, o_orderkey]\n"
        "sort [o_orderstatus, o_orderkey]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT o_orderstatus, o_orderkey FROM ("
        " SELECT *, row_number() OVER (PARTITION BY o_orderstatus"
        " ORDER BY o_totalprice DESC, o_orderkey) rn FROM orders) t"
        " WHERE rn BETWEEN 2 AND 3 ORDER BY o_orderstatus, o_orderkey",
    )


def test_nested_function_composition(catalog, oracle):
    df = compile_prql(
        "func clamp lo hi x -> (least (greatest x lo) hi)\n"
        "from customer\n"
        "derive [bal = (clamp 0.0 5000.0 c_acctbal)]\n"
        "select [c_custkey, bal]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT c_custkey,"
        " least(greatest(c_acctbal, 0.0), 5000.0) AS bal FROM customer",
        sort=True,
    )


def test_in_list_membership(catalog, oracle):
    df = compile_prql(
        'from nation\nfilter (n_name | in ["NATION_3", "NATION_7"])\n'
        "select [n_nationkey, n_name]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT n_nationkey, n_name FROM nation"
        " WHERE n_name IN ('NATION_3', 'NATION_7')",
        sort=True,
    )


def test_prql_header_ignored(catalog, oracle):
    df = compile_prql(
        "prql dialect:spark\nfrom region\nselect [r_name]\nsort [r_name]",
        catalog,
    )
    assert_df_matches_sql(
        df, oracle, "SELECT r_name FROM region ORDER BY r_name"
    )


def test_chained_pipe_functions(catalog, oracle):
    df = compile_prql(
        "from nation\n"
        "select [x = (n_name | lower | trim | upper)]\nsort [x]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT upper(trim(lower(n_name))) AS x FROM nation ORDER BY x",
    )


def test_aggregate_sstring_mixed(catalog, oracle):
    df = compile_prql(
        "from lineitem\n"
        "group [l_returnflag] (\n"
        "  aggregate [\n"
        '    dbl_qty = s"round(sum({l_quantity} * 2), 1)",\n'
        "    n = count,\n"
        "  ]\n)\n"
        "sort [l_returnflag]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT l_returnflag,"
        " round(sum(l_quantity * 2), 1) AS dbl_qty, count(*) AS n"
        " FROM lineitem GROUP BY 1 ORDER BY 1",
    )


def test_error_on_window_in_aggregate(catalog):
    with pytest.raises(PrqlCompileError):
        compile_prql(
            "from orders\naggregate [x = row_number]", catalog
        ).collect()
