"""Core transform correctness vs the DuckDB oracle (sf0.001).

One test per SURVEY §2 core line: from/select/derive/filter/
aggregate/group/sort/take/join + language features.
"""

from __future__ import annotations

from prql_spark import compile_prql

from tests.conftest import assert_df_matches_sql


def run(catalog, prql):
    return compile_prql(prql, catalog)


def test_from_select(catalog, oracle):
    df = run(catalog, "from nation\nselect [n_name, n_regionkey]")
    assert_df_matches_sql(
        df, oracle, "SELECT n_name, n_regionkey FROM nation", sort=True
    )


def test_derive_arith(catalog, oracle):
    df = run(
        catalog,
        "from lineitem\n"
        "derive [disc_price = l_extendedprice * (1 - l_discount),\n"
        "        charged = l_extendedprice * (1 - l_discount) * (1 + l_tax)]\n"
        "select [l_orderkey, l_linenumber, disc_price, charged]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT l_orderkey, l_linenumber,"
        " l_extendedprice*(1-l_discount) AS disc_price,"
        " l_extendedprice*(1-l_discount)*(1+l_tax) AS charged"
        " FROM lineitem",
        sort=True,
    )


def test_filter_pushdown_and_dates(catalog, oracle):
    df = run(
        catalog,
        "from orders\n"
        "filter o_orderdate >= @1995-01-01 and o_totalprice > 100000\n"
        "select [o_orderkey, o_totalprice]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT o_orderkey, o_totalprice FROM orders"
        " WHERE o_orderdate >= TIMESTAMP '1995-01-01'"
        " AND o_totalprice > 100000",
        sort=True,
    )


def test_aggregate_global(catalog, oracle):
    df = run(
        catalog,
        "from lineitem\n"
        "aggregate [n = count, total = sum l_quantity,"
        " mx = max l_extendedprice, dsup = count_distinct l_suppkey]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT count(*) AS n, sum(l_quantity) AS total,"
        " max(l_extendedprice) AS mx,"
        " count(DISTINCT l_suppkey) AS dsup FROM lineitem",
    )


def test_group_aggregate(catalog, oracle):
    df = run(
        catalog,
        "from orders\n"
        "group [o_orderstatus] (\n"
        "  aggregate [n = count, avg_price = avg o_totalprice]\n"
        ")\nsort [o_orderstatus]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT o_orderstatus, count(*) AS n,"
        " avg(o_totalprice) AS avg_price"
        " FROM orders GROUP BY 1 ORDER BY 1",
    )


def test_sort_take(catalog, oracle):
    df = run(
        catalog,
        "from orders\nsort [-o_totalprice, o_orderkey]\ntake 10\n"
        "select [o_orderkey, o_totalprice]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT o_orderkey, o_totalprice FROM orders"
        " ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    )


def test_take_range_offset(catalog, oracle):
    df = run(
        catalog,
        "from orders\nsort [o_orderkey]\ntake 101..110\n"
        "select [o_orderkey]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT o_orderkey FROM orders ORDER BY o_orderkey"
        " LIMIT 10 OFFSET 100",
    )


def test_join_using(catalog, oracle):
    df = run(
        catalog,
        "from nation\njoin region [r_regionkey == n_regionkey]\n"
        "select [n_name, r_name]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT n_name, r_name FROM nation"
        " JOIN region ON r_regionkey = n_regionkey",
        sort=True,
    )


def test_join_left_alias(catalog, oracle):
    df = run(
        catalog,
        "from c=customer\n"
        "join side:left n=nation [n.n_nationkey == c.c_nationkey]\n"
        "select [c_name, n_name]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT c_name, n_name FROM customer c"
        " LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey",
        sort=True,
    )


def test_distinct_idiom(catalog, oracle):
    df = run(
        catalog,
        "from orders\nselect [o_orderstatus]\n"
        "group [o_orderstatus] (take 1)\nsort [o_orderstatus]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT DISTINCT o_orderstatus FROM orders ORDER BY 1",
    )


def test_group_sort_take_topk(catalog, oracle):
    # top order by price per status — group (sort, take 1)
    df = run(
        catalog,
        "from orders\n"
        "group [o_orderstatus] (\n  sort [-o_totalprice, o_orderkey]\n"
        "  take 1\n)\n"
        "select [o_orderstatus, o_orderkey, o_totalprice]\n"
        "sort [o_orderstatus]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT o_orderstatus, o_orderkey, o_totalprice FROM ("
        " SELECT *, row_number() OVER (PARTITION BY o_orderstatus"
        " ORDER BY o_totalprice DESC, o_orderkey) rn FROM orders) t"
        " WHERE rn = 1 ORDER BY o_orderstatus",
    )


def test_null_handling_coalesce(catalog, oracle):
    df = run(
        catalog,
        "from events\n"
        "derive [v = value ?? 0.0, isn = value == null]\n"
        "select [event_id, v, isn]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT event_id, coalesce(value, 0.0) AS v,"
        " value IS NULL AS isn FROM events",
        sort=True,
    )


def test_range_in_filter(catalog, oracle):
    df = run(
        catalog,
        "from part\nfilter (p_size | in 10..20)\nselect [p_partkey]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT p_partkey FROM part WHERE p_size BETWEEN 10 AND 20",
        sort=True,
    )


def test_fstring_concat(catalog, oracle):
    df = run(
        catalog,
        'from nation\nselect [tag = f"{n_name}-{n_regionkey}"]',
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT concat(n_name, '-', n_regionkey) AS tag FROM nation",
        sort=True,
    )


def test_sstring_escape_hatch(catalog, oracle):
    df = run(
        catalog,
        'from orders\nderive [yr = s"YEAR({o_orderdate})"]\n'
        "group [yr] (aggregate [n = count])\nsort [yr]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT year(o_orderdate) AS yr, count(*) AS n"
        " FROM orders GROUP BY 1 ORDER BY 1",
    )


def test_user_function_inline(catalog, oracle):
    df = run(
        catalog,
        "func pct part total -> (part / total) * 100\n"
        "from lineitem\n"
        "derive [p = (pct l_discount 1.0)]\n"
        "select [l_orderkey, l_linenumber, p]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT l_orderkey, l_linenumber,"
        " (l_discount / 1.0) * 100 AS p FROM lineitem",
        sort=True,
    )


def test_table_cte(catalog, oracle):
    df = run(
        catalog,
        "table big_orders = (\n  from orders\n"
        "  filter o_totalprice > 200000\n)\n"
        "from big_orders\n"
        "group [o_orderstatus] (aggregate [n = count])\n"
        "sort [o_orderstatus]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "WITH big_orders AS (SELECT * FROM orders WHERE"
        " o_totalprice > 200000) SELECT o_orderstatus, count(*) AS n"
        " FROM big_orders GROUP BY 1 ORDER BY 1",
    )


def test_cast_as(catalog, oracle):
    df = run(
        catalog,
        "from lineitem\n"
        "derive [qi = (l_quantity | as int)]\n"
        "select [l_orderkey, l_linenumber, qi]",
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT l_orderkey, l_linenumber,"
        " CAST(l_quantity AS INT) AS qi FROM lineitem",
        sort=True,
    )
