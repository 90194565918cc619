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


def test_derive_items_reference_earlier_items(catalog, oracle):
    # the reference README's flagship pattern (lateral aliases)
    df = compile_prql(
        "from lineitem\n"
        "derive [\n"
        "  net = l_extendedprice * (1 - l_discount),\n"
        "  gross = net * (1 + l_tax),\n"
        "]\n"
        "select [l_orderkey, l_linenumber, net, gross]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT l_orderkey, l_linenumber,"
        " l_extendedprice * (1 - l_discount) AS net,"
        " l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross"
        " FROM lineitem",
        sort=True,
    )


def test_select_items_reference_earlier_items(catalog, oracle):
    df = compile_prql(
        "from lineitem\n"
        "select [l_orderkey, l_linenumber, x = l_quantity + 1, y = x * 2]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT l_orderkey, l_linenumber, l_quantity + 1 AS x,"
        " (l_quantity + 1) * 2 AS y FROM lineitem",
        sort=True,
    )


def test_reference_readme_flagship(catalog, oracle):
    """The reference README's headline example (README.md, second
    code block), re-targeted: customer/orders as employees."""
    df = compile_prql(
        "from orders\n"
        "filter o_orderdate > @1994-01-01\n"
        "derive [\n"
        "  gross = o_totalprice + (o_totalprice ?? 0),\n"
        "  gross_cost = gross + 10,\n"
        "]\n"
        "filter gross_cost > 0\n"
        "group [o_orderstatus, o_orderpriority] (\n"
        "  aggregate [\n"
        "    avg_gross = round (avg gross) 2,\n"
        "    sum_gross_cost = round (sum gross_cost) 2,\n"
        "  ]\n"
        ")\n"
        "filter sum_gross_cost > 100000\n"
        'derive id = f"{o_orderstatus}_{o_orderpriority}"\n'
        "sort [sum_gross_cost, -o_orderpriority]\n"
        "take 1..20",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        """
        WITH d AS (
          SELECT o_orderstatus, o_orderpriority,
            o_totalprice + coalesce(o_totalprice, 0) AS gross,
            o_totalprice + coalesce(o_totalprice, 0) + 10 AS gross_cost
          FROM orders WHERE o_orderdate > TIMESTAMP '1994-01-01'),
        g AS (
          SELECT o_orderstatus, o_orderpriority,
            round(avg(gross), 2) AS avg_gross,
            round(sum(gross_cost), 2) AS sum_gross_cost
          FROM d WHERE gross_cost > 0
          GROUP BY o_orderstatus, o_orderpriority)
        SELECT o_orderstatus, o_orderpriority, avg_gross, sum_gross_cost,
               concat(o_orderstatus, '_', o_orderpriority) AS id
        FROM g WHERE sum_gross_cost > 100000
        ORDER BY sum_gross_cost, o_orderpriority DESC
        LIMIT 20
        """,
    )


def test_reference_variables_example(catalog, oracle):
    """book/src/examples/variables.md second example: agg → join →
    re-agg → select-with-alias-arith → take → derive."""
    df = compile_prql(
        "from lineitem\n"
        "group [l_orderkey] (\n"
        "  aggregate [order_value = sum l_extendedprice]\n"
        ")\n"
        "join orders [o_orderkey == l_orderkey]\n"
        "group [o_orderpriority] (\n"
        "  aggregate [avg_value = avg order_value]\n"
        ")\n"
        "select [o_orderpriority, value_k = avg_value / 1000]\n"
        "sort [o_orderpriority]\n"
        "take 10\n"
        "derive value = (round (value_k * 1000) 2)\n"
        "derive [value_k2 = round value_k 4]\n"
        "select [o_orderpriority, value_k2, value]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        """
        WITH ov AS (
          SELECT l_orderkey, sum(l_extendedprice) AS order_value
          FROM lineitem GROUP BY l_orderkey),
        j AS (
          SELECT o_orderpriority, avg(order_value) AS avg_value
          FROM ov JOIN orders ON o_orderkey = l_orderkey
          GROUP BY o_orderpriority)
        SELECT o_orderpriority,
               round(avg_value / 1000, 4) AS value_k2,
               round(avg_value / 1000 * 1000, 2) AS value
        FROM j ORDER BY o_orderpriority LIMIT 10
        """,
    )


def test_self_join_with_aliases(catalog, oracle):
    df = compile_prql(
        "from a=nation\n"
        "join b=nation [a.n_regionkey == b.n_regionkey]\n"
        "filter a.n_nationkey < b.n_nationkey\n"
        "select [x = a.n_name, y = b.n_name]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT a.n_name AS x, b.n_name AS y FROM nation a"
        " JOIN nation b ON a.n_regionkey = b.n_regionkey"
        " WHERE a.n_nationkey < b.n_nationkey",
        sort=True,
    )


def test_reference_employees_task1_shape(catalog, oracle):
    """book/src/examples/employees.md Task 1 re-targeted: agg → two
    joins (one left, named arg after positionals) → qualified group
    keys → final join → select."""
    df = compile_prql(
        "from lineitem\n"
        "group [l_orderkey] (\n"
        "  aggregate [ov = average l_extendedprice]\n"
        ")\n"
        "join o=orders [o_orderkey == l_orderkey]\n"
        "join c=customer [c_custkey == o_custkey] side:left\n"
        "group [c.c_nationkey, o.o_orderpriority] (\n"
        "  aggregate [avg_ov = round (average ov) 2]\n"
        ")\n"
        "join n=nation [n_nationkey == c_nationkey]\n"
        "select [n_name, o_orderpriority, avg_ov]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        """
        WITH ov AS (
          SELECT l_orderkey, avg(l_extendedprice) AS ov
          FROM lineitem GROUP BY l_orderkey),
        j AS (
          SELECT c.c_nationkey, o.o_orderpriority,
                 round(avg(ov.ov), 2) AS avg_ov
          FROM ov JOIN orders o ON o_orderkey = l_orderkey
          LEFT JOIN customer c ON c_custkey = o_custkey
          GROUP BY c.c_nationkey, o.o_orderpriority)
        SELECT n_name, o_orderpriority, avg_ov
        FROM j JOIN nation n ON n_nationkey = c_nationkey
        """,
        sort=True,
    )


def test_extended_transforms_in_prql(catalog, oracle):
    """Training-data operators as PRQL pipeline steps."""
    df = compile_prql(
        "from documents\n"
        "strip_boilerplate\n"
        "token_count text_col:text_clean\n"
        "split_by_hash key_col:doc_id\n"
        "group [split] (\n"
        "  aggregate [n = count, total_tokens = sum ws_tokens]\n"
        ")\n"
        "sort [split]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        """
        WITH c AS (
          SELECT doc_id,
            trim(regexp_replace(regexp_replace(text,
              '[^\\x20-\\x7E\\n\\t]', '', 'g'), '\\s+', ' ', 'g'))
              AS text_clean
          FROM documents),
        t AS (
          SELECT doc_id,
            CASE WHEN trim(text_clean) = '' THEN 0
              ELSE len(string_split_regex(trim(text_clean), '\\s+'))
              END AS ws_tokens,
            CASE WHEN substr(md5(concat('', CAST(doc_id AS VARCHAR))),
                        1, 4) < 'cccc' THEN 'train'
                 WHEN substr(md5(concat('', CAST(doc_id AS VARCHAR))),
                        1, 4) < 'e666' THEN 'val'
                 ELSE 'test' END AS split
          FROM c)
        SELECT split, count(*) AS n, sum(ws_tokens) AS total_tokens
        FROM t GROUP BY split ORDER BY split
        """,
    )


def test_sample_per_group_in_prql(catalog, oracle):
    """List-of-identifier named args (group_cols:[lang, source])."""
    df = compile_prql(
        "from documents\n"
        "sample_per_group group_cols:[lang, source] k:2 key_col:doc_id\n"
        "select [doc_id, lang, source]\n"
        "sort [doc_id]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        """
        SELECT doc_id, lang, source FROM (
          SELECT doc_id, lang, source,
            row_number() OVER (PARTITION BY lang, source
              ORDER BY md5(concat('', CAST(doc_id AS VARCHAR))),
                doc_id) AS rk
          FROM documents)
        WHERE rk <= 2 ORDER BY doc_id
        """,
    )


def test_extended_transform_bad_args(catalog):
    with pytest.raises(PrqlCompileError):
        compile_prql("from documents\nsplit_by_hash doc_id", catalog)


def test_user_func_shadows_extended(catalog):
    # a user `func lang_id` must win over the built-in operator
    df = compile_prql(
        "func lang_id x -> x + 1\n"
        "from nation\nderive [y = (lang_id n_nationkey)]\n"
        "select [n_nationkey, y]\ntake 3",
        catalog,
    )
    rows = df.collect()
    assert all(r.y == r.n_nationkey + 1 for r in rows)


def test_take_open_range(catalog, oracle):
    df = compile_prql(
        "from orders\nsort [o_orderkey]\ntake 1496..\nselect [o_orderkey]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT o_orderkey FROM orders ORDER BY o_orderkey OFFSET 1495",
    )


def test_filter_on_window_expr_qualify_lowering(catalog, oracle):
    # window function directly in filter: SQL forbids it in WHERE, so
    # the compiler materializes the condition (QUALIFY-style), filters,
    # and drops the helper column
    prql = """
from orders
sort [o_orderkey]
filter (lag 1 o_orderkey) == null
select [o_orderkey]
"""
    df = compile_prql(prql, catalog)
    assert df.columns == ["o_orderkey"]  # helper column dropped
    assert_df_matches_sql(
        df,
        oracle,
        """
        SELECT o_orderkey FROM (
          SELECT o_orderkey,
            lag(o_orderkey) OVER (ORDER BY o_orderkey) AS lg
          FROM orders) t
        WHERE lg IS NULL
        """,
    )


def test_aggregate_in_plain_filter_is_full_frame_window(catalog, oracle):
    # an aggregate outside `aggregate [...]` is a full-frame window
    # (PRQL semantics: `derive share = x / (sum x)`), so filtering on
    # one is the all-or-nothing QUALIFY case, not an error
    prql = "from orders\nfilter o_totalprice > (avg o_totalprice)\n" \
           "aggregate [n = count]"
    assert_df_matches_sql(
        compile_prql(prql, catalog),
        oracle,
        """
        SELECT CAST(count(*) AS BIGINT) AS n FROM (
          SELECT o_totalprice,
            avg(o_totalprice) OVER () AS a FROM orders) t
        WHERE o_totalprice > a
        """,
    )


def test_filter_on_window_expr_inside_group(catalog, oracle):
    # in-group variant: the window filter partitions by the group keys
    prql = """
from orders
group [o_custkey] (
  sort [o_orderdate, o_orderkey]
  filter (lag 1 o_orderkey) == null
)
select [o_custkey, o_orderkey]
sort [o_custkey]
"""
    assert_df_matches_sql(
        compile_prql(prql, catalog),
        oracle,
        """
        SELECT o_custkey, o_orderkey FROM (
          SELECT o_custkey, o_orderkey,
            lag(o_orderkey) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey) AS lg
          FROM orders) t
        WHERE lg IS NULL ORDER BY o_custkey
        """,
    )


def test_new_operators_prql_callable(catalog):
    """Round-3 operators compose as PRQL steps, including the
    list-of-literals named arg (bm25 query terms)."""
    df = compile_prql(
        "from documents\n"
        "repetition_flags\n"
        "filter passes_repetition\n"
        "gopher_quality_flags\n"
        "select [doc_id, passes_gopher]\n"
        "sort [doc_id]\n"
        "take 10",
        catalog,
    )
    rows = df.collect()
    assert len(rows) == 10 and {r.doc_id for r in rows} == set(range(10))

    ranked = compile_prql(
        'from documents\nbm25_rank query:["table", "scan"] top_n:5',
        catalog,
    ).collect()
    assert len(ranked) == 5
    assert [r.bm25 for r in ranked] == sorted(
        (r.bm25 for r in ranked), reverse=True
    )

    import pytest

    from prql_spark.compiler import PrqlCompileError

    # identifiers in list args resolve to their names (column-list
    # args like sample_per_group group_cols:[lang]); a computed
    # expression is still rejected
    with pytest.raises(PrqlCompileError, match="list of literals"):
        compile_prql(
            "from documents\nbm25_rank query:[1 + 2]", catalog
        )


def test_round4_operators_prql_callable(catalog):
    """quantile_buckets / tfidf_top_terms compose as PRQL steps."""
    df = compile_prql(
        "from documents\n"
        "quality_score\n"
        "quantile_buckets score_col:quality\n"
        "select [doc_id, bucket]\n"
        "sort [doc_id]\n"
        "take 20",
        catalog,
    )
    rows = df.collect()
    assert len(rows) == 20
    assert {r.bucket for r in rows} <= {"head", "middle", "tail"}

    kw = compile_prql(
        "from documents\ntfidf_top_terms k:2 min_df:5", catalog
    )
    assert kw.columns == ["doc_id", "term", "tf", "df", "tfidf", "rk"]
    assert all(r.rk <= 2 for r in kw.collect())

    ch = compile_prql(
        "from documents\nchunk_documents max_tokens:40 overlap:8\n"
        "filter chunk_id > 0\nselect [doc_id, chunk_id, chunk_tokens]\n"
        "take 10",
        catalog,
    ).collect()
    assert len(ch) == 10 and all(r.chunk_id > 0 for r in ch)


def test_collocations_in_prql(catalog):
    df = compile_prql(
        "from documents\ncollocations min_count:5 top_k:20", catalog
    )
    rows = df.collect()
    assert df.columns == ["w1", "w2", "n_ab", "pmi"]
    assert 0 < len(rows) <= 20
    assert [r.pmi for r in rows] == sorted(
        (r.pmi for r in rows), reverse=True
    )
