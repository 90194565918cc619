"""Window transform correctness vs DuckDB (SURVEY §2 #10, #23)."""

from __future__ import annotations

from prql_spark import compile_prql

from tests.conftest import assert_df_matches_sql


def test_expanding_running_total(catalog, oracle):
    df = compile_prql(
        "from orders\n"
        "group [o_custkey] (\n"
        "  sort [o_orderdate, o_orderkey]\n"
        "  window expanding:true (\n"
        "    derive [running = sum o_totalprice]\n"
        "  )\n"
        ")\n"
        "select [o_orderkey, running]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT o_orderkey, sum(o_totalprice) OVER ("
        " PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running"
        " FROM orders",
        sort=True,
    )


def test_rolling_average(catalog, oracle):
    df = compile_prql(
        "from orders\n"
        "sort [o_orderkey]\n"
        "window rolling:7 (\n"
        "  derive [sma = avg o_totalprice]\n"
        ")\n"
        "select [o_orderkey, sma]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT o_orderkey, avg(o_totalprice) OVER (ORDER BY o_orderkey"
        " ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sma"
        " FROM orders",
        sort=True,
    )


def test_rows_range_window(catalog, oracle):
    df = compile_prql(
        "from orders\n"
        "sort [o_orderkey]\n"
        "window rows:-2..2 (\n"
        "  derive [centered = avg o_totalprice]\n"
        ")\n"
        "select [o_orderkey, centered]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT o_orderkey, avg(o_totalprice) OVER (ORDER BY o_orderkey"
        " ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS centered"
        " FROM orders",
        sort=True,
    )


def test_lag_lead_rank(catalog, oracle):
    df = compile_prql(
        "from orders\n"
        "group [o_custkey] (\n"
        "  sort [o_orderdate, o_orderkey]\n"
        "  derive [\n"
        "    prev_price = lag 1 o_totalprice,\n"
        "    next_price = lead 1 o_totalprice,\n"
        "    rn = row_number,\n"
        "    rk = rank,\n"
        "  ]\n"
        ")\n"
        "select [o_orderkey, prev_price, next_price, rn, rk]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT o_orderkey,"
        " lag(o_totalprice, 1) OVER w AS prev_price,"
        " lead(o_totalprice, 1) OVER w AS next_price,"
        " row_number() OVER w AS rn,"
        " rank() OVER w AS rk"
        " FROM orders WINDOW w AS ("
        " PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)",
        sort=True,
    )


def test_first_last_in_group(catalog, oracle):
    df = compile_prql(
        "from orders\n"
        "group [o_custkey] (\n"
        "  sort [o_orderdate, o_orderkey]\n"
        "  derive [first_price = first o_totalprice]\n"
        ")\n"
        "select [o_orderkey, first_price]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT o_orderkey, first_value(o_totalprice) OVER ("
        " PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
        " AS first_price FROM orders",
        sort=True,
    )


def test_derive_group_agg_without_window(catalog, oracle):
    # aggregate fn in derive inside group, no window flags → whole-
    # partition value on every row
    df = compile_prql(
        "from lineitem\n"
        "group [l_orderkey] (\n"
        "  derive [order_total = sum l_extendedprice]\n"
        ")\n"
        "select [l_orderkey, l_linenumber, order_total]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT l_orderkey, l_linenumber, sum(l_extendedprice)"
        " OVER (PARTITION BY l_orderkey) AS order_total FROM lineitem",
        sort=True,
    )


def test_window_after_group_aggregate(catalog, oracle):
    # a sort BEFORE a group-aggregate orders by pre-aggregation
    # columns; a window AFTER the aggregate must not inherit that
    # ORDER BY (those columns no longer exist post-agg)
    df = compile_prql(
        "from orders\n"
        "sort [o_orderdate]\n"
        "group [o_orderstatus] (\n"
        "  aggregate [n = count]\n"
        ")\n"
        "derive [total = sum n]\n"
        "select [o_orderstatus, n, total]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "WITH g AS (SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n"
        " FROM orders GROUP BY o_orderstatus)"
        " SELECT o_orderstatus, n, sum(n) OVER () AS total FROM g",
        sort=True,
    )


def test_invoice_totals_shape(catalog, oracle):
    """The reference's own integration query (invoice_totals.prql,
    prql-compiler/tests/integration) re-targeted at orders/lineitem."""
    df = compile_prql(
        "from i=orders\n"
        "join ii=lineitem [l_orderkey == o_orderkey]\n"
        "derive [\n"
        "  month = s\"SUBSTR(CAST({i.o_orderdate} AS STRING), 1, 7)\",\n"
        "  day = s\"SUBSTR(CAST({i.o_orderdate} AS STRING), 1, 10)\",\n"
        "]\n"
        "group [month, day] (\n"
        "  aggregate [\n"
        "    num_orders = s\"COUNT(DISTINCT {i.o_orderkey})\",\n"
        "    num_items = sum ii.l_quantity,\n"
        "    total_price = sum (ii.l_extendedprice * (1 - ii.l_discount)),\n"
        "  ]\n"
        ")\n"
        "group [month] (\n"
        "  sort day\n"
        "  window expanding:true (\n"
        "    derive [running_total_num_items = sum num_items]\n"
        "  )\n"
        ")\n"
        "sort day\n"
        "derive [num_items_last_week = lag 7 num_items]\n"
        "select [day, num_orders, num_items, total_price,\n"
        "        running_total_num_items, num_items_last_week]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        """
        WITH daily AS (
          SELECT substr(CAST(i.o_orderdate AS VARCHAR), 1, 7) AS month,
                 substr(CAST(i.o_orderdate AS VARCHAR), 1, 10) AS day,
                 count(DISTINCT i.o_orderkey) AS num_orders,
                 sum(ii.l_quantity) AS num_items,
                 sum(ii.l_extendedprice * (1 - ii.l_discount)) AS total_price
          FROM orders i JOIN lineitem ii ON l_orderkey = o_orderkey
          GROUP BY 1, 2)
        SELECT day, num_orders, num_items, total_price,
               sum(num_items) OVER (PARTITION BY month ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS running_total_num_items,
               lag(num_items, 7) OVER (ORDER BY day)
                 AS num_items_last_week
        FROM daily ORDER BY day
        """,
        sort=True,
    )


def test_interval_range_window(catalog, oracle):
    """range: with interval edges → RANGE BETWEEN INTERVAL over a
    time-ordered window (7-day trailing revenue per customer)."""
    df = compile_prql(
        "from orders\n"
        "group [o_custkey] (\n"
        "  sort [o_orderdate]\n"
        "  window range:-7days..0days (\n"
        "    derive [trailing_7d = round (sum o_totalprice) 2]\n"
        "  )\n"
        ")\n"
        "select [o_orderkey, trailing_7d]",
        catalog,
    )
    assert_df_matches_sql(
        df,
        oracle,
        "SELECT o_orderkey, round(sum(o_totalprice) OVER ("
        " PARTITION BY o_custkey ORDER BY o_orderdate"
        " RANGE BETWEEN INTERVAL '7 days' PRECEDING"
        " AND INTERVAL '0 days' FOLLOWING), 2) AS trailing_7d"
        " FROM orders",
        sort=True,
    )
