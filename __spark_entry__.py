"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship measure query on sf0.001.
`queries()` — one callable per implemented operator (SURVEY.md §2 measure
semantics + the LLM-pipeline operators in yardstick_spark.llm).
`oracle_sql()` — equivalent ANSI SQL for DuckDB over the same parquet
views.  Names/aliases match the Spark side exactly; float measures are
rounded identically on both sides so the value-hash compare is stable.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_SESSIONS: dict = {}


def _ys(spark: SparkSession, sf_dir: str):
    """Register parquet views + measure views once per (session, dir)."""
    key = (id(spark), sf_dir)
    if key in _SESSIONS:
        return _SESSIONS[key]
    from yardstick_spark import MeasureSession

    # events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
    # rejects; read nanos as long and convert to a timestamp column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            df = spark.read.parquet(p)
            if t == "events" and dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn(
                    "ts",
                    __import__("pyspark.sql.functions", fromlist=["expr"]).expr(
                        "timestamp_micros(ts div 1000)"
                    ),
                )
            df.createOrReplaceTempView(t)
    ys = MeasureSession(spark)
    ys.collect_warnings = False
    ys.sql(
        "CREATE OR REPLACE VIEW lineitem_m AS SELECT "
        "l_returnflag, l_linestatus, YEAR(l_shipdate) AS d_year, "
        "MONTH(l_shipdate) AS ship_month, "
        "SUM(l_extendedprice * (1 - l_discount)) AS MEASURE revenue, "
        "SUM(l_quantity) AS MEASURE total_qty, "
        "COUNT(*) AS MEASURE line_count, "
        "revenue / total_qty AS MEASURE rev_per_unit "
        "FROM lineitem"
    )
    ys.sql(
        "CREATE OR REPLACE VIEW lineitem_nd AS SELECT "
        "l_returnflag, l_linestatus, YEAR(l_shipdate) AS d_year, "
        "COUNT(DISTINCT l_suppkey) AS MEASURE supp_count, "
        "MEDIAN(l_quantity) AS MEASURE med_qty "
        "FROM lineitem"
    )
    ys.sql(
        "CREATE OR REPLACE VIEW orders_m AS SELECT "
        "o_orderkey, o_orderstatus, o_orderpriority, "
        "YEAR(o_orderdate) AS d_year, "
        "SUM(o_totalprice) AS MEASURE order_rev, "
        "COUNT(*) AS MEASURE order_count "
        "FROM orders"
    )
    ys.sql(
        "CREATE OR REPLACE VIEW star_m AS SELECT n.n_name AS nation, "
        "YEAR(o.o_orderdate) AS d_year, "
        "SUM(o.o_totalprice) AS MEASURE srev "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey"
    )
    ys.sql(
        "CREATE OR REPLACE VIEW orders_w AS SELECT "
        "o_orderstatus, "
        "SUM(o_totalprice) OVER (PARTITION BY o_orderstatus) "
        "AS MEASURE status_total "
        "FROM orders"
    )
    ys.sql(
        "CREATE OR REPLACE VIEW lineitem_rl AS SELECT *, "
        "AVG(l_extendedprice) AS MEASURE avg_price FROM lineitem"
    )
    _SESSIONS[key] = ys
    return ys


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue share-of-total via AT (ALL) on sf0.001."""
    ys = _ys(spark, "/root/testdata/sf0.001")
    return ys.sql(
        "SELECT d_year, l_returnflag, "
        "ROUND(AGGREGATE(revenue), 2) AS rev, "
        "ROUND(AGGREGATE(revenue) AT (ALL l_returnflag), 2) AS year_total, "
        "ROUND(AGGREGATE(revenue) / AGGREGATE(revenue) AT (ALL) * 100, 4) AS pct "
        "FROM lineitem_m GROUP BY d_year, l_returnflag"
    )


# ---------------------------------------------------------------------------
# measure-engine queries: name -> measure SQL (run through MeasureSession)
# ---------------------------------------------------------------------------

_MEASURE_QUERIES: dict[str, str] = {
    "m_agg_basic": (
        "SELECT l_returnflag, l_linestatus, "
        "ROUND(AGGREGATE(revenue), 2) AS revenue, "
        "ROUND(AGGREGATE(total_qty), 2) AS total_qty, "
        "AGGREGATE(line_count) AS line_count "
        "FROM lineitem_m GROUP BY l_returnflag, l_linestatus"
    ),
    "m_grand_total": (
        "SELECT ROUND(AGGREGATE(revenue), 2) AS revenue, "
        "AGGREGATE(line_count) AS line_count FROM lineitem_m"
    ),
    "m_at_all_share": (
        "SELECT l_returnflag, ROUND(AGGREGATE(revenue), 2) AS rev, "
        "ROUND(AGGREGATE(revenue) AT (ALL), 2) AS total_rev, "
        "ROUND(AGGREGATE(revenue) / AGGREGATE(revenue) AT (ALL) * 100, 4) AS pct "
        "FROM lineitem_m GROUP BY l_returnflag"
    ),
    "m_at_all_dim": (
        "SELECT d_year, l_returnflag, ROUND(AGGREGATE(revenue), 2) AS rev, "
        "ROUND(AGGREGATE(revenue) AT (ALL l_returnflag), 2) AS year_total "
        "FROM lineitem_m GROUP BY d_year, l_returnflag"
    ),
    "m_at_where": (
        "SELECT d_year, ROUND(AGGREGATE(revenue), 2) AS rev, "
        "ROUND(AGGREGATE(revenue) AT (WHERE l_returnflag = 'R'), 2) AS returned_rev "
        "FROM lineitem_m GROUP BY d_year"
    ),
    "m_at_set_yoy": (
        "SELECT d_year, ROUND(AGGREGATE(revenue), 2) AS rev, "
        "ROUND(AGGREGATE(revenue) AT (SET d_year = d_year - 1), 2) AS prev_rev "
        "FROM lineitem_m GROUP BY d_year"
    ),
    "m_at_visible": (
        "SELECT l_returnflag, ROUND(AGGREGATE(revenue) AT (VISIBLE), 2) AS vis_rev, "
        "ROUND(AGGREGATE(revenue) AT (ALL), 2) AS all_rev "
        "FROM lineitem_m WHERE d_year >= 1997 GROUP BY l_returnflag"
    ),
    "m_at_chained": (
        "SELECT d_year, l_returnflag, l_linestatus, "
        "ROUND(AGGREGATE(revenue), 2) AS rev, "
        "ROUND(AGGREGATE(revenue) AT (ALL l_returnflag l_linestatus), 2) AS year_total, "
        "ROUND(AGGREGATE(revenue) AT (ALL l_returnflag) AT (ALL l_linestatus), 2) "
        "AS year_total_chained "
        "FROM lineitem_m GROUP BY d_year, l_returnflag, l_linestatus"
    ),
    "m_at_all_month": (
        "SELECT l_returnflag, ship_month, ROUND(AGGREGATE(revenue), 2) AS rev, "
        "ROUND(AGGREGATE(revenue) AT (ALL ship_month), 2) AS flag_total "
        "FROM lineitem_m GROUP BY l_returnflag, ship_month"
    ),
    "m_derived_ratio": (
        "SELECT l_returnflag, ROUND(AGGREGATE(rev_per_unit), 4) AS rev_per_unit "
        "FROM lineitem_m GROUP BY l_returnflag"
    ),
    "m_implicit_default": (
        "SELECT l_returnflag, total_qty "
        "FROM lineitem_m WHERE d_year = 1998 GROUP BY l_returnflag"
    ),
    "m_having": (
        "SELECT d_year, ROUND(AGGREGATE(revenue), 2) AS rev "
        "FROM lineitem_m GROUP BY d_year "
        "HAVING AGGREGATE(revenue) > 40000000"
    ),
    "m_multifact": (
        "SELECT l.d_year AS d_year, ROUND(AGGREGATE(revenue), 2) AS rev, "
        "ROUND(AGGREGATE(order_rev), 2) AS orev "
        "FROM lineitem_m l JOIN orders_m o ON l.d_year = o.d_year "
        "GROUP BY l.d_year"
    ),
    "m_fanout_immunity": (
        "SELECT o.o_orderpriority AS prio, "
        "ROUND(AGGREGATE(order_rev), 2) AS orev, "
        "COUNT(*) AS joined_rows "
        "FROM orders_m o JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "GROUP BY o.o_orderpriority"
    ),
    "m_nd_count_distinct": (
        "SELECT l_returnflag, AGGREGATE(supp_count) AS supp_count "
        "FROM lineitem_nd GROUP BY l_returnflag"
    ),
    "m_nd_median": (
        "SELECT l_returnflag, ROUND(AGGREGATE(med_qty), 2) AS med_qty "
        "FROM lineitem_nd GROUP BY l_returnflag"
    ),
    "m_nd_at_all": (
        "SELECT l_returnflag, AGGREGATE(supp_count) AS supp_count, "
        "AGGREGATE(supp_count) AT (ALL) AS supp_total "
        "FROM lineitem_nd GROUP BY l_returnflag"
    ),
    "m_cte": (
        "WITH yearly AS (SELECT d_year, ROUND(AGGREGATE(revenue), 2) AS rev "
        "FROM lineitem_m GROUP BY d_year) "
        "SELECT COUNT(*) AS n_years, ROUND(SUM(rev), 2) AS total FROM yearly"
    ),
    "m_groupby_all": (
        "SELECT l_returnflag, l_linestatus, ROUND(AGGREGATE(revenue), 2) AS rev "
        "FROM lineitem_m GROUP BY ALL"
    ),
    "m_topk": (
        "SELECT d_year, ROUND(AGGREGATE(revenue), 2) AS rev "
        "FROM lineitem_m GROUP BY d_year ORDER BY rev DESC LIMIT 3"
    ),
    "m_rollup": (
        "SELECT d_year, l_returnflag, ROUND(AGGREGATE(revenue), 2) AS rev "
        "FROM lineitem_m GROUP BY ROLLUP(d_year, l_returnflag)"
    ),
    "m_cube": (
        "SELECT d_year, l_returnflag, ROUND(AGGREGATE(revenue), 2) AS rev "
        "FROM lineitem_m GROUP BY CUBE(d_year, l_returnflag)"
    ),
    # SET with a constant pin (A6 shape: corpus-covered, now driver-
    # oracled): every group reads the 1998 value
    "m_at_set_const": (
        "SELECT d_year, ROUND(AGGREGATE(revenue), 2) AS rev, "
        "ROUND(AGGREGATE(revenue) AT (SET d_year = 1998), 2) AS rev_98 "
        "FROM lineitem_m GROUP BY d_year"
    ),
    # derived-measure recursion under a grand-total context
    "m_derived_at_all": (
        "SELECT l_returnflag, ROUND(AGGREGATE(rev_per_unit), 4) AS rpu, "
        "ROUND(AGGREGATE(rev_per_unit) AT (ALL), 4) AS rpu_all "
        "FROM lineitem_m GROUP BY l_returnflag"
    ),
    # star-schema semantic view: the body JOINS fact to dims under
    # aliases; contexts recompute from the joined base (qualified refs)
    "m_star_join": (
        "SELECT nation, ROUND(AGGREGATE(srev), 2) AS rev, "
        "ROUND(AGGREGATE(srev) AT (ALL), 2) AS tot "
        "FROM star_m GROUP BY nation"
    ),
    "m_grouping_sets": (
        "SELECT d_year, l_returnflag, ROUND(AGGREGATE(revenue), 2) AS rev "
        "FROM lineitem_m "
        "GROUP BY GROUPING SETS ((d_year, l_returnflag), (d_year), ())"
    ),
    "m_window_measure": (
        "SELECT o_orderstatus, "
        "ROUND(AGGREGATE(status_total) AT (WHERE o_orderstatus = 'F'), 2) "
        "AS f_total FROM orders_w GROUP BY o_orderstatus"
    ),
    "m_row_level_listing12": (
        "SELECT l.l_orderkey AS okey, l.l_linenumber AS lineno "
        "FROM lineitem_rl l "
        "WHERE l.l_extendedprice > "
        "1.9 * l.avg_price AT (WHERE l_returnflag = l.l_returnflag)"
    ),
    # plain-SQL passthrough (no measures) — the engine surface must run
    # ordinary analytics unchanged; TPC-H-shaped classics
    "tpch_q1": (
        "SELECT l_returnflag, l_linestatus, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "ROUND(AVG(l_quantity), 4) AS avg_qty, "
        "ROUND(AVG(l_discount), 6) AS avg_disc, "
        "COUNT(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "tpch_q3": (
        "SELECT l.l_orderkey AS okey, "
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue, "
        "CAST(o.o_orderdate AS STRING) AS odate "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
        "AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00' "
        "GROUP BY l.l_orderkey, o.o_orderdate "
        "ORDER BY revenue DESC, okey LIMIT 10"
    ),
    "tpch_q5": (
        "SELECT n.n_name AS nation, "
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue "
        "FROM customer c "
        "JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "AND c.c_nationkey = s.s_nationkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE r.r_name = 'ASIA' "
        "AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
        "GROUP BY n.n_name"
    ),
    "tpch_q6": (
        "SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue "
        "FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ),
    # q4-shaped: EXISTS semi-join (testdata lacks l_commitdate; "late"
    # = any line shipped >60 days after the order date)
    "tpch_q4": (
        "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders o "
        "WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00' "
        "AND EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) "
        "GROUP BY o_orderpriority"
    ),
    # q7: two-nation shipping volume by year (5-way join, OR predicate)
    "tpch_q7": (
        "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
        "YEAR(l.l_shipdate) AS l_year, "
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume "
        "FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey "
        "JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey "
        "JOIN nation sn ON s.s_nationkey = sn.n_nationkey "
        "JOIN nation cn ON c.c_nationkey = cn.n_nationkey "
        "WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2') "
        "OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')) "
        "GROUP BY sn.n_name, cn.n_name, YEAR(l.l_shipdate)"
    ),
    # q10: returned-item customer ranking
    "tpch_q10": (
        "SELECT c.c_custkey AS custkey, c.c_name AS cname, "
        "CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) / 100.0 AS DOUBLE) AS revenue, "
        "ROUND(c.c_acctbal, 2) AS acctbal, n.n_name AS nation "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00' "
        "AND l.l_returnflag = 'R' "
        "GROUP BY c.c_custkey, c.c_name, ROUND(c.c_acctbal, 2), n.n_name "
        "ORDER BY revenue DESC, custkey LIMIT 20"
    ),
    # q14: promo revenue share (conditional aggregation over a fact-dim join)
    "tpch_q14": (
        "SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO' "
        "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) "
        "/ SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' "
        "AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'"
    ),
    # q18: large-volume orders (IN subquery with HAVING)
    "tpch_q18": (
        # round-5 form joined raw lineitem BACK against the
        # qualifying-orders CTE and re-aggregated — but the CTE's
        # per-order SUM(l_quantity) IS the output quantity (GROUP BY
        # keys are unique per order), so the second lineitem
        # scan+shuffle+agg was pure duplication.  One lineitem
        # aggregate (the query's only fact exchange), HAVING shrinks
        # it to ~dozens of rows, then orders and customer attach as
        # joins AQE broadcasts.  10x: 1.7 s / 4 exchanges / 2 fact
        # scans -> 0.8 s / 3 exchanges / 1 fact scan, identical rows;
        # the exchange count is now the join graph's minimum (1 fact
        # agg + broadcasts + top-k).
        "WITH osum AS (SELECT l_orderkey AS bokey, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty FROM lineitem "
        "GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) "
        "SELECT c.c_name AS cname, c.c_custkey AS custkey, "
        "o.o_orderkey AS okey, CAST(o.o_orderdate AS STRING) AS odate, "
        "ROUND(o.o_totalprice, 2) AS total, sum_qty "
        "FROM osum JOIN orders o ON o.o_orderkey = bokey "
        "JOIN customer c ON c.c_custkey = o.o_custkey "
        "ORDER BY total DESC, okey LIMIT 100"
    ),
    # q19: OR-of-ANDs pushdown across a fact-dim join
    "tpch_q19": (
        "SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 "
        "AND l.l_quantity BETWEEN 1 AND 11) "
        "OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25 "
        "AND l.l_quantity BETWEEN 10 AND 20) "
        "OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35 "
        "AND l.l_quantity BETWEEN 20 AND 30)"
    ),
    # q8-shaped: nation market share inside a region by year
    # (integer-cents sums so the share is order-independent)
    "tpch_q8": (
        "SELECT o_year, ROUND(SUM(CASE WHEN nation = 'NATION_3' "
        "THEN cents ELSE 0 END) / SUM(cents), 6) AS mkt_share "
        "FROM (SELECT YEAR(o.o_orderdate) AS o_year, "
        "CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) "
        "AS BIGINT) AS cents, sn.n_name AS nation "
        "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer cu ON cu.c_custkey = o.o_custkey "
        "JOIN nation cn ON cu.c_nationkey = cn.n_nationkey "
        "JOIN region r ON cn.n_regionkey = r.r_regionkey "
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "JOIN nation sn ON s.s_nationkey = sn.n_nationkey "
        "WHERE r.r_name = 'ASIA') t "
        "GROUP BY o_year"
    ),
    # q13: customer order-count distribution (outer join + double agg)
    "tpch_q13": (
        "SELECT c_count, COUNT(*) AS custdist "
        "FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count "
        "FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey "
        "AND o.o_orderpriority <> '1-URGENT' "
        "GROUP BY c.c_custkey) t "
        "GROUP BY c_count"
    ),
    # q15: top supplier by period revenue (CTE + scalar-subquery max)
    "tpch_q15": (
        "WITH rev AS (SELECT l_suppkey AS suppkey, "
        "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) "
        "AS BIGINT)) AS total_cents "
        "FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' "
        "GROUP BY l_suppkey) "
        "SELECT s.s_suppkey AS suppkey, s.s_name AS sname, "
        "CAST(r.total_cents / 100.0 AS DOUBLE) AS total_revenue "
        "FROM supplier s JOIN rev r ON s.s_suppkey = r.suppkey "
        "WHERE r.total_cents = (SELECT MAX(total_cents) FROM rev)"
    ),
    # q17-shaped: small-quantity-order revenue (correlated scalar
    # subquery per part)
    "tpch_q17": (
        "SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) "
        "AS BIGINT)) AS DOUBLE) / 700.0 AS avg_yearly "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE p.p_brand = 'Brand#5' "
        "AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) "
        "FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)"
    ),
    # windowed running total per customer (integer-cents sum so the
    # window fold is order-independent across engines)
    "ops_window_running": (
        "SELECT o_custkey AS custkey, o_orderkey AS okey, "
        "CAST(o_orderdate AS STRING) AS odate, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) "
        "OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "ROWS UNBOUNDED PRECEDING) / 100.0 AS DOUBLE) AS running_total "
        "FROM orders WHERE o_custkey < 100"
    ),
    # cumulative distinct users per event_type (Spark has no
    # COUNT(DISTINCT) OVER: SUM of first-occurrence counts instead —
    # the standard rewrite, one extra keyed aggregate, no state blowup)
    "ops_window_distinct": (
        "WITH firsts AS ( "
        "  SELECT event_type, user_id, MIN(CAST(ts AS DATE)) AS fd "
        "  FROM events GROUP BY event_type, user_id), "
        "newu AS (SELECT event_type, fd AS day, COUNT(*) AS new_users "
        "         FROM firsts GROUP BY event_type, fd), "
        "daily AS (SELECT event_type, CAST(ts AS DATE) AS day, "
        "                 COUNT(DISTINCT user_id) AS daily_users "
        "          FROM events GROUP BY event_type, CAST(ts AS DATE)) "
        "SELECT d.event_type, CAST(d.day AS STRING) AS day, "
        "       d.daily_users, "
        "       CAST(SUM(COALESCE(n.new_users, 0)) OVER ( "
        "         PARTITION BY d.event_type ORDER BY d.day "
        "         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users "
        "FROM daily d LEFT JOIN newu n "
        "  ON n.event_type = d.event_type AND n.day = d.day "
        "ORDER BY d.event_type, day"
    ),
    # ordered-set aggregates (PERCENTILE_CONT normalization path)
    "ops_percentiles": (
        "SELECT l_returnflag, "
        "ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity), 4) "
        "AS p50_qty, "
        "ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY l_quantity), 4) "
        "AS p90_qty, "
        "ROUND(MIN(l_quantity), 2) AS min_qty, "
        "ROUND(MAX(l_quantity), 2) AS max_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    # q22-shaped: above-average balance customers with no urgent orders
    # (scalar subquery + anti-join; testdata lacks c_phone)
    "tpch_q22": (
        "SELECT n.n_name AS nation, COUNT(*) AS numcust, "
        "ROUND(SUM(c.c_acctbal), 2) AS totacctbal "
        "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer "
        "WHERE c_acctbal > 0.0) "
        "AND NOT EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderpriority = '1-URGENT') "
        "GROUP BY n.n_name"
    ),
    # q2-shaped: cheapest supplier per part within a region (testdata has
    # no partsupp — per-unit price from lineitem, exact in cents).
    # The REPARTITION(l_partkey) hint makes ONE exchange serve both the
    # (partkey, suppkey) aggregate (ClusteredDistribution is satisfied
    # by the subset key) and the partkey window — Catalyst cannot reuse
    # the default plan's two exchanges because their keys differ.
    # Trade: the exchange ships raw 4-column rows instead of map-side
    # combined ones (~7.5 rows per (partkey, suppkey) in TPC-H), but
    # drops a whole exchange + stage barrier; measured 1.06 s -> 0.85 s
    # at sf0.1 and the slim projection keeps shuffle bytes comparable.
    "tpch_q2": (
        "WITH cost AS (SELECT l_partkey AS partkey, l_suppkey AS suppkey, "
        "MIN(CAST(ROUND(l_extendedprice / l_quantity * 100, 0) AS BIGINT)) "
        "AS min_cents FROM (SELECT /*+ REPARTITION(l_partkey) */ "
        "l_partkey, l_suppkey, l_extendedprice, l_quantity FROM lineitem) "
        "GROUP BY l_partkey, l_suppkey), "
        "best AS (SELECT partkey, suppkey, min_cents, "
        "MIN(min_cents) OVER (PARTITION BY partkey) AS best_cents "
        "FROM cost) "
        "SELECT p.p_partkey AS partkey, p.p_name AS pname, "
        "MIN(s.s_suppkey) AS suppkey, "
        "CAST(c.best_cents / 100.0 AS DOUBLE) AS unit_cost "
        "FROM best c "
        "JOIN supplier s ON s.s_suppkey = c.suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "JOIN part p ON p.p_partkey = c.partkey "
        "WHERE c.min_cents = c.best_cents "
        "AND r.r_name = 'ASIA' AND p.p_size <= 20 "
        "GROUP BY p.p_partkey, p.p_name, c.best_cents "
        "ORDER BY unit_cost DESC, partkey LIMIT 50"
    ),
    # q9-shaped: profit by supplier nation and order year (no
    # ps_supplycost in testdata — revenue stands in for profit)
    "tpch_q9": (
        "SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS o_year, "
        "CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) "
        "* 100, 0) AS BIGINT)) / 100.0 AS DOUBLE) AS profit "
        "FROM lineitem l "
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "JOIN part p ON p.p_partkey = l.l_partkey "
        "JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "WHERE p.p_name LIKE '%e%' "
        "GROUP BY n.n_name, YEAR(o.o_orderdate)"
    ),
    # q11-shaped: parts whose one-nation shipped value exceeds a fraction
    # of that nation's total (scalar subquery over a reused CTE)
    "tpch_q11": (
        "WITH val AS (SELECT l.l_partkey AS partkey, "
        "SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS cents "
        "FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "WHERE n.n_name = 'NATION_3' GROUP BY l.l_partkey) "
        "SELECT partkey, CAST(cents / 100.0 AS DOUBLE) AS value "
        "FROM (SELECT partkey, cents, "
        "SUM(cents) OVER () AS total_cents FROM val) "
        "WHERE cents > total_cents * 0.001 "
        "ORDER BY value DESC, partkey"
    ),
    # q12-shaped: order-priority class counts per returnflag (testdata
    # has no l_shipmode/l_receiptdate — priority classes stand in).
    # CAST AS BIGINT: DuckDB's SUM over INT is HUGEINT, whose driver-side
    # rendering differs from Spark's BIGINT; ORDER BY pins row order —
    # the same discipline every other TPC-H entry applies (was the one
    # red CORRECTNESS_r03 row).
    "tpch_q12": (
        "SELECT l.l_returnflag AS rflag, "
        "CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
        "WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
        "GROUP BY l.l_returnflag ORDER BY rflag"
    ),
    # q16-shaped: distinct supplier count per part attribute, excluding
    # a supplier set via NOT IN (anti-join on a subquery)
    "tpch_q16": (
        "SELECT p.p_brand AS brand, p.p_type AS ptype, "
        "p.p_size AS psize, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE p.p_brand <> 'Brand#1' "
        "AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22) "
        "AND l.l_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0) "
        "GROUP BY p.p_brand, p.p_type, p.p_size "
        "ORDER BY supplier_cnt DESC, brand, ptype, psize"
    ),
    # q20-shaped: suppliers who shipped an outsized share of a part
    # family in a year (nested semi-join over a decorrelated average)
    "tpch_q20": (
        "WITH ship AS (SELECT l_suppkey AS suppkey, l_partkey AS partkey, "
        "SUM(l_quantity) AS qty FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
        "GROUP BY l_suppkey, l_partkey), "
        "partavg AS (SELECT l_partkey AS partkey, AVG(l_quantity) AS avg_qty "
        "FROM lineitem GROUP BY l_partkey) "
        "SELECT s.s_suppkey AS suppkey, s.s_name AS sname "
        "FROM supplier s WHERE s.s_suppkey IN "
        "(SELECT sh.suppkey FROM ship sh "
        "JOIN partavg pa ON sh.partkey = pa.partkey "
        "JOIN part p ON p.p_partkey = sh.partkey "
        "WHERE p.p_name LIKE 'small%' AND sh.qty > 2 * pa.avg_qty) "
        "ORDER BY suppkey"
    ),
    # q21-shaped: suppliers late on multi-supplier orders where no other
    # supplier was late (EXISTS + NOT EXISTS; lateness = shipped more
    # than 60 days after order date, testdata has no receipt/commit dates)
    "tpch_q21": (
        # EXISTS/NOT-EXISTS collapsed into ONE per-order-supplier
        # aggregate over ONE fact pass.  Round-5 still scanned
        # lineitem twice (ostat + the l1 probe side) with a distinct
        # aggregate costing a double exchange.  Key insight: the
        # waiting supplier IS a row of the per-(order, supplier)
        # aggregate (late = 1 on an order with n_supp >= 2, n_late =
        # 1), so no separate l1 join is needed.  The explicit
        # REPARTITION(l_orderkey) below the aggregate makes ONE
        # okey-clustered shuffle serve the (okey, skey) groupBy
        # (subset-clustering satisfies it) AND the per-okey windows —
        # Spark's default would shuffle on (okey, skey) and again on
        # okey for the window.  Trade documented: the repartition
        # forgoes map-side partial-agg combining, a small factor for
        # (order, supplier) grain (<= 7 lines) vs a whole extra fact
        # shuffle.  10x: 2.9 s / 3 fact exchanges / 2 fact scans ->
        # 0.8 s / 1 fact exchange / 1 fact scan, identical rows.  The
        # DuckDB oracle keeps the textbook EXISTS form as the spec.
        "WITH src AS (SELECT /*+ REPARTITION(l_orderkey) */ "
        "l_orderkey, l_suppkey, "
        "CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY "
        "THEN 1 ELSE 0 END AS is_late "
        "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
        "WHERE o_orderstatus = 'F'), "
        "per AS (SELECT l_orderkey AS okey, l_suppkey AS skey, "
        "MAX(is_late) AS late FROM src GROUP BY l_orderkey, l_suppkey), "
        "stat AS (SELECT skey, late, "
        "COUNT(*) OVER (PARTITION BY okey) AS n_supp, "
        "SUM(late) OVER (PARTITION BY okey) AS n_late FROM per) "
        "SELECT s.s_name AS sname, COUNT(*) AS numwait "
        "FROM stat JOIN supplier s ON s.s_suppkey = skey "
        "WHERE late = 1 AND n_supp >= 2 AND n_late = 1 "
        "GROUP BY s.s_name "
        "ORDER BY numwait DESC, sname LIMIT 20"
    ),
    # PIVOT (wide conditional aggregation; the oracle spells it as
    # CASE sums — integer cents keep the hash stable)
    "ops_pivot": (
        "SELECT d_year, CAST(a / 100.0 AS DOUBLE) AS rev_a, "
        "CAST(n / 100.0 AS DOUBLE) AS rev_n, "
        "CAST(r / 100.0 AS DOUBLE) AS rev_r "
        "FROM (SELECT * FROM (SELECT YEAR(l_shipdate) AS d_year, "
        "l_returnflag, CAST(ROUND(l_extendedprice * (1 - l_discount) "
        "* 100, 0) AS BIGINT) AS cents FROM lineitem) "
        "PIVOT (SUM(cents) FOR l_returnflag IN ('A' AS a, 'N' AS n, "
        "'R' AS r)))"
    ),
    # UNPIVOT: wide-to-long over a conditional aggregate (identical
    # standard syntax in both engines; labels are the column names)
    "ops_unpivot": (
        "WITH wide AS (SELECT YEAR(l_shipdate) AS d_year, "
        "CAST(SUM(CASE WHEN l_returnflag = 'A' THEN "
        "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) ELSE 0 END) "
        "/ 100.0 AS DOUBLE) AS flag_a, "
        "CAST(SUM(CASE WHEN l_returnflag = 'N' THEN "
        "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) ELSE 0 END) "
        "/ 100.0 AS DOUBLE) AS flag_n, "
        "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN "
        "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) ELSE 0 END) "
        "/ 100.0 AS DOUBLE) AS flag_r "
        "FROM lineitem GROUP BY YEAR(l_shipdate)) "
        "SELECT d_year, flag, amount FROM wide "
        "UNPIVOT (amount FOR flag IN (flag_a, flag_n, flag_r))"
    ),
    # named-WINDOW clause with rank/offset/distribution functions over a
    # total per-partition order (deterministic across engines)
    "ops_window_funcs": (
        "SELECT o_custkey AS custkey, o_orderkey AS okey, "
        "DENSE_RANK() OVER w AS drnk, "
        "NTILE(4) OVER w AS quartile, "
        "LAG(o_orderkey, 1, -1) OVER w AS prev_okey, "
        "LEAD(o_orderkey, 1, -1) OVER w AS next_okey, "
        "FIRST_VALUE(o_orderkey) OVER w AS first_okey "
        "FROM orders WHERE o_custkey < 50 "
        "WINDOW w AS (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey)"
    ),
}

# new round-3 entries run ahead of the already-driver-green block so they
# land inside the driver's correctness window on their first round
_R3_FIRST = [
    "tpch_q2", "tpch_q9", "tpch_q11", "tpch_q12",
    "tpch_q16", "tpch_q20", "tpch_q21",
    "m_cube", "ops_pivot", "ops_window_funcs", "ops_unpivot",
    "m_grouping_sets", "m_star_join", "m_at_set_const", "m_derived_at_all",
]


def _measure_runner(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ys(spark, sf_dir).sql(sql)

    return run


# ---------------------------------------------------------------------------
# LLM-pipeline operators (DataFrame API)
# ---------------------------------------------------------------------------


def _docs(spark, sf_dir):
    _ys(spark, sf_dir)
    return spark.table("documents")


def _q_dedup_exact(spark, sf_dir):
    from yardstick_spark.llm import exact_dedup

    return exact_dedup(_docs(spark, sf_dir)).select(
        "doc_id", "content_hash", "keep_id", "is_duplicate"
    )


def _q_dedup_ngram(spark, sf_dir):
    from yardstick_spark.llm import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), k=5, threshold=0.8)


def _q_dedup_minhash(spark, sf_dir):
    from yardstick_spark.llm import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _docs(spark, sf_dir), k=5, num_hashes=32, bands=8, threshold=0.5
    )


def _q_dedup_lines(spark, sf_dir):
    # CCNet-style line-level boilerplate removal with reassembly
    from yardstick_spark.llm import remove_duplicate_lines

    return remove_duplicate_lines(_docs(spark, sf_dir), min_docs=2)


def _q_dedup_lines_incr(spark, sf_dir):
    # clean an ingest batch (doc_id % 5 == 0) against a PERSISTED
    # line-frequency store built from the rest of the corpus — the
    # production ingest shape; the corpus text is never re-read
    import hashlib
    import tempfile
    from pathlib import Path

    from yardstick_spark.llm import (
        remove_duplicate_lines_incremental, save_line_frequencies,
    )

    docs = _docs(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = str(Path(tempfile.gettempdir()) / f"ys_linefreq_{tag}")
    if not (Path(path) / "line_freqs" / "_SUCCESS").exists():
        save_line_frequencies(docs.filter("doc_id % 5 != 0"), path)
    return remove_duplicate_lines_incremental(
        docs.filter("doc_id % 5 = 0"), spark, path, min_docs=2)


def _q_split_leakage(spark, sf_dir):
    # near-dup pairs crossing train/val/test split boundaries
    from yardstick_spark.llm import split_leakage

    return split_leakage(_docs(spark, sf_dir), _SPLIT_W, k=5,
                         threshold=0.8)


def _q_leakage_safe_split(spark, sf_dir):
    # remediation: split by dup-cluster representative, so no near-dup
    # family straddles a split boundary
    from yardstick_spark.llm import leakage_safe_split, minhash_lsh_pairs

    docs = _docs(spark, sf_dir)
    return leakage_safe_split(docs, _SPLIT_W, minhash_lsh_pairs(docs))


def _q_dedup_survivorship(spark, sf_dir):
    # ER survivorship: merged metadata per near-dup family
    from yardstick_spark.llm import dedup_survivorship, minhash_lsh_pairs

    docs = _docs(spark, sf_dir)
    return dedup_survivorship(docs, minhash_lsh_pairs(docs))


def _q_events_dedup_window(spark, sf_dir):
    # telemetry double-fire debounce: same user+type within 120s of
    # the previous event
    from yardstick_spark.operators import dedup_events_window

    _ys(spark, sf_dir)
    return dedup_events_window(spark.table("events"), tolerance_s=120)


def _q_dedup_source_matrix(spark, sf_dir):
    # which sources copy from each other: near-dup pairs attributed to
    # (source, source) cells
    from yardstick_spark.llm import dedup_source_matrix, minhash_lsh_pairs

    docs = _docs(spark, sf_dir)
    return dedup_source_matrix(docs, minhash_lsh_pairs(docs))


def _q_text_mojibake(spark, sf_dir):
    # encoding-artifact screen (mojibake / replacement / control chars)
    from yardstick_spark.llm import mojibake_score

    return mojibake_score(_docs(spark, sf_dir))


def _q_dedup_keep_best(spark, sf_dir):
    # quality-based canonical choice: keep the LONGEST cluster member
    from yardstick_spark.llm import dedup_keep_best, minhash_lsh_pairs

    docs = _docs(spark, sf_dir)
    return dedup_keep_best(docs, minhash_lsh_pairs(docs),
                           score_col="n_chars")


def _q_token_budget(spark, sf_dir):
    # fill a fixed token budget with the highest-quality documents
    from yardstick_spark.llm import token_budget_select

    return token_budget_select(_docs(spark, sf_dir), budget=15000)


def _q_dedup_simhash(spark, sf_dir):
    from yardstick_spark.llm import simhash64

    return simhash64(_docs(spark, sf_dir))


def _q_dedup_clusters(spark, sf_dir):
    # pairs -> connected components -> per-doc (cluster_id, keep) verdict
    from yardstick_spark.llm import dedup_assign, minhash_lsh_pairs

    docs = _docs(spark, sf_dir)
    return dedup_assign(docs, minhash_lsh_pairs(docs))


def _q_dedup_simhash_pairs(spark, sf_dir):
    # banded pigeonhole candidates + bit_count(xor) verify; the oracle
    # is the quadratic filter (exactness of the banding for d<=3 means
    # both must produce identical pair sets)
    from yardstick_spark.llm import simhash_pairs

    return simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


def _q_dedup_embedding(spark, sf_dir):
    # embedding-cosine near-dup: LSH-bucketed candidates, exact-cosine
    # verified at threshold 0.4 (synthetic corpus max cosine ~0.51)
    from yardstick_spark.llm import embedding_dedup_pairs

    _ys(spark, sf_dir)
    # hyperplane signs adapt to size(vec) inside the bucket UDF; the
    # oracle hardcodes the fixture's dim=64 on its side
    return embedding_dedup_pairs(spark.table("embeddings"), threshold=0.4)


def _q_knn(spark, sf_dir):
    from yardstick_spark.llm import brute_force_knn

    _ys(spark, sf_dir)
    emb = spark.table("embeddings")
    return brute_force_knn(emb, emb.filter("vec_id < 5"), k=10)


def _q_knn_lsh(spark, sf_dir):
    from yardstick_spark.llm import lsh_bucketed_knn

    _ys(spark, sf_dir)
    emb = spark.table("embeddings")
    return lsh_bucketed_knn(emb, emb.filter("vec_id < 5"), k=10)


def _q_knn_lsh_persisted(spark, sf_dir):
    # probe a PERSISTED bucket-partitioned LSH index: bit-identical to
    # sim_knn_lsh (same sidecar planes) but the corpus scan is
    # partition-pruned to the probed buckets — the build-once/
    # probe-many production path
    import hashlib
    import tempfile
    from pathlib import Path

    from yardstick_spark.llm import knn_lsh_from_index, save_lsh_index

    _ys(spark, sf_dir)
    emb = spark.table("embeddings")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = str(Path(tempfile.gettempdir()) / f"ys_lsh_idx_{tag}")
    # build-once/probe-many is the operator's contract: rebuild only
    # when no index exists for this (immutable) sf_dir — repeated
    # correctness/bench runs then measure the probe, not the build
    if not (Path(path) / "_lsh_meta.json").exists():
        save_lsh_index(emb, path, n_planes=8)
    return knn_lsh_from_index(spark, path, emb.filter("vec_id < 5"),
                              k=10)


def _q_knn_lsh_multiprobe(spark, sf_dir):
    # multi-probe: each query also searches the buckets reached by
    # flipping its 2 least-confident sign bits; the oracle re-derives
    # the same probe set from the same literal hyperplanes
    from yardstick_spark.llm import lsh_bucketed_knn

    _ys(spark, sf_dir)
    emb = spark.table("embeddings")
    return lsh_bucketed_knn(emb, emb.filter("vec_id < 5"), k=10, n_probes=3)


def _q_knn_ivf(spark, sf_dir):
    # Deterministically seeded IVF (min-id-per-hash-bucket centroids):
    # same probe structure/cost as the k-means build, but closed-form,
    # so the DuckDB oracle reproduces the identical index.
    from yardstick_spark.llm import ivf_knn_seeded

    _ys(spark, sf_dir)
    emb = spark.table("embeddings")
    return ivf_knn_seeded(emb, emb.filter("vec_id < 5"), k=10,
                          n_lists=8, n_probe=3)


def _q_tokens(spark, sf_dir):
    from yardstick_spark.llm import token_stats

    return token_stats(_docs(spark, sf_dir))


def _q_quality(spark, sf_dir):
    from yardstick_spark.llm import quality_score

    return quality_score(_docs(spark, sf_dir))


_PII_AUG = (
    "concat(text, ' reach user', doc_id, '@mail.example or call "
    "+1 555 867 5309 host 192.168.', doc_id % 256, '.7')"
)


def _q_text_gopher(spark, sf_dir):
    from yardstick_spark.llm import gopher_filter

    return gopher_filter(_docs(spark, sf_dir), min_stop_hits=1)


def _q_text_pii(spark, sf_dir):
    # augment the synthetic corpus with deterministic doc_id-derived
    # PII so the redaction regexes are actually exercised
    from pyspark.sql import functions as F

    from yardstick_spark.llm import pii_redact

    aug = _docs(spark, sf_dir).withColumn("text", F.expr(_PII_AUG))
    return pii_redact(aug)


def _q_text_topterms(spark, sf_dir):
    from yardstick_spark.llm import top_terms

    return top_terms(_docs(spark, sf_dir))


# benchmark split for decontamination: every 10th src0 doc is the
# held-out eval set, everything else is the training corpus
_BENCH_PRED = "source = 'src0' AND doc_id % 10 = 0"


def _q_text_decontaminate(spark, sf_dir):
    from yardstick_spark.llm import decontaminate

    docs = _docs(spark, sf_dir)
    return decontaminate(
        docs.filter(f"NOT ({_BENCH_PRED})"),
        docs.filter(_BENCH_PRED),
        n=4,
    )


def _q_text_repetition(spark, sf_dir):
    from yardstick_spark.llm import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


def _q_text_source_quota(spark, sf_dir):
    from yardstick_spark.llm import source_quota

    return source_quota(_docs(spark, sf_dir), per_source=10)


def _q_text_tfidf(spark, sf_dir):
    from yardstick_spark.llm import tfidf_terms

    return tfidf_terms(_docs(spark, sf_dir), top_k=3)


_RET_QUERY = "spark join window query"
_RET_QUERY2 = "table scan filter data"


def _q_ret_bm25(spark, sf_dir):
    # Okapi BM25 top-10 for a fixed literal query — scan-side tf via
    # array HOFs, one 1-row broadcast stats agg, TakeOrdered top-k;
    # no corpus-sized shuffle (yardstick_spark/llm/retrieval.py)
    from yardstick_spark.llm import bm25_scores

    return bm25_scores(_docs(spark, sf_dir), _RET_QUERY, top_k=10)


def _q_ret_rrf(spark, sf_dir):
    # reciprocal-rank fusion of two BM25 top-15 lists (bounded inputs;
    # two contributions per doc sum commutatively, so the float fold
    # is order-independent)
    from yardstick_spark.llm import bm25_scores, rrf_fuse

    docs = _docs(spark, sf_dir)
    return rrf_fuse(
        [bm25_scores(docs, _RET_QUERY, top_k=15),
         bm25_scores(docs, _RET_QUERY2, top_k=15)],
        top_k=10,
    )


def _q_ret_hybrid(spark, sf_dir):
    # hybrid first-stage retrieval: BM25 lexical top-15 fused with
    # embedding-cosine top-15 (folded single-scan kNN, query vector
    # rides the Arrow closure); the 1-row collect of the query vector
    # is bounded by construction
    from yardstick_spark.llm import hybrid_search

    _ys(spark, sf_dir)
    docs = spark.table("documents")
    emb = spark.table("embeddings")
    qv = emb.filter("vec_id = 7").collect()[0].embedding
    return hybrid_search(docs, emb, _RET_QUERY, qv, top_k=10, fetch_k=15)


def _q_ret_bm25_indexed(spark, sf_dir):
    # BM25 against a PERSISTED term-bucket-partitioned inverted index:
    # bit-identical to ret_bm25 (same stats, query-order float fold)
    # but the scan is partition-pruned to the query terms' buckets —
    # the build-once/query-many production path (same contract as
    # sim_knn_lsh_persisted: rebuild only when no index exists for
    # this immutable sf_dir)
    import hashlib
    import tempfile
    from pathlib import Path

    from yardstick_spark.llm import bm25_search_index, save_bm25_index

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    # v2: postings/dfs split layout (incremental-update support)
    path = str(Path(tempfile.gettempdir()) / f"ys_bm25v2_idx_{tag}")
    if not (Path(path) / "_bm25_meta.json").exists():
        save_bm25_index(_docs(spark, sf_dir), path)
    return bm25_search_index(spark, path, _RET_QUERY, top_k=10)


def _q_ret_bm25_incremental(spark, sf_dir):
    # incremental index maintenance: build on the first corpus slice,
    # fold the rest in with update_bm25_index (postings append + tiny
    # df rewrite + integer stat addition) — scores must equal the full
    # rebuild, so this shares ret_bm25's oracle too
    import hashlib
    import tempfile
    from pathlib import Path

    from yardstick_spark.llm import (bm25_search_index, save_bm25_index,
                                     update_bm25_index)

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = str(Path(tempfile.gettempdir()) / f"ys_bm25v2_inc_{tag}")
    if not (Path(path) / "_bm25_meta.json").exists():
        docs = _docs(spark, sf_dir)
        save_bm25_index(docs.filter("doc_id % 3 != 0"), path)
        update_bm25_index(docs.filter("doc_id % 3 = 0"), path)
    return bm25_search_index(spark, path, _RET_QUERY, top_k=10)


def _q_emb_decontaminate(spark, sf_dir):
    # benchmark-contamination screen: corpus vectors (vec_id >= 20)
    # max-cosine against the "benchmark" slice (vec_id < 20) riding
    # the Arrow closure — one corpus scan, map-side verdicts, nothing
    # corpus-sized shuffles (yardstick_spark/llm/similarity.py)
    from yardstick_spark.llm import semantic_decontaminate

    _ys(spark, sf_dir)
    emb = spark.table("embeddings")
    return semantic_decontaminate(
        emb.filter("vec_id >= 20"), emb.filter("vec_id < 20"),
        threshold=0.9)


def _q_ret_eval(spark, sf_dir):
    # retrieval-quality evaluation as a first-class operator: the LSH
    # retriever graded against brute-force ground truth — per-query
    # recall@10 and MRR over the two bounded top-k lists
    from yardstick_spark.llm import (brute_force_knn, lsh_bucketed_knn,
                                     retrieval_eval)

    _ys(spark, sf_dir)
    emb = spark.table("embeddings")
    q = emb.filter("vec_id < 5")
    return retrieval_eval(lsh_bucketed_knn(emb, q, k=10),
                          brute_force_knn(emb, q, k=10))


def _q_dedup_semantic(spark, sf_dir):
    # SemDeDup: cluster-scoped embedding near-dup pairs (one cell per
    # vector via deterministic seeded centroids, all-pairs cosine
    # within the cell only) — the clustered-space complement of the
    # banded-LSH dedup_embedding entry
    from yardstick_spark.llm import semantic_dedup_pairs

    _ys(spark, sf_dir)
    return semantic_dedup_pairs(spark.table("embeddings"),
                                threshold=0.3, n_lists=8)


def _q_text_mixture_weights(spark, sf_dir):
    # XLM-R/mT5 temperature sampling: alpha-smoothed source weights and
    # the per-source rates realizing them (mass = characters)
    from yardstick_spark.llm import temperature_mixture_weights

    return temperature_mixture_weights(_docs(spark, sf_dir), alpha=0.3,
                                       chars_col="n_chars")


def _q_text_unigram_logprob(spark, sf_dir):
    # CCNet-style LM filter proxy: per-doc mean -ln p(token) under the
    # corpus's own unigram distribution
    from yardstick_spark.llm import unigram_logprob

    return unigram_logprob(_docs(spark, sf_dir))


_SPLIT_W = {"train": 0.8, "val": 0.1, "test": 0.1}


def _q_text_split(spark, sf_dir):
    from yardstick_spark.llm import split_corpus

    return split_corpus(_docs(spark, sf_dir), _SPLIT_W).select(
        "doc_id", "source", "split"
    )


def _split_case_sql(idc: str) -> str:
    # mirror split_corpus's CASE ladder with bit-identical thresholds
    u = (f"(CAST(CONCAT('0x', SUBSTRING(md5(CAST({idc} AS VARCHAR) || ''), "
         "1, 15)) AS BIGINT) % 1000000) / 1000000.0")
    total = sum(_SPLIT_W.values())
    names = list(_SPLIT_W)
    expr, acc = "CASE", 0.0
    for name in names[:-1]:
        acc += _SPLIT_W[name] / total
        expr += f" WHEN {u} < {acc!r} THEN '{name}'"
    expr += f" ELSE '{names[-1]}' END"
    return expr


def _split_oracle() -> str:
    return (f"SELECT doc_id, source, {_split_case_sql('doc_id')} AS split "
            "FROM documents")


def _q_emb_stats(spark, sf_dir):
    # per-label embedding hygiene stats: count, dim, norm distribution
    _ys(spark, sf_dir)
    from pyspark.sql import functions as F

    norm = ("sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), "
            "0D, (s, v) -> s + v * v))")
    return (
        spark.table("embeddings")
        .select(
            "label",
            F.expr("size(embedding)").alias("dim"),
            F.expr(f"round({norm}, 6)").alias("nrm"),
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.max("dim").alias("dim"),
            F.expr("round(avg(nrm), 6)").alias("avg_norm"),
            F.expr("round(min(nrm), 6)").alias("min_norm"),
            F.expr("round(max(nrm), 6)").alias("max_norm"),
        )
        .orderBy("label")
    )


def _q_events_funnel(spark, sf_dir):
    from yardstick_spark.operators import funnel_counts

    _ys(spark, sf_dir)
    return funnel_counts(
        spark.table("events"), ["signup", "view", "click", "purchase"]
    )


def _q_ops_profile(spark, sf_dir):
    # one-scan column profiler over lineitem (data-quality primitive)
    from yardstick_spark.operators import profile_table

    _ys(spark, sf_dir)
    return profile_table(
        spark.table("lineitem"),
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_returnflag", "l_linestatus"],
    )


def _q_ops_histogram(spark, sf_dir):
    # equi-width histogram with explicit bounds (single scan)
    from yardstick_spark.operators import numeric_histogram

    _ys(spark, sf_dir)
    return numeric_histogram(spark.table("lineitem"), "l_extendedprice",
                             bins=20, lo=0.0, hi=60000.0)


def _q_emb_hard_negatives(spark, sf_dir):
    # contrastive-data mining: top-5 most-similar DIFFERENT-label
    # vectors per anchor (broadcast anchors, map-side top-k)
    from yardstick_spark.llm import hard_negatives

    _ys(spark, sf_dir)
    emb = spark.table("embeddings")
    return hard_negatives(emb, emb.filter("vec_id < 5"), k=5)


def _q_emb_prototypes(spark, sf_dir):
    # per-label centroid components (scalarized for the value hash):
    # (label, n_vecs, pos, c) — one posexplode + label x dim agg
    from pyspark.sql import functions as F

    from yardstick_spark.llm import label_prototypes

    _ys(spark, sf_dir)
    return (
        label_prototypes(spark.table("embeddings"))
        .select("label", "n_vecs",
                F.posexplode("centroid").alias("pos", "c"))
    )


def _q_emb_medoids(spark, sf_dir):
    # nearest-real-vector to each label centroid
    from yardstick_spark.llm import label_medoids

    _ys(spark, sf_dir)
    return label_medoids(spark.table("embeddings"))


def _q_emb_quantize(spark, sf_dir):
    # int8 scalar quantization (per-dim min/max scale); per-vector
    # code aggregates keep the output scalar for the value hash
    from pyspark.sql import functions as F

    from yardstick_spark.llm import quantize_embeddings

    _ys(spark, sf_dir)
    return quantize_embeddings(spark.table("embeddings")).select(
        "vec_id",
        F.expr("aggregate(qvec, 0, (s, v) -> s + v)").alias("q_sum"),
        F.expr("array_min(qvec)").alias("q_min"),
        F.expr("array_max(qvec)").alias("q_max"),
    )


def _q_sim_knn_quantized(spark, sf_dir):
    # top-k cosine over the DEQUANTIZED int8 representation — the 4x-
    # smaller index searched with the same broadcast/top-k plan shape
    from yardstick_spark.llm import quantization_params, \
        quantize_embeddings, quantized_knn

    _ys(spark, sf_dir)
    emb = spark.table("embeddings")
    params = quantization_params(emb)
    qv = quantize_embeddings(emb, params=params)
    return quantized_knn(qv, qv.filter("vec_id < 5"), params, k=10)


def _q_events_paths(spark, sf_dir):
    # top-20 most common 3-event user journeys (path n-grams)
    from yardstick_spark.operators import event_paths

    _ys(spark, sf_dir)
    return event_paths(spark.table("events"), length=3, top_k=20)


def _q_ops_cdc_compact(spark, sf_dir):
    # CDC compaction: latest surviving row per user, deletes dropped
    from yardstick_spark.operators import cdc_compact

    _ys(spark, sf_dir)
    ch = spark.table("events").selectExpr(
        "user_id", "event_id", "value", "ts",
        "IF(event_type = 'error', 'D', 'U') AS op")
    return cdc_compact(ch, ["user_id"], "ts", op_col="op",
                       tiebreak_cols=["event_id"]) \
        .select("user_id", "event_id", "value")


def _q_ops_scd2(spark, sf_dir):
    # Type-2 SCD merge over a customer dimension: % 7 keys change
    # segment, % 13 keys arrive new, the rest no-op
    from yardstick_spark.operators import scd2_merge

    _ys(spark, sf_dir)
    c = spark.table("customer")
    dim = c.selectExpr(
        "c_custkey AS k", "c_nationkey AS nat", "c_mktsegment AS seg",
        "'2020-01-01' AS valid_from", "CAST(NULL AS STRING) AS valid_to",
        "TRUE AS is_current")
    upd = c.selectExpr(
        "c_custkey AS k", "c_nationkey AS nat",
        "CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' "
        "ELSE c_mktsegment END AS seg",
        "'2021-06-01' AS ts")
    newu = c.filter("c_custkey % 13 = 0").selectExpr(
        "c_custkey + 1000000 AS k", "c_nationkey AS nat",
        "'NEWSEG' AS seg", "'2021-06-01' AS ts")
    return scd2_merge(dim, upd.unionAll(newu), ["k"], ["nat", "seg"],
                      "ts")


def _q_ops_scd2_lookup(spark, sf_dir):
    # point-in-time dimension lookup: each order reads the customer
    # segment valid AT ITS ORDER DATE (no future-attribute leakage)
    from yardstick_spark.operators import scd2_lookup

    _ys(spark, sf_dir)
    c = spark.table("customer")
    dim = (
        c.filter("c_custkey % 3 = 0").selectExpr(
            "c_custkey AS k", "c_mktsegment AS seg",
            "'1990-01-01' AS valid_from", "'1997-01-01' AS valid_to",
            "FALSE AS is_current")
        .unionAll(c.filter("c_custkey % 3 = 0").selectExpr(
            "c_custkey AS k", "'MOVED' AS seg",
            "'1997-01-01' AS valid_from", "CAST(NULL AS STRING) AS valid_to",
            "TRUE AS is_current"))
        .unionAll(c.filter("c_custkey % 3 <> 0").selectExpr(
            "c_custkey AS k", "c_mktsegment AS seg",
            "'1990-01-01' AS valid_from", "CAST(NULL AS STRING) AS valid_to",
            "TRUE AS is_current"))
    )
    facts = spark.table("orders").selectExpr(
        "o_orderkey", "o_custkey AS k",
        "CAST(CAST(o_orderdate AS DATE) AS STRING) AS od")
    return scd2_lookup(facts, dim, ["k"], "od").select(
        "o_orderkey", "k", "od", "seg")


def _q_ops_expectations(spark, sf_dir):
    # Deequ-style declarative quality gate: every row-level rule rides
    # ONE single-scan aggregation per table; unique adds its one key
    # shuffle; ref-integrity one key join (operators/quality.py)
    from yardstick_spark.operators import (
        check_expectations, in_range, in_set, matches, not_null,
        ref_integrity, satisfies, unique)

    _ys(spark, sf_dir)
    li, orders = spark.table("lineitem"), spark.table("orders")
    li_rules = [
        not_null("l_orderkey"),
        in_range("l_quantity", 1, 50),
        in_set("l_returnflag", ["A", "N", "R"]),
        satisfies("discount_is_fractional",
                  "l_discount >= 0 AND l_discount < 1"),
        matches("l_linestatus", "^[FO]$"),
        ref_integrity("l_orderkey", orders, "o_orderkey",
                      ref_name="orders"),
    ]
    o_rules = [
        unique(["o_orderkey"]),
        in_range("o_totalprice", 0, 1000000),
        in_set("o_orderstatus", ["F", "O", "P"]),
        matches("o_orderpriority", "^[1-5]-"),
    ]
    return (check_expectations(li, li_rules, prefix="lineitem.")
            .unionByName(
                check_expectations(orders, o_rules, prefix="orders."))
            .orderBy("rule"))


def _q_text_heavy_hitters(spark, sf_dir):
    # exact top-20 term frequencies WITHOUT the full-vocabulary
    # shuffle: per-partition Misra-Gries sketches -> certified
    # candidate set -> exact recount (operators/heavy.py); at 100 TB
    # the shuffle is O(partitions x capacity), not O(vocab)
    from pyspark.sql import functions as F

    from yardstick_spark.llm.text import _NORM
    from yardstick_spark.operators import heavy_hitters

    norm = _NORM.format(c="text")
    words = _docs(spark, sf_dir).select(F.explode(F.expr(
        f"filter(split({norm}, ' '), t -> t <> '')")).alias("term"))
    return heavy_hitters(words, "term", k=20, capacity=4096)


def _q_ops_incremental_agg(spark, sf_dir):
    # materialized-rollup refresh: the pre-1998 aggregate is the
    # stored state, 1998 is the ingest batch — merge costs
    # O(batch + group cardinality), never a history rescan
    # (operators/incremental.py); result must equal full recompute
    from pyspark.sql import functions as F

    from yardstick_spark.operators import incremental_agg_merge

    _ys(spark, sf_dir)
    li = spark.table("lineitem").selectExpr(
        "l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "YEAR(l_shipdate) AS y")
    keys = ["l_returnflag", "l_linestatus"]
    old_agg = (li.filter("y < 1998").groupBy(*keys)
               .agg(F.sum("l_quantity").alias("l_quantity"),
                    F.sum("l_extendedprice").alias("l_extendedprice"),
                    F.count(F.lit(1)).alias("cnt")))
    delta = li.filter("y >= 1998")
    merged = incremental_agg_merge(
        old_agg, delta, keys, ["l_quantity", "l_extendedprice"])
    return merged.select(
        *keys,
        F.round("l_quantity", 2).alias("sum_qty"),
        F.round("l_extendedprice", 2).alias("sum_price"),
        "cnt").orderBy(*keys)


def _q_ops_table_diff(spark, sf_dir):
    # snapshot reconciliation: one null-safe full outer join on the
    # key classifies every row as inserted/deleted/updated
    from pyspark.sql import functions as F

    from yardstick_spark.operators import table_diff

    _ys(spark, sf_dir)
    c = spark.table("customer")
    old = c.select("c_custkey", "c_nationkey", "c_mktsegment")
    new = (c.filter("c_custkey % 13 <> 0")          # deletes
           .selectExpr("c_custkey", "c_nationkey",
                       "IF(c_custkey % 7 = 0, 'MOVED', c_mktsegment) "
                       "AS c_mktsegment")           # updates
           .unionAll(c.filter("c_custkey % 11 = 0").selectExpr(
               "c_custkey + 1000000 AS c_custkey", "c_nationkey",
               "'NEWSEG' AS c_mktsegment")))        # inserts
    return table_diff(old, new, ["c_custkey"]).orderBy(
        "c_custkey", "change")


def _q_text_dup_spans(spark, sf_dir):
    # exact duplicated-substring spans (Lee et al. 2022 style): one
    # token-scale gram count is the distributed suffix-array stand-in
    from yardstick_spark.llm import duplicated_spans

    return duplicated_spans(_docs(spark, sf_dir), n=8).orderBy(
        "doc_id", "start_word")


def _q_text_char_entropy(spark, sf_dir):
    # char-entropy quality signal (portable twin of the zlib-ratio
    # filter): scan-only sorted-run-length fold, no explode/UDF
    from yardstick_spark.llm import char_entropy

    return char_entropy(_docs(spark, sf_dir)).orderBy("doc_id")


def _q_ops_gap_fill(spark, sf_dir):
    # TimescaleDB-style gapfill+locf: complete daily series per
    # event_type, zero-filled counts, carried-forward level
    from pyspark.sql import functions as F

    from yardstick_spark.operators import gap_fill_daily

    _ys(spark, sf_dir)
    daily = (spark.table("events")
             .selectExpr("event_type", "CAST(ts AS DATE) AS day",
                         "value")
             .groupBy("event_type", "day")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("value"), 2).alias("day_value")))
    out = gap_fill_daily(daily, ["event_type"], "day",
                         zero_cols=["n"], locf_cols=["day_value"])
    return out.select(
        "event_type", F.col("day").cast("string").alias("day"),
        "n", "day_value", "is_filled").orderBy("event_type", "day")


def _q_text_stratified(spark, sf_dir):
    # exact-count stratified sample per (source, lang) stratum,
    # md5-deterministic; map-side WindowGroupLimit shuffle shape
    from yardstick_spark.llm import stratified_sample

    return stratified_sample(
        _docs(spark, sf_dir).select("doc_id", "source", "lang"),
        ["source", "lang"], 5).orderBy("source", "lang", "doc_id")


def _q_asof_forward(spark, sf_dir):
    # forward as-of: each purchase attaches the NEXT click at-or-after
    # it (pandas merge_asof direction='forward'); same union+window
    # shape, first(ignorenulls) over a following frame
    from pyspark.sql import functions as F

    from yardstick_spark.operators import asof_join
    from yardstick_spark.sources import read_table

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    purchases = ev.filter("event_type = 'purchase'")
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", "ts", F.col("value").alias("click_value"))
    return asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        direction="forward",
    ).select("event_id",
             F.round("click_value_asof", 2).alias("next_click_value")
             ).orderBy("event_id")


def _q_ops_skew_report(spark, sf_dir):
    # pre-join skew diagnosis: hottest user_ids with exact counts,
    # shares, and the salt factor that flattens each to average load
    from yardstick_spark.operators import skew_report

    _ys(spark, sf_dir)
    return skew_report(spark.table("events"), "user_id", k=10,
                       n_partitions=32)


def _q_text_bigram_logprob(spark, sf_dir):
    # interpolated bigram-LM perplexity filter (KenLM-ladder step 2)
    from yardstick_spark.llm import bigram_logprob

    return bigram_logprob(_docs(spark, sf_dir)).orderBy("doc_id")


def _q_pipeline_embeddings(spark, sf_dir):
    # embedding-side curation composed end to end: norm-window filter
    # -> SemDeDup keep-one -> int8 quantization on the survivors
    from yardstick_spark.llm import prepare_embedding_corpus

    _ys(spark, sf_dir)
    return prepare_embedding_corpus(
        spark.table("embeddings"), norm_lo=0.9, norm_hi=1.1,
        threshold=0.3, n_lists=8)


def _q_text_vocab_coverage(spark, sf_dir):
    # tokenizer-vocab sizing: top-100 terms and the token-coverage curve
    from yardstick_spark.llm import vocab_coverage

    return vocab_coverage(_docs(spark, sf_dir), top_n=100)


def _q_text_ngrams(spark, sf_dir):
    # corpus-wide bigram occurrence counts (BPE merge-candidate mining)
    from yardstick_spark.llm import ngram_counts

    return ngram_counts(_docs(spark, sf_dir), n=2, top_k=50)


def _q_text_sample_weighted(spark, sf_dir):
    # Efraimidis-Spirakis weighted sampling: 100 docs, chars as weight
    from yardstick_spark.llm import sample_weighted

    return sample_weighted(_docs(spark, sf_dir), k=100,
                           weight_col="n_chars")


def _q_text_dsir_weights(spark, sf_dir):
    # DSIR hashed-ngram importance weights, target = English sub-corpus.
    # The logw filter is vacuous (|logw| < 1e9 by construction) but
    # value-dependent: under the bench's count() action Catalyst prunes
    # unreferenced aggregate values, which cascades into eliminating
    # the whole fit subplan inside the broadcast build — this pins the
    # measured plan to the real one.
    from yardstick_spark.llm import dsir_weights

    return dsir_weights(_docs(spark, sf_dir), "lang = 'en'",
                        n_buckets=1024, alpha=1.0).filter("logw > -1e15")


def _q_text_dsir_sample(spark, sf_dir):
    # DSIR Gumbel top-k resampling toward the English target
    from yardstick_spark.llm import dsir_sample

    return dsir_sample(_docs(spark, sf_dir), "lang = 'en'", k=100,
                       n_buckets=1024, alpha=1.0)


def _q_text_dsir_xxh(spark, sf_dir):
    # the DSIR PRODUCTION hash path (hash_impl="xxhash64", struct
    # grams, no bigram string — 0.43x DuckDB at 100x vs 2.6x for the
    # md5 portability default, SCALING.md).  DuckDB has no xxhash64
    # twin, so the driver records a rows-only check here BY DESIGN;
    # the value-level pin is local and independent instead: a
    # pure-Python XXH64 reference (tests/xxh64_ref.py, validated
    # bit-for-bit against Spark's expression incl. struct chaining +
    # NULL-skip) recomputes the exact integer bucket-count table on
    # the same corpus (tests/test_text_ops.py::
    # test_dsir_xxhash64_bucket_counts_match_python_reference).  The
    # md5 entries (text_dsir_weights/sample/incremental) stay the
    # cross-engine value-hash contract for everything downstream of
    # the bucket hash.  Vacuous value-dependent filter: see
    # _q_text_dsir_weights.
    from yardstick_spark.llm import dsir_weights

    return dsir_weights(_docs(spark, sf_dir), "lang = 'en'",
                        n_buckets=1024, alpha=1.0,
                        hash_impl="xxhash64").filter("logw > -1e15")


def _q_text_dsir_incremental(spark, sf_dir):
    # persisted-store DSIR: fit the bucket statistic on two thirds of
    # the corpus, fold the rest in with update_dsir_store (integer
    # counts merge exactly), score everything against the store —
    # must equal the full refit, so this shares text_dsir_weights'
    # oracle
    import hashlib
    import tempfile
    from pathlib import Path

    from yardstick_spark.llm import (dsir_score_with_store,
                                     save_dsir_store, update_dsir_store)

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = str(Path(tempfile.gettempdir()) / f"ys_dsir_inc_{tag}")
    docs = _docs(spark, sf_dir)
    if not (Path(path) / "_dsir_meta.json").exists():
        save_dsir_store(docs.filter("doc_id % 3 != 0"), "lang = 'en'",
                        path, n_buckets=1024)
        update_dsir_store(docs.filter("doc_id % 3 = 0"), path)
    # vacuous value-dependent filter: see _q_text_dsir_weights
    return dsir_score_with_store(docs, path,
                                 alpha=1.0).filter("logw > -1e15")


def _q_emb_kmeans(spark, sf_dir):
    # deterministic integer-grid Lloyd k-means: final cell assignments
    from yardstick_spark.llm import kmeans_assign

    _ys(spark, sf_dir)
    return kmeans_assign(spark.table("embeddings"), k=8, iters=3)


def _q_emb_cluster_sample(spark, sf_dir):
    # topic-balanced selection: 10 md5-uniform winners per k-means cell
    from yardstick_spark.llm import cluster_balanced_sample

    _ys(spark, sf_dir)
    return cluster_balanced_sample(spark.table("embeddings"), k=8,
                                   iters=3, per_cell=10)


def _q_emb_margin_pairs(spark, sf_dir):
    # bitext-style mutual margin mining between the two label halves:
    # exact kNN lists both directions (k=4), then the bounded margin
    # post-processing — at corpus scale the lists come from the LSH /
    # persisted-index retrievers with the same margin layer
    from yardstick_spark.llm import brute_force_knn, margin_pairs

    _ys(spark, sf_dir)
    emb = spark.table("embeddings")
    a = emb.filter("label <= 4")
    b = emb.filter("label >= 5")
    return margin_pairs(brute_force_knn(b, a, k=4),
                        brute_force_knn(a, b, k=4))


def _q_text_shard_manifest(spark, sf_dir):
    # deterministic training-shard cut: md5-shuffle order, 5k-token
    # shards, exact-integer manifest (the write_training_shards audit
    # artifact)
    from yardstick_spark.llm import shard_manifest

    return shard_manifest(_docs(spark, sf_dir), shard_tokens=5_000)


def _q_events_transitions(spark, sf_dir):
    # first-order Markov transition matrix over per-user event streams
    from yardstick_spark.operators import event_transitions

    _ys(spark, sf_dir)
    return event_transitions(spark.table("events"))


def _q_events_anomaly(spark, sf_dir):
    # per-type daily volume z-scores (monitoring primitive)
    from yardstick_spark.operators import daily_anomalies

    _ys(spark, sf_dir)
    return daily_anomalies(spark.table("events"), z_threshold=2.0)


def _q_events_retention(spark, sf_dir):
    from yardstick_spark.operators import retention_cohorts

    _ys(spark, sf_dir)
    return retention_cohorts(spark.table("events"))


def _q_text_report(spark, sf_dir):
    from yardstick_spark.llm import corpus_report

    return corpus_report(_docs(spark, sf_dir))


def _q_text_fp_overlap(spark, sf_dir):
    from yardstick_spark.llm import fingerprint_overlap_pairs

    return fingerprint_overlap_pairs(_docs(spark, sf_dir), min_shared=2)


def _q_events_json(spark, sf_dir):
    # semi-structured column handling: the events.props JSON string is
    # parsed scan-side (get_json_object stays in codegen) and the
    # extracted field aggregates per event type
    _ys(spark, sf_dir)
    return spark.sql(
        "SELECT event_type, COUNT(*) AS n, "
        "CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) "
        "AS BIGINT) AS k_sum, "
        "MIN(CAST(get_json_object(props, '$.k') AS BIGINT)) AS k_min, "
        "MAX(CAST(get_json_object(props, '$.k') AS BIGINT)) AS k_max "
        "FROM events GROUP BY event_type ORDER BY event_type"
    )


def _q_text_pack(spark, sf_dir):
    from yardstick_spark.llm import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), max_tokens=64)


def _q_dedup_incremental(spark, sf_dir):
    # incremental-ingest shape: every 5th doc is the "new batch",
    # deduped against the remaining corpus without a corpus self-join
    from yardstick_spark.llm import incremental_minhash_pairs

    docs = _docs(spark, sf_dir)
    return incremental_minhash_pairs(
        docs.filter("doc_id % 5 = 0"),
        docs.filter("doc_id % 5 <> 0"),
        threshold=0.5,
    )


_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}


def _q_text_chunks(spark, sf_dir):
    from yardstick_spark.llm import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), chunk_tokens=32, overlap=8)


def _q_text_mixture(spark, sf_dir):
    from yardstick_spark.llm import sample_mixture

    return sample_mixture(
        _docs(spark, sf_dir), rates=_MIX_RATES, default_rate=0.1
    ).select("doc_id", "source", "n_chars")


def _q_pipeline_full(spark, sf_dir):
    from yardstick_spark.llm import curate_corpus_full

    return curate_corpus_full(
        _docs(spark, sf_dir), rates=_MIX_RATES, default_rate=0.5,
        max_dup_word_frac=0.6, per_source=15, splits=_SPLIT_W,
    ).select("doc_id", "source", "split")


def _q_pipeline_curation(spark, sf_dir):
    from yardstick_spark.llm import curation_report

    return curation_report(
        _docs(spark, sf_dir), rates=_MIX_RATES, default_rate=0.5
    )


def _q_langid(spark, sf_dir):
    from yardstick_spark.llm import language_id

    return language_id(_docs(spark, sf_dir))


def _q_fingerprint(spark, sf_dir):
    from yardstick_spark.llm import doc_fingerprint
    from pyspark.sql import functions as F

    fp = doc_fingerprint(_docs(spark, sf_dir))
    return fp.select(
        "doc_id",
        "content_hash",
        F.expr("size(fingerprint)").alias("n_prints"),
        F.expr("fingerprint[0]").alias("min_print"),
    )


def _q_mm_decode(spark, sf_dir):
    from pyspark.sql import functions as F

    from yardstick_spark.llm.multimodal import attach_media_column, decode_media

    media = attach_media_column(_docs(spark, sf_dir))
    decoded = decode_media(media, n_features=8, fake=True)
    return decoded.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
    )


def _q_mm_decode_real(spark, sf_dir):
    # encode docs as real PPM/WAV binaries, then REALLY decode them
    # (header parse + payload extraction, pure numpy) — every decoded
    # property is an analytic function of doc_id, so the oracle checks
    # the whole encode->decode->featurize path
    from pyspark.sql import functions as F

    from yardstick_spark.llm import decode_media, synth_media

    media = synth_media(_docs(spark, sf_dir))
    out = decode_media(media, n_features=8, fake=False)
    return out.select(
        "media_id", "kind", "width", "height", "n_samples",
        F.round("mean_val", 6).alias("mean_val"),
    )


def _q_mm_decode_png(spark, sf_dir):
    # encode docs as REAL zlib-compressed PNGs whose scanline filter
    # cycles through all five standard types, then really decode them
    # (chunk walk + inflate + unfilter, pure numpy/stdlib — llm/
    # multimodal.py parse_png).  The pixel content is the same
    # analytic gradient as mm_resize's fixture, so the oracle checks
    # the whole compress->filter->inflate->unfilter->featurize path
    # against a CLOSED-FORM sum (sum over p of (p+id)%251 has a
    # cycles+remainder closed form) — per the determinism contract the
    # comparison rides the exact integer grid (sum_px), not a float
    # mean.
    from pyspark.sql import functions as F

    from yardstick_spark.llm import decode_media, synth_png_media

    media = synth_png_media(_docs(spark, sf_dir))
    out = decode_media(media, n_features=8, fake=False)
    return out.select(
        "media_id", "kind", "width", "height", "n_samples",
        F.expr("CAST(round(mean_val * n_samples * 255) AS BIGINT)")
        .alias("sum_px"),
    )


def _q_mm_decode_jpeg(spark, sf_dir):
    # REAL baseline-JPEG decode (marker walk, canonical-Huffman scan
    # decode with DC prediction + bit-unstuffing, dequantize, IDCT —
    # llm/multimodal.py parse_jpeg, pure numpy/stdlib).  The fixture
    # pixels are constant per 8x8 tile, so the lossy DCT path has a
    # CLOSED FORM per tile: only the DC coefficient survives, decoded
    # value = round(8(v-128)/Q00)*Q00/8 + 128 on the deterministic
    # rounding grid — the oracle computes it per tile and sums, never
    # touching a bitstream.  Integer-grid comparison (sum_px), per the
    # determinism contract.
    from pyspark.sql import functions as F

    from yardstick_spark.llm import decode_media, synth_jpeg_media

    media = synth_jpeg_media(_docs(spark, sf_dir))
    out = decode_media(media, n_features=8, fake=False)
    return out.select(
        "media_id", "kind", "width", "height", "n_samples",
        F.expr("CAST(round(mean_val * n_samples * 255) AS BIGINT)")
        .alias("sum_px"),
    )


def _q_mm_decode_jpeg_color(spark, sf_dir):
    # COLOR (4:4:4 YCbCr) baseline-JPEG decode with genuinely colored
    # constant tiles: the oracle recomputes the full RGB -> YCbCr ->
    # DC-quantize -> YCbCr -> RGB chain in closed form per tile, every
    # step on the shared two-stage rounding grid (ROUND(ROUND(x,6)) =
    # half-away of the 6-dp value — what the codec's
    # clip(half_away(round6)) computes).  Exercises the 3-block MCU
    # interleave + per-component DC predictors + color reconstruction
    # that mm_decode_jpeg (grayscale) does not.
    from pyspark.sql import functions as F

    from yardstick_spark.llm import decode_media, synth_jpeg_media

    media = synth_jpeg_media(_docs(spark, sf_dir), color=True)
    out = decode_media(media, n_features=8, fake=False)
    return out.select(
        "media_id", "kind", "width", "height", "n_samples",
        F.expr("CAST(round(mean_val * n_samples * 255) AS BIGINT)")
        .alias("sum_px"),
    )


def _q_mm_resize(spark, sf_dir):
    # gradient PPMs -> real nearest-neighbor resize to 16x16 -> real
    # decode; the gradient makes the resized mean depend on the NN index
    # map (floor(x2*w/16), floor(y2*h/16)), which the oracle recomputes
    # analytically — this checks the resampling math, not just plumbing
    from pyspark.sql import functions as F

    from yardstick_spark.llm import (
        decode_media, resize_media, synth_gradient_media,
    )

    media = synth_gradient_media(_docs(spark, sf_dir))
    out = decode_media(resize_media(media, 16, 16), n_features=4, fake=False)
    # compare on the EXACT INTEGER pixel-sum grid: round(mean * n * 255)
    # recovers the integer sample sum from the float mean (error << 0.5
    # since sums < 2^18), and the oracle computes SUM(v) directly —
    # integer equality on both engines.  The previous 6-dp float-mean
    # comparison diverged at sf0.1 when a mean landed on a decimal
    # rounding boundary (0.6265625) that the two engines' float folds
    # approached from opposite ulps (the emb_outliers class).
    return out.select(
        "media_id", "width", "height", "n_samples",
        F.expr("CAST(round(mean_val * n_samples * 255) AS BIGINT)")
        .alias("sum_px"),
    )


def _q_mm_resize_png(spark, sf_dir):
    # the same NN-resample verification as mm_resize, but through the
    # COMPRESSED container: gradient PNGs -> inflate/unfilter -> NN
    # resize -> PNG re-encode -> inflate/unfilter again -> featurize.
    # synth_png_media carries the identical per-pixel gradient
    # v(p) = (p + id) % 251 as the PPM fixture (with every scanline
    # filter type exercised on the first decode), so the oracle is the
    # mm_resize index-map recomputation with RGB tripling — two full
    # zlib round-trips sit between the two ends.
    from pyspark.sql import functions as F

    from yardstick_spark.llm import (decode_media, resize_media,
                                     synth_png_media)

    media = synth_png_media(_docs(spark, sf_dir))
    out = decode_media(resize_media(media, 16, 16), n_features=4,
                       fake=False)
    return out.select(
        "media_id", "kind", "width", "height", "n_samples",
        F.expr("CAST(round(mean_val * n_samples * 255) AS BIGINT)")
        .alias("sum_px"),
    )


def _q_mm_stats(spark, sf_dir):
    # gradient PPMs (even ids) + constant-sample WAVs (odd ids): every
    # statistic — channel mean/min/max/RMS, audio zero-crossing rate —
    # is an analytic function of the id, so the oracle verifies the
    # real decode + numpy statistics without parsing binaries
    from yardstick_spark.llm import media_stats, synth_gradient_media, synth_media

    docs = _docs(spark, sf_dir)
    media = synth_gradient_media(docs.filter("doc_id % 2 = 0")).union(
        synth_media(docs.filter("doc_id % 2 = 1"))
    )
    return media_stats(media)


def _q_mm_frames(spark, sf_dir):
    from pyspark.sql import functions as F

    from yardstick_spark.llm.multimodal import attach_media_column, frame_sample

    media = attach_media_column(_docs(spark, sf_dir))
    frames = frame_sample(media, every_ms=1000)
    return frames.agg(
        F.count("*").alias("n_frames"),
        F.countDistinct("media_id").alias("n_videos"),
    )


def _q_events_sessionize(spark, sf_dir):
    from yardstick_spark.sources import read_table
    from yardstick_spark.streaming import sessionize_batch

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    return sessionize_batch(ev, gap_minutes=30).select(
        "user_id", "session_seq", "n_events", "session_value"
    )


def _q_events_sliding(spark, sf_dir):
    # 60-minute windows sliding every 15: each event lands in 4
    # overlapping windows; the oracle re-derives the covering window
    # starts arithmetically (epoch-aligned slide multiples)
    from pyspark.sql import functions as F

    from yardstick_spark.sources import read_table
    from yardstick_spark.streaming import sliding_counts_batch

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    return sliding_counts_batch(ev, minutes=60, slide_minutes=15).select(
        F.col("window_start").cast("string").alias("window_start"),
        "event_type", "n", "total_value",
    )


def _q_events_attribution(spark, sf_dir):
    from yardstick_spark.sources import read_table
    from yardstick_spark.streaming import attribution_batch

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    return attribution_batch(ev, window_minutes=60)


def _q_events_rollup_daily(spark, sf_dir):
    # daily continuous aggregate DERIVED FROM the hourly rollup (the
    # oracle aggregates raw events directly — proving the two-level
    # re-aggregation identity)
    from pyspark.sql import functions as F

    from yardstick_spark.operators import rollup_hierarchy
    from yardstick_spark.sources import read_table

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    daily = rollup_hierarchy(ev, ("hour", "day"))["day"]
    return daily.select(
        F.expr("CAST(bucket AS STRING)").alias("day"),
        "event_type", "n",
        F.expr("CAST(value_cents / 100.0 AS DOUBLE)").alias("total_value"),
    )


def _q_range_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from yardstick_spark.operators import range_join
    from yardstick_spark.sources import read_table

    ev = read_table(spark, f"{sf_dir}/events.parquet").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    win = spark.sql(
        "SELECT CAST(w_id AS INT) AS w_id, "
        "TIMESTAMP'2024-01-01 00:00:00' + w_id * INTERVAL 3 HOUR AS w_start, "
        "TIMESTAMP'2024-01-01 00:00:00' + w_id * INTERVAL 3 HOUR "
        "+ INTERVAL 45 MINUTE AS w_end "
        "FROM (SELECT explode(sequence(0, 79)) AS w_id)"
    )
    return range_join(ev, win, "ts", "w_start", "w_end").select(
        "event_id", "w_id"
    )


def _q_asof_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from yardstick_spark.operators import asof_join
    from yardstick_spark.sources import read_table

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    purchases = ev.filter("event_type = 'purchase'")
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    return asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts"
    ).select(
        "event_id", F.round("click_value_asof", 2).alias("last_click_value")
    )


def _q_topk_per_group(spark, sf_dir):
    from yardstick_spark.operators import top_k_per_group
    from yardstick_spark.sources import read_table

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    return top_k_per_group(
        ev, ["event_type"], ["value", "event_id"], k=3
    ).select("event_type", "event_id", "value")


def _q_events_tumbling(spark, sf_dir):
    from pyspark.sql import functions as F

    _ys(spark, sf_dir)
    return (
        spark.table("events")
        .groupBy(
            F.expr("CAST(date_trunc('hour', ts) AS STRING)").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def _q_graph_pagerank(spark, sf_dir):
    # steady-state visit probability of each event state under the
    # empirical transition matrix — weighted PageRank over the
    # event-transition graph (operators/graph.py: per-superstep
    # materialized join loop, GraphX/Pregel shape).  Oracle: the same
    # power iteration unrolled as plain CTEs (pagerank_sql).
    from pyspark.sql import functions as F

    from yardstick_spark.operators import event_transitions, pagerank

    _ys(spark, sf_dir)
    edges = event_transitions(spark.table("events")).select(
        F.col("from_type").alias("src"),
        F.col("to_type").alias("dst"),
        F.col("n").cast("double").alias("w"),
    )
    return pagerank(edges, iterations=8).select(
        "node", F.round("rank", 6).alias("rank")
    )


def _q_ops_zorder(spark, sf_dir):
    # Z-order (Morton) layout summary: interleave two independent keys
    # into one 24-bit code, split its range into 16 fixed buckets (top
    # 4 bits — pure projection, NO global sort/window), and show the
    # per-bucket span of BOTH dims — the property that makes parquet
    # min/max pruning fire for filters on either key after
    # write_zordered.  Bit math is engine-portable; the oracle uses
    # zorder_key_sql_duckdb for the identical code.
    from pyspark.sql import functions as F

    from yardstick_spark.operators import zorder_key_sql

    _ys(spark, sf_dir)
    dims = [("x", 0, 4095), ("y", 0, 4095)]
    z = spark.table("orders").selectExpr(
        "o_orderkey",
        "CAST(o_custkey % 4096 AS BIGINT) AS x",
        "CAST(pmod(o_orderkey * 2654435761, 4096) AS BIGINT) AS y",
    ).selectExpr("x", "y", f"{zorder_key_sql(dims, 12)} AS zkey")
    return (
        z.groupBy(F.expr("shiftright(zkey, 20)").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )


def _q_dedup_fuzzy(spark, sf_dir):
    # blocked edit-distance entity resolution on part names: token+
    # length-bucket blocking keys bound the candidate join (never
    # all-pairs), JVM levenshtein verifies (llm/fuzzy.py)
    from yardstick_spark.llm import fuzzy_dedup_pairs

    _ys(spark, sf_dir)
    return fuzzy_dedup_pairs(
        spark.table("part"), "p_partkey", "p_name", max_edit=1
    )


def _q_events_pivot(spark, sf_dir):
    # DataFrame-API pivot with an EXPLICIT value list (no hidden
    # distinct-discovery scan; single exchange — plan-asserted in
    # tests/test_graph_layout.py).  Complements the SQL PIVOT entry
    # ops_pivot.
    from pyspark.sql import functions as F

    from yardstick_spark.operators import pivot_table

    _ys(spark, sf_dir)
    ev = spark.table("events").withColumn(
        "day", F.expr("CAST(to_date(ts) AS STRING)")
    )
    return pivot_table(
        ev,
        ["day"],
        "event_type",
        ["click", "error", "purchase", "signup", "view"],
        F.round(F.sum("value"), 2),
    )


def _q_mm_phash(spark, sf_dir):
    # perceptual-hash image near-dup over textured synthetic PPMs:
    # docs with equal content id (doc_id % 40) are the same image up
    # to a uniform brightness shift — pHash (DCT, DC dropped) pairs
    # them at hamming 0 while any byte-level hash cannot; distinct
    # contents sit >= 17 bits apart on this fixture.  The oracle is
    # therefore ANALYTIC (all intra-content pairs) — it verifies the
    # whole encode->decode->DCT->threshold->band-join pipeline without
    # needing a SQL DCT (same strategy as mm_stats).
    from yardstick_spark.llm import phash_pairs, synth_textured_media

    return phash_pairs(
        synth_textured_media(_docs(spark, sf_dir)), max_hamming=2
    )


def _q_mm_audio_fp(spark, sf_dir):
    # volume-invariant audio fingerprinting over square-wave WAVs:
    # ZCR/period features are analytic functions of the content id
    # (llm/multimodal.py synth_square_wav), so the oracle verifies the
    # real RIFF-parse + numpy sign-change pipeline without SQL DSP
    from yardstick_spark.llm import audio_fingerprint, synth_square_wav

    return audio_fingerprint(synth_square_wav(_docs(spark, sf_dir)))


def _q_emb_covariance(spark, sf_dir):
    # distributed one-pass covariance (per-partition numpy Gram
    # partials, d^2-bounded merge) vs DuckDB COVAR_POP per (i, j)
    from yardstick_spark.llm import covariance_matrix

    _ys(spark, sf_dir)
    return covariance_matrix(spark.table("embeddings"))


def _q_emb_jl_project(spark, sf_dir):
    # Johnson-Lindenstrauss +-1 projection; the sign matrix is md5
    # parity (same derivation as the LSH planes), so the oracle
    # rebuilds it exactly in SQL
    from yardstick_spark.llm import jl_project

    _ys(spark, sf_dir)
    return jl_project(spark.table("embeddings"), out_dim=8, seed=42)


def _q_emb_pq(spark, sf_dir):
    # product-quantization codes under the SEEDED md5 codebook (m=8
    # subspaces x 16 codes): scan-only literal argmin encode; the
    # oracle re-derives codebook and codes from the same md5 calls
    from pyspark.sql import functions as F

    from yardstick_spark.llm import pq_codebook, pq_encode

    _ys(spark, sf_dir)
    emb = spark.table("embeddings")
    cb = pq_codebook(emb, m=8, ks=16)
    return pq_encode(emb, cb).select(
        "vec_id", F.posexplode("codes").alias("sub", "code"))


def _q_sim_knn_pq(spark, sf_dir):
    # asymmetric-distance (ADC) top-k over the 64x-compressed codes —
    # corpus side carries codes only, never vectors
    from yardstick_spark.llm import pq_codebook, pq_encode, pq_knn

    _ys(spark, sf_dir)
    emb = spark.table("embeddings")
    cb = pq_codebook(emb, m=8, ks=16)
    codes = pq_encode(emb, cb)
    return pq_knn(codes, cb, emb.filter("vec_id < 5"), k=10)


def _q_sim_knn_pq_trained(spark, sf_dir):
    # ADC top-k over codes from a TRAINED codebook: the md5-seeded
    # book initializes 2 Lloyd rounds run jointly over all subspaces
    # on the exact 1e-6 integer grid (llm/pq.py _pq_train), so the
    # oracle unrolls training as plain CTEs — seed cells, two
    # assignment+mean rounds with BIGINT distances, then the same
    # encode/LUT/ADC chain as sim_knn_pq over the trained centroids.
    from yardstick_spark.llm import pq_codebook, pq_encode, pq_knn

    _ys(spark, sf_dir)
    emb = spark.table("embeddings")
    cb = pq_codebook(emb, m=8, ks=16, train=True, iters=2)
    codes = pq_encode(emb, cb)
    return pq_knn(codes, cb, emb.filter("vec_id < 5"), k=10)


def _q_emb_outliers(spark, sf_dir):
    # per-label distance-to-prototype z-scores — the cheap mislabel
    # screen; broadcast centroid table, scan-side fold, label windows
    from yardstick_spark.llm import embedding_outliers

    _ys(spark, sf_dir)
    return embedding_outliers(spark.table("embeddings"))


def _q_dedup_minhash_eval(spark, sf_dir):
    # estimator-quality report: signature estimate vs EXACT shingle
    # Jaccard on the surviving LSH pairs — the num_hashes/bands tuning
    # loop, run on a sample before a full-corpus dedup pass
    from yardstick_spark.llm import minhash_estimate_eval

    return minhash_estimate_eval(
        _docs(spark, sf_dir), k=5, num_hashes=32, bands=8, threshold=0.5)


def _q_text_lang_confusion(spark, sf_dir):
    # declared-vs-detected language confusion matrix — the metadata
    # QA step that catches mislabeled-language sources before mixture
    # weighting trusts the `lang` column
    from pyspark.sql import functions as F

    from yardstick_spark.llm import language_id

    docs = _docs(spark, sf_dir)
    pred = language_id(docs).select("doc_id", "pred_lang")
    return (
        docs.select("doc_id", F.col("lang").alias("declared"))
        .join(pred, "doc_id")
        .groupBy("declared", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


def _q_dedup_containment(spark, sf_dir):
    # near-superset pairs (|A∩B|/min >= 0.8): the quote-and-extend /
    # template-wrap duplication Jaccard misses; exact set-containment
    # prefix join (llm/dedup.ngram_containment_pairs)
    from yardstick_spark.llm import ngram_containment_pairs

    return ngram_containment_pairs(
        _docs(spark, sf_dir), k=5, threshold=0.8)


def _q_mm_scene_cuts(spark, sf_dir):
    # shot-boundary detection over raw-frame synthetic videos: the
    # planted cut makes every frame diff analytic in the id, so the
    # oracle verifies the real header-parse + numpy frame-diff path
    from yardstick_spark.llm import scene_cuts, synth_video

    return scene_cuts(synth_video(_docs(spark, sf_dir)))


def _q_text_zipf(spark, sf_dir):
    # Zipf power-law fit (ln tf ~ ln rank over the top-50 terms) —
    # the one-number corpus health check; REGR_* keeps both engines
    # on the same closed-form OLS
    from yardstick_spark.llm import zipf_fit

    return zipf_fit(_docs(spark, sf_dir), top_n=50)


def _q_sim_mmr(spark, sf_dir):
    # MMR diversified re-ranking: greedy fixed-round relevance-minus-
    # redundancy over a bounded candidate pool; oracle unrolls the
    # same rounds as CTEs (llm/mining.mmr_sql)
    from yardstick_spark.llm import mmr_rerank

    _ys(spark, sf_dir)
    emb = spark.table("embeddings")
    return mmr_rerank(emb, emb.filter("vec_id < 3"), k=5, pool=20)


def _q_graph_communities(spark, sf_dir):
    # label-propagation communities over the minhash near-dup graph;
    # deterministic (ties to min label) so the oracle unrolls the
    # SAME rounds as plain CTEs over the bit-exact pair SQL
    from yardstick_spark.llm import minhash_lsh_pairs
    from yardstick_spark.operators import label_propagation

    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        docs, k=5, num_hashes=32, bands=8, threshold=0.5
    ).selectExpr("id_a AS src", "id_b AS dst")
    return label_propagation(pairs, iterations=4)


def _q_graph_triangles(spark, sf_dir):
    # degree-ordered triangle counting over the word co-occurrence
    # (bigram) graph; the oracle verifies the orientation-independent
    # triangle SET with a naive a<b<c triple join
    from pyspark.sql import functions as F

    from yardstick_spark.operators import triangle_counts

    docs = _docs(spark, sf_dir)
    norm = "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"
    words = f"filter(split({norm}, ' '), t -> t <> '')"
    pairs = (
        "transform(sequence(1, size(__w) - 1), "
        "i -> struct(element_at(__w, i) AS a, element_at(__w, i + 1) AS b))"
    )
    edges = (
        docs.select(F.expr(words).alias("__w"))
        .filter("size(__w) >= 2")
        .select(F.explode(F.expr(pairs)).alias("p"))
        .filter("p.a <> p.b")
        .select(F.col("p.a").alias("src"), F.col("p.b").alias("dst"))
    )
    return triangle_counts(edges)


def _q_dedup_fuzzy_clusters(spark, sf_dir):
    # fuzzy pairs -> connected components -> per-record canonical
    # verdict: the same pointer-jumping CC machinery as dedup_clusters
    # over the blocked-levenshtein edge list
    from yardstick_spark.llm import dedup_assign, fuzzy_cluster_edges

    _ys(spark, sf_dir)
    part = spark.table("part")
    # connectivity-equivalent star+rep edges, NOT the all-pairs list:
    # identical-name cliques (20k parts / 64 names at sf0.1 = 3.8M
    # edit-0 edges) collapse to one star edge per member
    pairs = fuzzy_cluster_edges(part, "p_partkey", "p_name", max_edit=1)
    return dedup_assign(part, pairs, id_col="p_partkey")


def _q_graph_doc_rank(spark, sf_dir):
    # canonical-document centrality: PageRank over the (symmetrized)
    # MinHash-LSH near-dup graph — inside a duplicate cluster the
    # highest-rank doc is the best canonical pick (most corroborated
    # by near-copies).  Composition of two oracled operators, itself
    # oracled end-to-end: the SQL twin feeds the bit-exact minhash
    # pair SQL into the unrolled-CTE power iteration.
    from pyspark.sql import functions as F

    from yardstick_spark.llm import minhash_lsh_pairs
    from yardstick_spark.operators import pagerank

    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_pairs(
        docs, k=5, num_hashes=32, bands=8, threshold=0.5
    )
    # symmetrize=True makes pagerank emit both directions in ONE pass
    # over the pair rows — a caller-side unionAll of the swap would
    # evaluate the (expensive) pair-generation subtree once per leg
    edges = pairs.selectExpr("id_a AS src", "id_b AS dst")
    return pagerank(edges, iterations=6, symmetrize=True).select(
        "node", F.round("rank", 6).alias("rank")
    )


def _q_ops_benford(spark, sf_dir):
    # Benford first-digit screen on order totals — the classic audit
    # check for generated/tampered amounts (operators/profile.py)
    from yardstick_spark.operators import benford_profile

    _ys(spark, sf_dir)
    return benford_profile(spark.table("orders"), "o_totalprice")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Dict order matters: the driver's correctness gate checks entries in
    # order and may truncate at 50.  Round-4 ordering: the new r4 operators
    # and tpch_q12 (the one never-green row, now cast/ordered) go FIRST,
    # then the 39 entries that fell outside the r3 window (so their green
    # row refreshes this round), then the r3-green block fills the rest.
    # sim_knn_ivf_kmeans stays out of the inventory (no SQL oracle by
    # design — FP mean updates aren't portable); its recall gate lives in
    # tests/test_scale_ops.py.
    r4_new: dict[str, Callable] = {
        "text_repetition": _q_text_repetition,
        "text_source_quota": _q_text_source_quota,
        "text_tfidf": _q_text_tfidf,
        "dedup_incremental": _q_dedup_incremental,
        "text_split": _q_text_split,
        "mm_stats": _q_mm_stats,
        "text_pack": _q_text_pack,
        "events_json": _q_events_json,
        "pipeline_curation_full": _q_pipeline_full,
        "text_fp_overlap": _q_text_fp_overlap,
        "text_corpus_report": _q_text_report,
        "events_funnel": _q_events_funnel,
        "emb_stats": _q_emb_stats,
        "events_retention": _q_events_retention,
        "tpch_q12": _measure_runner(_MEASURE_QUERIES["tpch_q12"]),
        # round-5 wave-3 additions (ordered first via _R5_NEW)
        "graph_pagerank": _q_graph_pagerank,
        "ops_zorder": _q_ops_zorder,
        "dedup_fuzzy": _q_dedup_fuzzy,
        "events_pivot": _q_events_pivot,
        "mm_phash": _q_mm_phash,
        "dedup_fuzzy_clusters": _q_dedup_fuzzy_clusters,
        "graph_doc_rank": _q_graph_doc_rank,
        "ops_benford": _q_ops_benford,
        "mm_audio_fp": _q_mm_audio_fp,
        "emb_covariance": _q_emb_covariance,
        "emb_jl_project": _q_emb_jl_project,
        "graph_triangles": _q_graph_triangles,
        "emb_pq": _q_emb_pq,
        "sim_knn_pq": _q_sim_knn_pq,
        "sim_knn_pq_trained": _q_sim_knn_pq_trained,
        "emb_outliers": _q_emb_outliers,
        "graph_communities": _q_graph_communities,
        "sim_mmr": _q_sim_mmr,
        "text_zipf": _q_text_zipf,
        "mm_scene_cuts": _q_mm_scene_cuts,
        "dedup_containment": _q_dedup_containment,
        "text_lang_confusion": _q_text_lang_confusion,
        "dedup_minhash_eval": _q_dedup_minhash_eval,
        # round-5 additions (ordered first via _R5_NEW)
        "dedup_semantic": _q_dedup_semantic,
        # round-8 retrieval wave (ordered first via _R8_LEAD)
        "ret_bm25": _q_ret_bm25,
        "ret_bm25_indexed": _q_ret_bm25_indexed,
        "ret_bm25_incremental": _q_ret_bm25_incremental,
        "ret_rrf": _q_ret_rrf,
        "ret_hybrid": _q_ret_hybrid,
        "emb_decontaminate": _q_emb_decontaminate,
        "ret_eval": _q_ret_eval,
        "text_mixture_weights": _q_text_mixture_weights,
        "text_unigram_logprob": _q_text_unigram_logprob,
        "events_transitions": _q_events_transitions,
        "events_anomaly": _q_events_anomaly,
        "text_sample_weighted": _q_text_sample_weighted,
        "ops_profile": _q_ops_profile,
        "ops_histogram": _q_ops_histogram,
        "emb_hard_negatives": _q_emb_hard_negatives,
        "emb_prototypes": _q_emb_prototypes,
        "emb_medoids": _q_emb_medoids,
        "emb_quantize": _q_emb_quantize,
        "sim_knn_quantized": _q_sim_knn_quantized,
        "events_paths": _q_events_paths,
        "text_vocab_coverage": _q_text_vocab_coverage,
        "text_ngrams": _q_text_ngrams,
        "ops_cdc_compact": _q_ops_cdc_compact,
        "ops_scd2": _q_ops_scd2,
        "ops_scd2_lookup": _q_ops_scd2_lookup,
        "pipeline_embeddings": _q_pipeline_embeddings,
        "ops_expectations": _q_ops_expectations,
        "text_heavy_hitters": _q_text_heavy_hitters,
        "ops_incremental_agg": _q_ops_incremental_agg,
        "ops_table_diff": _q_ops_table_diff,
        "text_dup_spans": _q_text_dup_spans,
        "text_char_entropy": _q_text_char_entropy,
        "ops_gap_fill": _q_ops_gap_fill,
        "text_stratified": _q_text_stratified,
        "ops_asof_forward": _q_asof_forward,
        "sim_knn_lsh_persisted": _q_knn_lsh_persisted,
        "ops_skew_report": _q_ops_skew_report,
        "text_bigram_logprob": _q_text_bigram_logprob,
    }
    out: dict[str, Callable] = {
        "sim_knn_lsh": _q_knn_lsh,
        "sim_knn_lsh_multiprobe": _q_knn_lsh_multiprobe,
        "sim_knn_ivf": _q_knn_ivf,
        "text_tokens": _q_tokens,
        "text_quality": _q_quality,
        "text_langid": _q_langid,
        "text_fingerprint": _q_fingerprint,
        "text_gopher": _q_text_gopher,
        "text_pii": _q_text_pii,
        "text_topterms": _q_text_topterms,
        "text_chunks": _q_text_chunks,
        "pipeline_curation": _q_pipeline_curation,
        "text_mixture": _q_text_mixture,
        "mm_decode": _q_mm_decode,
        "mm_frame_sample": _q_mm_frames,
        "events_tumbling": _q_events_tumbling,
        "events_attribution": _q_events_attribution,
        "events_sliding": _q_events_sliding,
        "events_sessionize": _q_events_sessionize,
        "ops_asof_join": _q_asof_join,
        "ops_range_join": _q_range_join,
        "events_rollup_daily": _q_events_rollup_daily,
        "ops_topk_per_group": _q_topk_per_group,
        "text_decontaminate": _q_text_decontaminate,
    }
    for name in _R3_FIRST:
        out[name] = _measure_runner(_MEASURE_QUERIES[name])
    out.update(
        {name: _measure_runner(sql) for name, sql in _MEASURE_QUERIES.items()}
    )
    out.update(
        {
            "dedup_exact": _q_dedup_exact,
            "dedup_ngram_jaccard": _q_dedup_ngram,
            "dedup_minhash_lsh": _q_dedup_minhash,
            "dedup_lines": _q_dedup_lines,
            "ops_split_leakage": _q_split_leakage,
            "ops_leakage_safe_split": _q_leakage_safe_split,
            "dedup_keep_best": _q_dedup_keep_best,
            "text_token_budget": _q_token_budget,
            "dedup_lines_incremental": _q_dedup_lines_incr,
            "dedup_source_matrix": _q_dedup_source_matrix,
            "text_mojibake": _q_text_mojibake,
            "dedup_survivorship": _q_dedup_survivorship,
            "events_dedup_window": _q_events_dedup_window,
            "dedup_simhash": _q_dedup_simhash,
            "dedup_simhash_pairs": _q_dedup_simhash_pairs,
            "dedup_clusters": _q_dedup_clusters,
            "mm_decode_real": _q_mm_decode_real,
            "mm_decode_png": _q_mm_decode_png,
            "mm_decode_jpeg": _q_mm_decode_jpeg,
            "mm_decode_jpeg_color": _q_mm_decode_jpeg_color,
            "mm_resize": _q_mm_resize,
            "mm_resize_png": _q_mm_resize_png,
            "dedup_embedding": _q_dedup_embedding,
            "sim_knn_bruteforce": _q_knn,
            "text_dsir_weights": _q_text_dsir_weights,
            "text_dsir_sample": _q_text_dsir_sample,
            "text_dsir_xxh": _q_text_dsir_xxh,
            "emb_kmeans": _q_emb_kmeans,
            "emb_cluster_sample": _q_emb_cluster_sample,
            "text_dsir_incremental": _q_text_dsir_incremental,
            "emb_margin_pairs": _q_emb_margin_pairs,
            "text_shard_manifest": _q_text_shard_manifest,
        }
    )
    full = dict(r4_new)
    full.update({k: v for k, v in out.items() if k not in full})
    lead = [k for k in (*_R11_LEAD, *_R10_LEAD, *_R9_LEAD, *_R8_LEAD,
                        *_R7_LEAD, *_R6_LEAD, *_R5_NEW, *_R5_STALE_R2,
                        *_R5_STALE_R3)
            if k in full]
    seen = set()
    lead = [k for k in lead if not (k in seen or seen.add(k))]
    return {k: full[k] for k in (*lead, *(k for k in full
                                          if k not in seen))}


# Round-11 driver-window rotation (the driver checks the FIRST 50
# entries): (1) the 20 entries whose last driver row dates from round
# 6 — the stalest block, exactly the set the r10 comment promised
# (tpch_q12, events_retention, emb_stats, and the densely
# corpus-replayed m_* measure block + tpch_q1/q3/q5/q6/q4); (2) the
# 5 entries whose Spark-side code changed this round — the JPEG
# codec (Cr blue coefficient fixed to the BT.601 -0.081312, restart
# markers now rejected loudly: mm_decode_jpeg, mm_decode_jpeg_color)
# and the three consumers of the store-update protocol fix
# (committed-batch pending markers no longer trigger a destructive
# rollback; DSIR fingerprint gains an id-hash term:
# ret_bm25_incremental, ret_bm25_indexed, text_dsir_incremental);
# (3) 25 of the 33 round-7-stale entries fill the remaining slots.
# The 8 deferred r7 entries (tpch_q2/q9/q11/q16/q20/q21 — the most
# heavily locally-oracled block — plus pipeline_curation and
# text_topterms) lead the r12 window.  Every inventory entry
# additionally gets a local ORACLE_SWEEP_r11 row.
_R11_LEAD: list[str] = [
    # last driver row round 6 (stalest — all 20)
    "tpch_q12", "events_retention", "emb_stats", "m_having",
    "m_multifact", "m_fanout_immunity", "m_nd_count_distinct",
    "m_nd_median", "m_nd_at_all", "m_cte", "m_groupby_all", "m_topk",
    "m_rollup", "m_window_measure", "m_row_level_listing12",
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q4",
    # changed this round — must re-green in the driver
    "mm_decode_jpeg", "mm_decode_jpeg_color",
    "ret_bm25_incremental", "ret_bm25_indexed", "text_dsir_incremental",
    # last driver row round 7 (25 of 33; the rest lead r12)
    "dedup_embedding", "emb_covariance", "events_attribution",
    "events_rollup_daily", "events_sessionize", "events_sliding",
    "events_tumbling", "mm_decode", "mm_frame_sample", "ops_asof_join",
    "ops_range_join", "ops_topk_per_group", "sim_knn_bruteforce",
    "sim_knn_ivf", "sim_knn_lsh", "sim_knn_lsh_multiprobe",
    "text_chunks", "text_decontaminate", "text_fingerprint",
    "text_gopher", "text_langid", "text_mixture", "text_pii",
    "text_quality", "text_tokens",
]


# Round-10 driver-window rotation (the driver checks the FIRST 50
# entries): (1) the 16 entries whose last driver row dates from round
# 5 — the stalest block, deferred from the r9 window exactly as its
# comment promised; (2) the 3 round-10 additions, never
# driver-oracled (mm_decode_png, sim_knn_pq_trained oracled;
# text_dsir_xxh rows-only BY DESIGN — no DuckDB xxhash64 twin, the
# value pin is the local pure-Python XXH64 bucket-count test); (3)
# the 8 entries whose Spark-side code changed this round — the
# pagerank driver gate (graph_pagerank, graph_doc_rank), the pq.py
# train refactor's seeded-path consumers (sim_knn_pq, emb_pq), the
# similarity.py boundary-probe threading (dedup_semantic, default
# path bit-identical but edited), the BM25 crash-safe update +
# read-time heal (ret_bm25_incremental, ret_bm25_indexed), the DSIR
# store heal (text_dsir_incremental), and the PNG branch in
# decode_real (mm_decode_real); (4) the 23 stalest round-6 rows fill
# the remaining slots to exactly 50.  The other 17 r6-stale entries
# (the densely corpus-replayed m_* block) lead the r11 window.
_R10_LEAD: list[str] = [
    # last driver row round 5 (stalest — all 16)
    "ops_zorder", "events_pivot", "ops_benford", "mm_audio_fp",
    "emb_jl_project", "emb_pq", "text_zipf", "mm_scene_cuts",
    "text_lang_confusion", "events_transitions", "events_anomaly",
    "text_sample_weighted", "emb_prototypes", "text_char_entropy",
    "ops_gap_fill", "text_stratified",
    # round-10 additions — never driver-oracled
    "mm_decode_png", "mm_decode_jpeg", "mm_decode_jpeg_color",
    "mm_resize_png", "sim_knn_pq_trained", "text_dsir_xxh",
    # changed this round — must re-green in the driver
    "graph_pagerank", "graph_doc_rank", "sim_knn_pq",
    "dedup_semantic", "ret_bm25_incremental", "ret_bm25_indexed",
    "text_dsir_incremental", "mm_decode_real",
    # last driver row round 6 (22 of 40; the rest lead r11)
    "ops_asof_forward", "ops_window_distinct", "sim_knn_lsh_persisted",
    "ops_skew_report", "text_bigram_logprob", "dedup_lines",
    "text_token_budget", "dedup_lines_incremental", "text_mojibake",
    "events_dedup_window", "text_repetition", "text_source_quota",
    "text_tfidf", "text_split", "mm_stats", "text_pack", "events_json",
    "text_fp_overlap", "text_corpus_report", "events_funnel",
    # (tpch_q12, events_retention and emb_stats yield their slots to
    # the round-10 media entries; they lead r11 with the m_* block)
]


# Round-9 driver-window rotation (the driver checks the FIRST 50
# entries): (1) the 13 entries whose last driver row dates from round
# 4 — the stalest block, cut from the r8 window's tail (the r8 lead
# listed 57 names for 50 slots); (2) the 9 entries whose Spark-side
# code changed this round — the fuzzy pair/collapse family
# (member-grain max_block cap), the three DSIR entries (hash_impl
# threading, md5 default), and the BM25 consumers of the bm25_scores
# tokens_col refactor + the rename-aside store swap; (3) 28 of the 42
# round-5-stale entries fill the remaining slots, leading with the
# entries this round's perf tasks touch (ops_profile, mm_phash,
# pipeline_embeddings) and the VERDICT-named rotation heads.  The 14
# deferred r5 entries (ops_zorder, events_pivot, ops_benford,
# mm_audio_fp, emb_jl_project, emb_pq, emb_outliers, text_zipf,
# mm_scene_cuts, text_lang_confusion, events_transitions,
# events_anomaly, text_sample_weighted, emb_prototypes — the block
# with the densest property-test/corpus coverage) lead the r10 window.
# Every inventory entry additionally gets a local ORACLE_SWEEP_r9 row.
_R9_LEAD: list[str] = [
    # last driver row round 4 (stalest)
    "tpch_q15", "tpch_q17", "tpch_q22", "ops_window_running",
    "ops_percentiles", "dedup_exact", "tpch_q7", "tpch_q8",
    "tpch_q10", "tpch_q13", "tpch_q14", "tpch_q18", "tpch_q19",
    # changed this round — must re-green in the driver
    "dedup_fuzzy", "dedup_fuzzy_clusters",
    "text_dsir_weights", "text_dsir_sample", "text_dsir_incremental",
    "ret_bm25", "ret_rrf", "ret_hybrid", "ret_bm25_incremental",
    "text_shard_manifest",  # r9 deterministic range buckets
    "emb_outliers",  # r9 signed-zero canonicalization of z (both sides)
    "mm_resize",  # r9 exact-integer-grid comparison (sum_px)
    # last driver row round 5 (28 of 42; the rest lead r10)
    "ops_profile", "mm_phash", "pipeline_embeddings",
    "ops_scd2_lookup", "ops_expectations", "text_dup_spans", "sim_mmr",
    "graph_triangles", "sim_knn_pq", "dedup_semantic",
    "text_mixture_weights", "text_unigram_logprob", "ops_histogram",
    "emb_hard_negatives", "emb_medoids", "emb_quantize",
    "sim_knn_quantized", "events_paths", "text_vocab_coverage",
    "text_ngrams", "ops_cdc_compact", "ops_scd2", "text_heavy_hitters",
    "ops_incremental_agg", "ops_table_diff",
    # text_stratified, ops_gap_fill and text_char_entropy displaced by
    # the shard_assign / emb_outliers / mm_resize changes; they join
    # the deferred r5 entries leading the r10 window
]


# Round-8 driver-window rotation (the driver checks the FIRST 50
# entries): (1) the 4 round-8 retrieval additions (never
# driver-oracled); (2) the 17 entries whose Spark-side code changed
# this round — every consumer of the shingle/minhash/simhash NULL
# contract (_shingled empty-set change, _banded_buckets NULL filter,
# simhash64 NULL propagation, family-collapse singleton rule, dropped
# caller-side caches) plus the 3 graph entries (edge checkpoints now
# in the shared registry); (3) the 19 measure/ops entries whose last
# driver row dates from round 3 — the stalest block; (4) 10 of the 13
# round-4-stale entries fill the remaining slots (tpch_q22,
# dedup_exact and ops_percentiles defer to the r9 head — all pinned
# by golden plan / corpus tests locally).  Every entry also gets a
# local ORACLE_SWEEP_r8 row.
_R8_LEAD: list[str] = [
    # round-8 additions — never driver-oracled
    "text_dsir_weights", "text_dsir_sample", "text_dsir_incremental",
    "emb_kmeans", "emb_cluster_sample", "emb_margin_pairs",
    "text_shard_manifest",
    "ret_bm25", "ret_bm25_indexed", "ret_bm25_incremental", "ret_rrf",
    "ret_hybrid", "emb_decontaminate", "ret_eval",
    # changed this round (NULL contract + graph registry)
    "dedup_ngram_jaccard", "dedup_containment", "dedup_minhash_lsh",
    "dedup_minhash_eval", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_clusters", "dedup_keep_best", "dedup_source_matrix",
    "dedup_survivorship", "dedup_incremental", "ops_split_leakage",
    "ops_leakage_safe_split", "pipeline_curation_full",
    "graph_pagerank", "graph_communities", "graph_doc_rank",
    # last driver row round 3 (stalest block)
    "m_cube", "ops_pivot", "ops_window_funcs", "ops_unpivot",
    "m_grouping_sets", "m_star_join", "m_at_set_const",
    "m_derived_at_all", "m_grand_total", "m_at_all_share",
    "m_at_all_dim", "m_at_where", "m_at_set_yoy", "m_at_visible",
    "m_at_chained", "m_at_all_month", "m_agg_basic",
    "m_implicit_default", "m_derived_ratio",
    # last driver row round 4 (11 of 13; q22 + dedup_exact lead r9)
    "tpch_q7", "tpch_q10", "tpch_q14", "tpch_q18", "tpch_q19",
    "tpch_q8", "tpch_q13",
    # tpch_q15, tpch_q17, ops_window_running, ops_percentiles,
    # tpch_q22 and dedup_exact lead the r9 window head
]


# Round-7 driver-window rotation (the driver checks the FIRST 50
# entries): (1) the 17 entries whose Spark-side plan changed this
# round — emb_covariance (the one red r6 row, signed-zero
# canonicalization on both engines), the 12 consumers of the
# identical-key family collapse now inside every near-dup candidate
# generator, the 3 graph entries (eager edge barrier +
# explode-the-swap symmetrization in pagerank AND label_propagation),
# and sim_knn_ivf (folded closure collects) — changed code must
# re-green in the driver, not just the local sweep; (2) the 4 entries
# whose last driver row dates from round 2; (3) the round-3-green
# block (measure modifiers + sim/text wave-1) fills the remaining 29
# slots — its tail (window funcs, AT-modifier family) is the most
# densely corpus-replayed code in the repo, so it carries the
# strongest non-driver evidence and leads the r8 window.  Every
# inventory entry additionally gets a local ORACLE_SWEEP_r7 row.
_R7_LEAD: list[str] = [
    # changed this round — must re-green in the driver
    "emb_covariance",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_containment",
    "dedup_simhash_pairs", "dedup_clusters", "dedup_keep_best",
    "dedup_survivorship", "dedup_source_matrix", "ops_split_leakage",
    "ops_leakage_safe_split", "dedup_minhash_eval",
    "pipeline_curation_full", "graph_pagerank", "graph_doc_rank",
    "graph_communities", "sim_knn_ivf",
    # last driver row round 2
    "dedup_embedding", "mm_decode_real", "mm_resize", "sim_knn_bruteforce",
    # last driver row round 3 (as many as fit; the rest lead r8)
    "sim_knn_lsh", "sim_knn_lsh_multiprobe", "text_tokens",
    "text_quality", "text_langid", "text_fingerprint", "text_gopher",
    "text_pii", "text_topterms", "text_chunks", "pipeline_curation",
    "text_mixture", "mm_decode", "mm_frame_sample", "events_tumbling",
    "events_attribution", "events_sliding", "events_sessionize",
    "ops_asof_join", "ops_range_join", "events_rollup_daily",
    "ops_topk_per_group", "text_decontaminate", "tpch_q2", "tpch_q9",
    "tpch_q11", "tpch_q16", "tpch_q20", "tpch_q21", "m_cube", "ops_pivot",
    "ops_window_funcs", "ops_unpivot", "m_grouping_sets", "m_star_join",
    "m_at_set_const", "m_derived_at_all", "m_grand_total",
    "m_at_all_share", "m_at_all_dim", "m_at_where", "m_at_set_yoy",
    "m_at_visible", "m_at_chained", "m_at_all_month",
    # deferred to the r8 window head (corpus-covered measure basics)
    "m_agg_basic", "m_implicit_default", "m_derived_ratio",
]


# Round-6 driver-window rotation (the driver checks the FIRST 50
# entries): (1) the 5 entries that landed after the r5 window was set
# and so have never had a driver correctness row; (2) the 3 entries
# whose semantics/oracles changed this round (emb_covariance's
# exact-integer determinism fix — the one red r5 row — and the fuzzy
# pair set now including edit==0); (3) new round-6 operators; then the
# r4-green block whose last driver row is two rounds old fills the
# remaining slots.  Every inventory entry additionally gets a local
# ORACLE_SWEEP_r6 row.
_R6_LEAD: list[str] = [
    # never driver-oracled (landed after the r5 window was fixed)
    "ops_asof_forward", "ops_window_distinct", "sim_knn_lsh_persisted",
    "ops_skew_report", "text_bigram_logprob",
    # changed this round
    "emb_covariance", "dedup_fuzzy", "dedup_fuzzy_clusters",
    # round-6 additions go here as they land
    "dedup_lines", "ops_split_leakage", "ops_leakage_safe_split",
    "dedup_keep_best", "text_token_budget", "dedup_lines_incremental",
    "dedup_source_matrix", "text_mojibake", "dedup_survivorship",
    "events_dedup_window",
    # r4-stale refresh (last green driver row dates from round 4)
    "text_repetition", "text_source_quota", "text_tfidf",
    "dedup_incremental", "text_split", "mm_stats", "text_pack",
    "events_json", "pipeline_curation_full", "text_fp_overlap",
    "text_corpus_report", "events_funnel", "emb_stats",
    "events_retention", "tpch_q12", "m_having", "m_multifact",
    "m_fanout_immunity", "m_nd_count_distinct", "m_nd_median",
    "m_nd_at_all", "m_cte", "m_groupby_all", "m_topk", "m_rollup",
    "m_window_measure", "m_row_level_listing12", "tpch_q1", "tpch_q3",
    "tpch_q5", "tpch_q6", "tpch_q4", "tpch_q7", "tpch_q10", "tpch_q14",
    "tpch_q18", "tpch_q19", "tpch_q8", "tpch_q13", "tpch_q15",
    "tpch_q17", "ops_window_running", "ops_percentiles", "tpch_q22",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_simhash_pairs", "dedup_clusters",
]


# Round-5 driver-window rotation (the driver's correctness gate
# truncates at 50 entries): new round-5 operators first, then the 4
# entries whose last green driver row dates from round 2 (re-verified
# locally in round 4 via tests/oracle_diff.py, but the driver record
# should show it), then the 49 round-3-green entries.  The 50 entries
# green in CORRECTNESS_r04 fall to the back — every inventory entry
# then has a green driver row within the last two rounds.
_R5_NEW: list[str] = [
    # wave-3 (newest — must land inside the 50-entry driver window)
    "graph_pagerank", "ops_zorder", "dedup_fuzzy", "events_pivot",
    "mm_phash", "dedup_fuzzy_clusters", "graph_doc_rank", "ops_benford",
    "mm_audio_fp", "emb_covariance", "emb_jl_project", "graph_triangles",
    "emb_pq", "sim_knn_pq", "emb_outliers", "graph_communities",
    "sim_mmr", "text_zipf", "mm_scene_cuts", "dedup_containment",
    "text_lang_confusion", "dedup_minhash_eval",
    "dedup_semantic", "text_mixture_weights", "text_unigram_logprob",
    "events_transitions", "events_anomaly", "text_sample_weighted",
    "ops_profile", "ops_histogram", "emb_hard_negatives",
    "emb_prototypes", "emb_medoids", "emb_quantize",
    "sim_knn_quantized", "events_paths", "text_vocab_coverage",
    "text_ngrams", "ops_cdc_compact", "ops_scd2", "ops_scd2_lookup",
    "pipeline_embeddings", "ops_expectations", "text_heavy_hitters",
    "ops_incremental_agg", "ops_table_diff", "text_dup_spans",
    "text_char_entropy", "ops_gap_fill", "text_stratified",
    "ops_asof_forward", "ops_window_distinct", "sim_knn_lsh_persisted",
    "ops_skew_report", "text_bigram_logprob",
]

_R5_STALE_R2 = [
    "dedup_embedding", "mm_decode_real", "mm_resize", "sim_knn_bruteforce",
]

_R5_STALE_R3 = [
    "sim_knn_lsh", "sim_knn_lsh_multiprobe", "sim_knn_ivf", "text_tokens",
    "text_quality", "text_langid", "text_fingerprint", "text_gopher",
    "text_pii", "text_topterms", "text_chunks", "pipeline_curation",
    "text_mixture", "mm_decode", "mm_frame_sample", "events_tumbling",
    "events_attribution", "events_sliding", "events_sessionize",
    "ops_asof_join", "ops_range_join", "events_rollup_daily",
    "ops_topk_per_group", "text_decontaminate", "tpch_q2", "tpch_q9",
    "tpch_q11", "tpch_q16", "tpch_q20", "tpch_q21", "m_cube", "ops_pivot",
    "ops_window_funcs", "ops_unpivot", "m_grouping_sets", "m_star_join",
    "m_at_set_const", "m_derived_at_all", "m_agg_basic", "m_grand_total",
    "m_at_all_share", "m_at_all_dim", "m_at_where", "m_at_set_yoy",
    "m_at_visible", "m_at_chained", "m_at_all_month", "m_derived_ratio",
    "m_implicit_default",
]


# ---------------------------------------------------------------------------
# DuckDB oracles — plain ANSI SQL over the pre-registered parquet views
# ---------------------------------------------------------------------------

_REV = "SUM(l_extendedprice * (1 - l_discount))"
_NORM_DOC = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


def _rrf_tail_sql(union_sql: str, top_k: int = 10) -> str:
    """Shared RRF fusion tail: `union_sql` yields (id, rank) rows from
    the bounded per-retriever top-k lists; at most two contributions
    per id sum commutatively, so the float fold is order-independent."""
    return f"""
        u AS ({union_sql}),
        fused AS (SELECT id, ROUND(SUM(1.0 / (60 + rank)), 6) AS rrf,
                         CAST(COUNT(*) AS INT) AS n_lists
                  FROM u GROUP BY id)
        SELECT id AS doc_id, rrf, n_lists,
               CAST(row_number() OVER (ORDER BY rrf DESC, id) AS INT)
                 AS rank
        FROM fused ORDER BY rrf DESC, id LIMIT {top_k}"""


def oracle_sql() -> dict[str, str]:
    from yardstick_spark.llm import bm25_sql

    o: dict[str, str] = {}
    o["ret_bm25"] = bm25_sql(_RET_QUERY, top_k=10)
    # the persisted-index path must reproduce the scan path bit-for-bit
    o["ret_bm25_indexed"] = o["ret_bm25"]
    o["ret_bm25_incremental"] = o["ret_bm25"]
    # same cosine fold as the kNN oracles; ties on the rounded max take
    # the smallest bench id; unscoreable vectors excluded on both sides
    o["emb_decontaminate"] = """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        b AS (SELECT vec_id AS bid, e,
                     sqrt(list_sum(list_transform(e, x -> x * x))) AS bn
              FROM v WHERE vec_id < 20),
        c AS (SELECT vec_id AS cid, e,
                     sqrt(list_sum(list_transform(e, x -> x * x))) AS cn
              FROM v WHERE vec_id >= 20),
        s AS (SELECT cid, bid,
                ROUND(list_sum(list_transform(list_zip(c.e, b.e),
                                              x -> x[1] * x[2]))
                  / (cn * bn), 4) AS sim
              FROM c CROSS JOIN b
              WHERE len(c.e) = len(b.e) AND cn > 0 AND bn > 0),
        m AS (SELECT cid, MAX(sim) AS max_sim FROM s
              WHERE sim IS NOT NULL GROUP BY cid)
        SELECT s.cid AS vec_id, MIN(s.bid) AS bench_id, m.max_sim,
               CAST(m.max_sim >= 0.9 AS INT) AS contaminated
        FROM s JOIN m ON s.cid = m.cid AND s.sim = m.max_sim
        GROUP BY s.cid, m.max_sim"""
    o["ret_rrf"] = f"""
        WITH lex1 AS ({bm25_sql(_RET_QUERY, top_k=15)}),
        lex2 AS ({bm25_sql(_RET_QUERY2, top_k=15)}),
        {_rrf_tail_sql('''SELECT doc_id AS id, rank FROM lex1
                  UNION ALL SELECT doc_id, rank FROM lex2''')}"""
    # dense leg mirrors the sim_knn_bruteforce oracle's cosine (same
    # rounding-then-rank), query vector = embeddings row vec_id 7, no
    # self-exclusion (the hybrid query id is synthetic)
    o["ret_hybrid"] = f"""
        WITH lex AS ({bm25_sql(_RET_QUERY, top_k=15)}),
        v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings),
        q AS (SELECT e FROM v WHERE vec_id = 7),
        dsc AS (SELECT c.vec_id AS id,
            ROUND(list_sum(list_transform(list_zip(q.e, c.e),
                                          x -> x[1] * x[2]))
              / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
                 * sqrt(list_sum(list_transform(c.e, x -> x * x)))), 4)
              AS sim
          FROM v c CROSS JOIN q),
        dense AS (SELECT id, rank FROM (
            SELECT id, CAST(row_number() OVER (ORDER BY sim DESC, id)
                            AS INT) AS rank FROM dsc) WHERE rank <= 15),
        {_rrf_tail_sql('''SELECT doc_id AS id, rank FROM lex
                  UNION ALL SELECT id, rank FROM dense''')}"""
    o["m_agg_basic"] = f"""
        SELECT l_returnflag, l_linestatus, ROUND({_REV}, 2) AS revenue,
               ROUND(SUM(l_quantity), 2) AS total_qty, COUNT(*) AS line_count
        FROM lineitem GROUP BY l_returnflag, l_linestatus"""
    o["m_grand_total"] = f"""
        SELECT ROUND({_REV}, 2) AS revenue, COUNT(*) AS line_count FROM lineitem"""
    o["m_at_all_share"] = f"""
        WITH g AS (SELECT l_returnflag, {_REV} AS r FROM lineitem GROUP BY 1),
             t AS (SELECT SUM(r) AS tr FROM g)
        SELECT l_returnflag, ROUND(r, 2) AS rev, ROUND(tr, 2) AS total_rev,
               ROUND(r / tr * 100, 4) AS pct
        FROM g CROSS JOIN t"""
    o["m_at_all_dim"] = f"""
        WITH g AS (SELECT YEAR(l_shipdate) AS d_year, l_returnflag, {_REV} AS r
                   FROM lineitem GROUP BY 1, 2)
        SELECT d_year, l_returnflag, ROUND(r, 2) AS rev,
               ROUND(SUM(r) OVER (PARTITION BY d_year), 2) AS year_total
        FROM g"""
    o["m_at_where"] = f"""
        WITH g AS (SELECT YEAR(l_shipdate) AS d_year, {_REV} AS r
                   FROM lineitem GROUP BY 1),
             w AS (SELECT {_REV} AS rr FROM lineitem WHERE l_returnflag = 'R')
        SELECT d_year, ROUND(r, 2) AS rev, ROUND(rr, 2) AS returned_rev
        FROM g CROSS JOIN w"""
    o["m_at_set_yoy"] = f"""
        WITH g AS (SELECT YEAR(l_shipdate) AS d_year, {_REV} AS r
                   FROM lineitem GROUP BY 1)
        SELECT g.d_year, ROUND(g.r, 2) AS rev, ROUND(p.r, 2) AS prev_rev
        FROM g LEFT JOIN g p ON p.d_year = g.d_year - 1"""
    o["m_at_visible"] = f"""
        WITH v AS (SELECT l_returnflag, {_REV} AS r FROM lineitem
                   WHERE YEAR(l_shipdate) >= 1997 GROUP BY 1),
             t AS (SELECT {_REV} AS tr FROM lineitem)
        SELECT l_returnflag, ROUND(r, 2) AS vis_rev, ROUND(tr, 2) AS all_rev
        FROM v CROSS JOIN t"""
    o["m_at_chained"] = f"""
        WITH g AS (SELECT YEAR(l_shipdate) AS d_year, l_returnflag, l_linestatus,
                          {_REV} AS r FROM lineitem GROUP BY 1, 2, 3)
        SELECT d_year, l_returnflag, l_linestatus, ROUND(r, 2) AS rev,
               ROUND(SUM(r) OVER (PARTITION BY d_year), 2) AS year_total,
               ROUND(SUM(r) OVER (PARTITION BY d_year), 2) AS year_total_chained
        FROM g"""
    o["m_at_all_month"] = f"""
        WITH g AS (SELECT l_returnflag, MONTH(l_shipdate) AS ship_month,
                          {_REV} AS r FROM lineitem GROUP BY 1, 2)
        SELECT l_returnflag, ship_month, ROUND(r, 2) AS rev,
               ROUND(SUM(r) OVER (PARTITION BY l_returnflag), 2) AS flag_total
        FROM g"""
    o["m_derived_ratio"] = f"""
        SELECT l_returnflag,
               ROUND({_REV} / SUM(l_quantity), 4) AS rev_per_unit
        FROM lineitem GROUP BY l_returnflag"""
    o["m_implicit_default"] = """
        WITH grp AS (SELECT DISTINCT l_returnflag FROM lineitem
                     WHERE YEAR(l_shipdate) = 1998),
             q AS (SELECT l_returnflag, SUM(l_quantity) AS tq
                   FROM lineitem GROUP BY 1)
        SELECT grp.l_returnflag, q.tq AS total_qty
        FROM grp JOIN q USING (l_returnflag)"""
    o["m_having"] = f"""
        SELECT YEAR(l_shipdate) AS d_year, ROUND({_REV}, 2) AS rev
        FROM lineitem GROUP BY 1 HAVING {_REV} > 40000000"""
    o["m_multifact"] = f"""
        WITH lg AS (SELECT YEAR(l_shipdate) AS d_year, {_REV} AS r
                    FROM lineitem GROUP BY 1),
             og AS (SELECT YEAR(o_orderdate) AS d_year, SUM(o_totalprice) AS orv
                    FROM orders GROUP BY 1)
        SELECT lg.d_year AS d_year, ROUND(lg.r, 2) AS rev, ROUND(og.orv, 2) AS orev
        FROM lg JOIN og USING (d_year)"""
    o["m_fanout_immunity"] = """
        WITH g AS (SELECT o_orderpriority AS prio, ROUND(SUM(o_totalprice), 2)
                   AS orev FROM orders GROUP BY 1),
             j AS (SELECT o.o_orderpriority AS prio, COUNT(*) AS joined_rows
                   FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                   GROUP BY 1)
        SELECT j.prio, g.orev, j.joined_rows FROM j JOIN g USING (prio)"""
    o["m_nd_count_distinct"] = """
        SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS supp_count
        FROM lineitem GROUP BY l_returnflag"""
    o["m_nd_median"] = """
        SELECT l_returnflag, ROUND(MEDIAN(l_quantity), 2) AS med_qty
        FROM lineitem GROUP BY l_returnflag"""
    o["m_nd_at_all"] = """
        WITH t AS (SELECT COUNT(DISTINCT l_suppkey) AS st FROM lineitem)
        SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS supp_count, t.st AS supp_total
        FROM lineitem CROSS JOIN t GROUP BY l_returnflag, t.st"""
    o["m_cte"] = f"""
        WITH yearly AS (SELECT YEAR(l_shipdate) AS d_year, ROUND({_REV}, 2) AS rev
                        FROM lineitem GROUP BY 1)
        SELECT COUNT(*) AS n_years, ROUND(SUM(rev), 2) AS total FROM yearly"""
    o["m_groupby_all"] = f"""
        SELECT l_returnflag, l_linestatus, ROUND({_REV}, 2) AS rev
        FROM lineitem GROUP BY 1, 2"""
    o["m_topk"] = f"""
        SELECT YEAR(l_shipdate) AS d_year, ROUND({_REV}, 2) AS rev
        FROM lineitem GROUP BY 1 ORDER BY rev DESC LIMIT 3"""
    o["m_rollup"] = f"""
        WITH b AS (SELECT YEAR(l_shipdate) AS d_year, l_returnflag,
                   l_extendedprice, l_discount FROM lineitem)
        SELECT d_year, l_returnflag,
               CASE WHEN GROUPING(d_year) + GROUPING(l_returnflag) > 0
                    THEN NULL ELSE ROUND({_REV}, 2) END AS rev
        FROM b GROUP BY ROLLUP(d_year, l_returnflag)"""
    o["m_cube"] = f"""
        WITH b AS (SELECT YEAR(l_shipdate) AS d_year, l_returnflag,
                   l_extendedprice, l_discount FROM lineitem)
        SELECT d_year, l_returnflag,
               CASE WHEN GROUPING(d_year) + GROUPING(l_returnflag) > 0
                    THEN NULL ELSE ROUND({_REV}, 2) END AS rev
        FROM b GROUP BY CUBE(d_year, l_returnflag)"""
    o["ops_pivot"] = """
        SELECT YEAR(l_shipdate) AS d_year,
               CAST(SUM(CASE WHEN l_returnflag = 'A' THEN
                 CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                 AS BIGINT) END) / 100.0 AS DOUBLE) AS rev_a,
               CAST(SUM(CASE WHEN l_returnflag = 'N' THEN
                 CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                 AS BIGINT) END) / 100.0 AS DOUBLE) AS rev_n,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN
                 CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                 AS BIGINT) END) / 100.0 AS DOUBLE) AS rev_r
        FROM lineitem GROUP BY YEAR(l_shipdate)"""
    o["ops_window_funcs"] = """
        SELECT o_custkey AS custkey, o_orderkey AS okey,
               DENSE_RANK() OVER w AS drnk,
               NTILE(4) OVER w AS quartile,
               LAG(o_orderkey, 1, -1) OVER w AS prev_okey,
               LEAD(o_orderkey, 1, -1) OVER w AS next_okey,
               FIRST_VALUE(o_orderkey) OVER w AS first_okey
        FROM orders WHERE o_custkey < 50
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)"""
    o["m_at_set_const"] = f"""
        WITH g AS (SELECT YEAR(l_shipdate) AS d_year, {_REV} AS r
                   FROM lineitem GROUP BY 1)
        SELECT d_year, ROUND(r, 2) AS rev,
               ROUND((SELECT r FROM g WHERE d_year = 1998), 2) AS rev_98
        FROM g"""
    o["m_derived_at_all"] = f"""
        WITH g AS (SELECT l_returnflag, {_REV} AS r,
                   SUM(l_quantity) AS q FROM lineitem GROUP BY 1),
        t AS (SELECT SUM(r) AS tr, SUM(q) AS tq FROM g)
        SELECT l_returnflag, ROUND(r / q, 4) AS rpu,
               ROUND(t.tr / t.tq, 4) AS rpu_all
        FROM g CROSS JOIN t"""
    o["m_star_join"] = """
        WITH j AS (SELECT n.n_name AS nation, o.o_totalprice
                   FROM orders o
                   JOIN customer c ON o.o_custkey = c.c_custkey
                   JOIN nation n ON c.c_nationkey = n.n_nationkey),
        t AS (SELECT SUM(o_totalprice) AS tt FROM j)
        SELECT nation, ROUND(SUM(o_totalprice), 2) AS rev,
               ROUND(t.tt, 2) AS tot
        FROM j CROSS JOIN t GROUP BY nation, t.tt"""
    o["m_grouping_sets"] = f"""
        WITH b AS (SELECT YEAR(l_shipdate) AS d_year, l_returnflag,
                   l_extendedprice, l_discount FROM lineitem)
        SELECT d_year, l_returnflag,
               CASE WHEN GROUPING(d_year) + GROUPING(l_returnflag) > 0
                    THEN NULL ELSE ROUND({_REV}, 2) END AS rev
        FROM b GROUP BY GROUPING SETS ((d_year, l_returnflag),
                                       (d_year), ())"""
    o["m_window_measure"] = """
        WITH f AS (SELECT SUM(o_totalprice) AS t FROM orders
                   WHERE o_orderstatus = 'F')
        SELECT o_orderstatus, ROUND(f.t, 2) AS f_total
        FROM orders CROSS JOIN f GROUP BY o_orderstatus, f.t"""
    o["m_row_level_listing12"] = """
        WITH g AS (SELECT l_returnflag, AVG(l_extendedprice) AS ap
                   FROM lineitem GROUP BY 1)
        SELECT l.l_orderkey AS okey, l.l_linenumber AS lineno
        FROM lineitem l JOIN g ON g.l_returnflag = l.l_returnflag
        WHERE l.l_extendedprice > 1.9 * g.ap"""
    o["events_sessionize"] = """
        WITH g AS (
          SELECT user_id, ts, value,
            CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                 OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, value,
            CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
          FROM g
        )
        SELECT user_id, session_seq, COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS session_value
        FROM s GROUP BY user_id, session_seq"""
    o["events_rollup_daily"] = """
        SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR)
                 AS day, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0
                    AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2"""
    o["ops_range_join"] = """
        WITH w AS (SELECT CAST(i AS INT) AS w_id,
            TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 3 HOUR AS s,
            TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 3 HOUR
              + INTERVAL 45 MINUTE AS e
          FROM range(0, 80) t(i))
        SELECT ev.event_id, w.w_id FROM events ev
        JOIN w ON ev.ts BETWEEN w.s AND w.e"""
    o["ops_asof_join"] = """
        SELECT p.event_id, ROUND(c.value, 2) AS last_click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts"""
    o["ops_asof_forward"] = """
        SELECT p.event_id, ROUND(c.value, 2) AS next_click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts <= c.ts
        ORDER BY p.event_id"""
    o["ops_topk_per_group"] = """
        SELECT event_type, event_id, value FROM (
          SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY value DESC, event_id DESC) AS rnk
          FROM events) WHERE rnk <= 3"""
    o["tpch_q1"] = """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus"""
    o["tpch_q3"] = """
        SELECT l.l_orderkey AS okey,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               CAST(o.o_orderdate AS VARCHAR) AS odate
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, okey LIMIT 10"""
    o["tpch_q5"] = """
        SELECT n.n_name AS nation,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
         AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name"""
    o["tpch_q6"] = """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""
    o["tpch_q4"] = """
        SELECT o_orderpriority, COUNT(*) AS order_count FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority"""
    o["tpch_q7"] = """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               YEAR(l.l_shipdate) AS l_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
        FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        GROUP BY sn.n_name, cn.n_name, YEAR(l.l_shipdate)"""
    o["tpch_q10"] = """
        SELECT c.c_custkey AS custkey, c.c_name AS cname,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) / 100.0 AS DOUBLE) AS revenue,
               ROUND(c.c_acctbal, 2) AS acctbal, n.n_name AS nation
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, ROUND(c.c_acctbal, 2), n.n_name
        ORDER BY revenue DESC, custkey LIMIT 20"""
    o["tpch_q14"] = """
        SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
               THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
               / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'"""
    o["tpch_q18"] = """
        SELECT c.c_name AS cname, c.c_custkey AS custkey,
               o.o_orderkey AS okey, CAST(o.o_orderdate AS VARCHAR) AS odate,
               ROUND(o.o_totalprice, 2) AS total,
               ROUND(SUM(l.l_quantity), 2) AS sum_qty
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                               GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey,
                 CAST(o.o_orderdate AS VARCHAR), ROUND(o.o_totalprice, 2)
        ORDER BY total DESC, okey LIMIT 100"""
    o["tpch_q19"] = """
        SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 30)"""
    o["tpch_q8"] = """
        SELECT o_year, ROUND(SUM(CASE WHEN nation = 'NATION_3'
               THEN cents ELSE 0 END) / SUM(cents), 6) AS mkt_share
        FROM (SELECT YEAR(o.o_orderdate) AS o_year,
              CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
              AS BIGINT) AS cents, sn.n_name AS nation
              FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
              JOIN customer cu ON cu.c_custkey = o.o_custkey
              JOIN nation cn ON cu.c_nationkey = cn.n_nationkey
              JOIN region r ON cn.n_regionkey = r.r_regionkey
              JOIN supplier s ON s.s_suppkey = l.l_suppkey
              JOIN nation sn ON s.s_nationkey = sn.n_nationkey
              WHERE r.r_name = 'ASIA') t
        GROUP BY o_year"""
    o["tpch_q13"] = """
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
              FROM customer c LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
              AND o.o_orderpriority <> '1-URGENT'
              GROUP BY c.c_custkey) t
        GROUP BY c_count"""
    o["tpch_q15"] = """
        WITH rev AS (SELECT l_suppkey AS suppkey,
          SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
              AS BIGINT)) AS total_cents
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey AS suppkey, s.s_name AS sname,
               CAST(r.total_cents / 100.0 AS DOUBLE) AS total_revenue
        FROM supplier s JOIN rev r ON s.s_suppkey = r.suppkey
        WHERE r.total_cents = (SELECT MAX(total_cents) FROM rev)"""
    o["tpch_q17"] = """
        SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0)
               AS BIGINT)) AS DOUBLE) / 700.0 AS avg_yearly
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#5'
        AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = l.l_partkey)"""
    o["ops_window_running"] = """
        SELECT o_custkey AS custkey, o_orderkey AS okey,
               CAST(o_orderdate AS VARCHAR) AS odate,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING) / 100.0 AS DOUBLE) AS running_total
        FROM orders WHERE o_custkey < 100"""
    o["ops_skew_report"] = """
        WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key,
                          COUNT(*) AS n
                   FROM events WHERE user_id IS NOT NULL
                   GROUP BY 1),
        t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
        SELECT key, n, ROUND(n * 1.0 / total, 6) AS share,
               GREATEST(1, CAST(CEIL(n * 32.0 / total) AS INT))
                 AS suggested_salt
        FROM c, t ORDER BY n DESC, key LIMIT 10"""
    o["ops_window_distinct"] = """
        WITH firsts AS (
          SELECT event_type, user_id, MIN(CAST(ts AS DATE)) AS fd
          FROM events GROUP BY event_type, user_id),
        newu AS (SELECT event_type, fd AS day, COUNT(*) AS new_users
                 FROM firsts GROUP BY event_type, fd),
        daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                         COUNT(DISTINCT user_id) AS daily_users
                  FROM events GROUP BY event_type, CAST(ts AS DATE))
        SELECT d.event_type, CAST(d.day AS VARCHAR) AS day,
               d.daily_users,
               CAST(SUM(COALESCE(n.new_users, 0)) OVER (
                 PARTITION BY d.event_type ORDER BY d.day
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        FROM daily d LEFT JOIN newu n
          ON n.event_type = d.event_type AND n.day = d.day
        ORDER BY d.event_type, day"""
    o["ops_percentiles"] = """
        SELECT l_returnflag,
               ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity),
                     4) AS p50_qty,
               ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY l_quantity),
                     4) AS p90_qty,
               ROUND(MIN(l_quantity), 2) AS min_qty,
               ROUND(MAX(l_quantity), 2) AS max_qty
        FROM lineitem GROUP BY l_returnflag"""
    o["tpch_q22"] = """
        SELECT n.n_name AS nation, COUNT(*) AS numcust,
               ROUND(SUM(c.c_acctbal), 2) AS totacctbal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                             WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        GROUP BY n.n_name"""
    # the round-3 TPC-H adaptations are written in the engine-portable
    # ANSI subset (integer-cents sums, YEAR(), INTERVAL n DAY), so the
    # Spark text IS the DuckDB oracle
    for name in _R3_FIRST:
        o.setdefault(name, _MEASURE_QUERIES[name])
    o["text_decontaminate"] = f"""
        WITH d AS (SELECT doc_id, source,
                 list_filter(string_split(regexp_replace(lower(trim(text)),
                     '\\s+', ' ', 'g'), ' '), w -> w <> '') AS words
               FROM documents),
        g AS (SELECT doc_id, source,
                CASE WHEN len(words) >= 4 THEN
                  list_distinct(list_transform(range(1, len(words) - 2),
                      i -> array_to_string(words[i:i+3], ' ')))
                ELSE [] END AS grams
              FROM d),
        bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g
                  WHERE {_BENCH_PRED}),
        corpus AS (SELECT doc_id, grams FROM g
                   WHERE NOT ({_BENCH_PRED})),
        hits AS (SELECT c.doc_id, COUNT(*) AS n_hits
                 FROM (SELECT doc_id, unnest(grams) AS gram FROM corpus) c
                 JOIN bench b ON c.gram = b.gram GROUP BY c.doc_id)
        SELECT c.doc_id, len(c.grams) AS n_grams,
               COALESCE(h.n_hits, 0) AS n_hits,
               ROUND(COALESCE(h.n_hits, 0)
                 / CAST(GREATEST(len(c.grams), 1) AS DOUBLE), 6) AS hit_frac,
               COALESCE(h.n_hits, 0) >= 1 AS contaminated
        FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id"""

    # language-ID: the stopword-vote arithmetic is plain
    # length/replace/CAST SQL — generate the oracle from the same marker
    # tables the Spark operator uses
    from yardstick_spark.llm.text import _LANG_MARKERS, _marker_hits

    langs = list(_LANG_MARKERS)
    hit_exprs = ", ".join(
        f"{_marker_hits('t', ws)} AS hits_{lang}"
        for lang, ws in _LANG_MARKERS.items()
    )
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    pred = f"CASE WHEN {best} <= 0 THEN 'und' " + " ".join(
        f"WHEN hits_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    o["text_langid"] = f"""
        WITH norm AS (SELECT doc_id, {_NORM_DOC} AS t FROM documents),
        h AS (SELECT doc_id, {hit_exprs} FROM norm)
        SELECT doc_id, {pred} AS pred_lang, {best} AS marker_hits FROM h"""
    # confusion matrix: declared metadata lang x the SAME detector
    o["text_lang_confusion"] = f"""
        WITH norm AS (SELECT doc_id, lang, {_NORM_DOC} AS t
                      FROM documents),
        h AS (SELECT doc_id, lang, {hit_exprs} FROM norm),
        p AS (SELECT doc_id, lang AS declared, {pred} AS pred_lang FROM h)
        SELECT declared, pred_lang, COUNT(*) AS n
        FROM p GROUP BY declared, pred_lang"""

    # LSH kNN: the hyperplane weights are deterministic (md5 parity) and
    # embedded as literals on both engines, so the bucketing is identical
    import hashlib

    def _w(p: int, i: int) -> str:
        h = hashlib.md5(f"42:{p}:{i}".encode()).hexdigest()
        return "1" if int(h[:15], 16) & 1 else "-1"

    dim, n_planes = 64, 8
    plane_terms = []
    for p in range(n_planes):
        arr = ", ".join(_w(p, i) for i in range(dim))
        dot = (f"list_sum(list_transform(list_zip(e, CAST([{arr}] AS "
               f"DOUBLE[])), x -> x[1] * x[2]))")
        plane_terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    bucket = " + ".join(plane_terms)
    def _band_bucket(seed: int, n_planes: int) -> str:
        terms = []
        for p in range(n_planes):
            arr = ", ".join(
                "1" if int(hashlib.md5(
                    f"{seed}:{p}:{i}".encode()).hexdigest()[:15], 16) & 1
                else "-1"
                for i in range(dim)
            )
            dot = (f"list_sum(list_transform(list_zip(e, CAST([{arr}] AS "
                   f"DOUBLE[])), x -> x[1] * x[2]))")
            terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    band_unions = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, {_band_bucket(42 + 1000 * b, 6)} "
        f"AS bucket FROM v"
        for b in range(8)
    )
    o["dedup_embedding"] = f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        bb AS ({band_unions}),
        cand AS (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
                 FROM bb a JOIN bb b2
                 ON a.band = b2.band AND a.bucket = b2.bucket
                 AND a.vec_id < b2.vec_id)
        SELECT id_a, id_b,
          ROUND(list_sum(list_transform(list_zip(x.e, y.e),
                  p -> p[1] * p[2]))
            / (sqrt(list_sum(list_transform(x.e, p -> p * p)))
               * sqrt(list_sum(list_transform(y.e, p -> p * p)))), 4)
            AS sim
        FROM cand JOIN v x ON x.vec_id = id_a JOIN v y ON y.vec_id = id_b
        WHERE ROUND(list_sum(list_transform(list_zip(x.e, y.e),
                  p -> p[1] * p[2]))
            / (sqrt(list_sum(list_transform(x.e, p -> p * p)))
               * sqrt(list_sum(list_transform(y.e, p -> p * p)))), 4)
            >= 0.4"""
    o["sim_knn_lsh"] = f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        b AS (SELECT vec_id, e, {bucket} AS bucket FROM v),
        q AS (SELECT * FROM b WHERE vec_id < 5),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            ROUND(list_sum(list_transform(list_zip(q.e, c.e), x -> x[1] * x[2]))
              / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
                 * sqrt(list_sum(list_transform(c.e, x -> x * x)))), 4) AS sim
          FROM b c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.vec_id)
        SELECT query_id, neighbor_id, sim, rank FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id) AS INT) AS rank
          FROM scored) WHERE rank <= 10"""
    o["sim_knn_lsh_persisted"] = o["sim_knn_lsh"]

    dot_list = "[" + ", ".join(
        f"list_sum(list_transform(list_zip(e, CAST([{', '.join(_w(p, i) for i in range(dim))}] AS DOUBLE[])), x -> x[1] * x[2]))"
        for p in range(n_planes)
    ) + "]"
    o["sim_knn_lsh_multiprobe"] = f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        d AS (SELECT vec_id, e, {dot_list} AS ds FROM v),
        b AS (SELECT vec_id, e, ds,
                CAST(list_sum(list_transform(list_zip(ds,
                  range(0, {n_planes})),
                  x -> CASE WHEN x[1] > 0
                       THEN CAST(1 AS BIGINT) << x[2] ELSE 0 END))
                  AS BIGINT) AS bucket
              FROM d),
        qp AS (SELECT vec_id, e,
                 UNNEST(list_prepend(bucket,
                   list_transform(
                     list_slice(
                       list_transform(list_sort(list_zip(
                         list_transform(ds, x -> abs(x)),
                         range(0, {n_planes}))), s -> s[2]),
                       1, 2),
                     i -> xor(bucket, CAST(1 AS BIGINT) << i))))
                 AS bucket
               FROM b WHERE vec_id < 5),
        scored AS (
          SELECT qp.vec_id AS query_id, c.vec_id AS neighbor_id,
            ROUND(list_sum(list_transform(list_zip(qp.e, c.e), x -> x[1] * x[2]))
              / (sqrt(list_sum(list_transform(qp.e, x -> x * x)))
                 * sqrt(list_sum(list_transform(c.e, x -> x * x)))), 4) AS sim
          FROM b c JOIN qp ON c.bucket = qp.bucket AND c.vec_id <> qp.vec_id)
        SELECT query_id, neighbor_id, sim, rank FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id) AS INT) AS rank
          FROM scored) WHERE rank <= 10"""

    # -- LLM-pipeline oracles (portable md5-based hashing) --
    o["dedup_simhash_pairs"] = f"""
        WITH norm AS (SELECT doc_id AS id,
            list_filter(string_split({_NORM_DOC}, ' '), t -> t <> '') AS toks
            FROM documents),
        sh AS (SELECT id,
          CAST(list_aggregate(
            list_transform(range(0, 60), i ->
              CASE WHEN list_sum(list_transform(toks, t ->
                CASE WHEN (CAST(CONCAT('0x', SUBSTRING(md5(t), 1, 15)) AS BIGINT)
                           >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0
              THEN (CAST(1 AS BIGINT) << i) ELSE 0 END), 'sum') AS BIGINT)
            AS simhash
        FROM norm)
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM sh a JOIN sh b ON a.id < b.id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""
    o["dedup_exact"] = f"""
        WITH h AS (SELECT doc_id, md5({_NORM_DOC}) AS content_hash FROM documents)
        SELECT doc_id, content_hash,
               MIN(doc_id) OVER (PARTITION BY content_hash) AS keep_id,
               doc_id <> MIN(doc_id) OVER (PARTITION BY content_hash) AS is_duplicate
        FROM h"""
    o["dedup_ngram_jaccard"] = f"""
        WITH norm AS (SELECT doc_id AS id, {_NORM_DOC} AS t FROM documents),
        sh AS (SELECT id, UNNEST(list_distinct([substring(t, i, 5)
                   for i in range(1, greatest(1, length(t) - 4) + 1)])) AS sh
               FROM norm),
        sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
        pairs AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS common
                  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
                  GROUP BY 1, 2)
        SELECT id_a, id_b,
               ROUND(common / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
        FROM pairs
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE common / (sa.n_sh + sb.n_sh - common) >= 0.8"""
    mh_pairs = f"""
        WITH norm AS (SELECT doc_id AS id, {_NORM_DOC} AS t FROM documents),
        sets AS (SELECT id, list_distinct([substring(t, i, 5)
                 for i in range(1, greatest(1, length(t) - 4) + 1)]) AS shs
                 FROM norm),
        hashed AS (SELECT id, list_transform(shs, s ->
                   CAST(CONCAT('0x', SUBSTRING(md5(s), 1, 15)) AS BIGINT)
                   % 2147483647) AS hs FROM sets),
        sigs AS (SELECT id, [list_min(list_transform(hs, h ->
                 ((2 * i + 1) * h + i * 40503 + 1) % 2147483647))
                 for i in range(0, 32)] AS sig FROM hashed),
        banded AS (SELECT id, sig, t.b AS band,
                   md5(CAST(sig[t.b * 4 + 1 : t.b * 4 + 4] AS VARCHAR)) AS bhash
                   FROM sigs, range(0, 8) t(b)),
        cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                 FROM banded a JOIN banded b
                 ON a.band = b.band AND a.bhash = b.bhash AND a.id < b.id)
        SELECT id_a, id_b,
               ROUND(list_sum(list_transform(list_zip(sa.sig, sb.sig),
                     x -> CASE WHEN x[1] = x[2] THEN 1 ELSE 0 END))
                     / len(sa.sig), 6) AS est_jaccard
        FROM cand
        JOIN sigs sa ON sa.id = id_a
        JOIN sigs sb ON sb.id = id_b
        WHERE list_sum(list_transform(list_zip(sa.sig, sb.sig),
              x -> CASE WHEN x[1] = x[2] THEN 1 ELSE 0 END))
              / len(sa.sig) >= 0.5"""
    o["dedup_minhash_lsh"] = mh_pairs
    # estimator eval: the SAME estimate SQL joined to exact shingle
    # Jaccard per surviving pair, then one aggregate row
    o["dedup_minhash_eval"] = f"""
        WITH p AS ({mh_pairs}),
        sets AS (SELECT doc_id AS id, list_distinct([substring(t, i, 5)
                 for i in range(1, greatest(1, length(t) - 4) + 1)]) AS shs
                 FROM (SELECT doc_id, {_NORM_DOC} AS t FROM documents)),
        j AS (SELECT p.est_jaccard,
              ROUND(len(list_intersect(sa.shs, sb.shs)) * 1.0
                / (len(sa.shs) + len(sb.shs)
                   - len(list_intersect(sa.shs, sb.shs))), 6) AS exact
              FROM p JOIN sets sa ON sa.id = p.id_a
                     JOIN sets sb ON sb.id = p.id_b)
        SELECT COUNT(*) AS n_pairs,
               ROUND(AVG(ABS(est_jaccard - exact)), 6) AS mae,
               ROUND(AVG(est_jaccard - exact), 6) AS bias,
               ROUND(AVG(est_jaccard), 6) AS mean_est,
               ROUND(AVG(exact), 6) AS mean_exact
        FROM j"""
    # transitive closure of the pair graph (small scale: recursive CTE);
    # cluster_id = component-min doc id, keep = canonical copy
    o["dedup_clusters"] = f"""
        WITH RECURSIVE pairs AS ({mh_pairs}),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
        walk(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src
        ),
        lbl AS (SELECT src AS id, LEAST(src, MIN(dst)) AS cluster_id
                FROM walk GROUP BY src)
        SELECT d.doc_id,
               COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
               d.doc_id = COALESCE(l.cluster_id, d.doc_id) AS keep
        FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id"""
    o["dedup_simhash"] = f"""
        WITH norm AS (SELECT doc_id AS id,
            list_filter(string_split({_NORM_DOC}, ' '), t -> t <> '') AS toks
            FROM documents)
        SELECT id,
          CAST(list_aggregate(
            list_transform(range(0, 60), i ->
              CASE WHEN list_sum(list_transform(toks, t ->
                CASE WHEN (CAST(CONCAT('0x', SUBSTRING(md5(t), 1, 15)) AS BIGINT)
                           >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0
              THEN (CAST(1 AS BIGINT) << i) ELSE 0 END), 'sum') AS BIGINT)
            AS simhash
        FROM norm"""
    o["sim_knn_ivf"] = """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        b AS (SELECT vec_id, e,
                CAST(CONCAT('0x', SUBSTRING(md5(CAST(vec_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 8 AS cell
              FROM v),
        s AS (SELECT cell, MIN(vec_id) AS seed_id FROM b GROUP BY cell),
        cents AS (SELECT s.cell, v.e AS c FROM s
                  JOIN v ON v.vec_id = s.seed_id),
        asg AS (SELECT vec_id, e, cell FROM (
            SELECT b.vec_id, b.e, cents.cell,
              row_number() OVER (PARTITION BY b.vec_id ORDER BY
                list_sum(list_transform(list_zip(b.e, cents.c),
                  x -> (x[1] - x[2]) * (x[1] - x[2]))), cents.cell) AS rn
            FROM b CROSS JOIN cents) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
        probes AS (SELECT query_id, qe, cell FROM (
            SELECT q.query_id, q.qe, cents.cell,
              row_number() OVER (PARTITION BY q.query_id ORDER BY
                list_sum(list_transform(list_zip(q.qe, cents.c),
                  x -> (x[1] - x[2]) * (x[1] - x[2]))), cents.cell) AS rn
            FROM q CROSS JOIN cents) WHERE rn <= 3),
        scored AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
            ROUND(list_sum(list_transform(list_zip(p.qe, a.e),
                    x -> x[1] * x[2]))
              / (sqrt(list_sum(list_transform(p.qe, x -> x * x)))
                 * sqrt(list_sum(list_transform(a.e, x -> x * x)))), 4)
              AS sim
          FROM probes p JOIN asg a USING (cell)
          WHERE a.vec_id <> p.query_id)
        SELECT query_id, neighbor_id, sim, rank FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id) AS INT) AS rank
          FROM scored) WHERE rank <= 10"""
    o["dedup_semantic"] = """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        b AS (SELECT vec_id, e,
                CAST(CONCAT('0x', SUBSTRING(md5(CAST(vec_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 8 AS hcell
              FROM v),
        s AS (SELECT hcell, MIN(vec_id) AS seed_id FROM b GROUP BY hcell),
        cents AS (SELECT s.hcell AS cell, v.e AS c FROM s
                  JOIN v ON v.vec_id = s.seed_id),
        asg AS (SELECT vec_id, e, cell FROM (
            SELECT b.vec_id, b.e, cents.cell,
              row_number() OVER (PARTITION BY b.vec_id ORDER BY
                list_sum(list_transform(list_zip(b.e, cents.c),
                  x -> (x[1] - x[2]) * (x[1] - x[2]))), cents.cell) AS rn
            FROM b CROSS JOIN cents) WHERE rn = 1),
        scored AS (
          SELECT CAST(a.cell AS BIGINT) AS cell, a.vec_id AS id_a,
            b2.vec_id AS id_b,
            ROUND(list_sum(list_transform(list_zip(a.e, b2.e),
                    x -> x[1] * x[2]))
              / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
                 * sqrt(list_sum(list_transform(b2.e, x -> x * x)))), 4)
              AS sim
          FROM asg a JOIN asg b2
            ON a.cell = b2.cell AND a.vec_id < b2.vec_id)
        SELECT cell, id_a, id_b, sim FROM scored WHERE sim >= 0.3"""
    o["text_mixture_weights"] = """
        WITH per AS (SELECT source, SUM(n_chars) AS mass
                     FROM documents GROUP BY source),
        sh AS (SELECT source, mass,
                 mass / CAST(SUM(mass) OVER () AS DOUBLE) AS share
               FROM per)
        SELECT source, CAST(mass AS BIGINT) AS mass,
               ROUND(share, 6) AS share,
               ROUND(POWER(share, 0.3)
                 / SUM(POWER(share, 0.3)) OVER (), 6) AS weight,
               ROUND((POWER(share, 0.3) / share)
                 / MAX(POWER(share, 0.3) / share) OVER (), 6) AS rate
        FROM sh"""
    o["text_unigram_logprob"] = f"""
        WITH w AS (SELECT doc_id AS id,
               UNNEST(list_filter(string_split({_NORM_DOC}, ' '),
                      t -> t <> '')) AS term
               FROM documents),
        tf AS (SELECT id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
        cf AS (SELECT term, SUM(tf) AS cf FROM tf GROUP BY 1),
        tot AS (SELECT SUM(cf) AS total FROM cf)
        SELECT tf.id AS doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
               ROUND(SUM(tf * -LN(cf / CAST(total AS DOUBLE)))
                 / SUM(tf), 6) AS nll
        FROM tf JOIN cf USING (term) CROSS JOIN tot
        GROUP BY tf.id"""
    o["text_bigram_logprob"] = f"""
        WITH wl AS (SELECT doc_id AS id,
                list_filter(string_split({_NORM_DOC}, ' '),
                            t -> t <> '') AS words FROM documents),
        b AS (SELECT id, u.v AS v, u.w AS w
              FROM (SELECT id,
                      unnest([{{'v': words[i-1], 'w': words[i]}}
                              for i in range(2, len(words) + 1)]) AS u
                    FROM wl WHERE len(words) >= 2)),
        tf2 AS (SELECT id, v, w, COUNT(*) AS tf FROM b GROUP BY 1,2,3),
        bcf AS (SELECT v, w, SUM(tf) AS bcf FROM tf2 GROUP BY 1, 2),
        uni AS (SELECT unnest(words) AS term FROM wl),
        cf AS (SELECT term, COUNT(*) AS cf FROM uni GROUP BY 1),
        tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS total FROM cf)
        SELECT tf2.id AS doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
               ROUND(SUM(tf * -LN(0.7 * bcf / CAST(cv.cf AS DOUBLE)
                   + 0.3 * cw.cf / CAST(total AS DOUBLE)))
                 / SUM(tf), 6) AS nll2
        FROM tf2 JOIN bcf USING (v, w)
        JOIN cf cv ON cv.term = tf2.v
        JOIN cf cw ON cw.term = tf2.w
        CROSS JOIN tot
        GROUP BY tf2.id ORDER BY doc_id"""
    # margin-based bitext mining: exact kNN lists both directions,
    # quantized-denominator margins, mutual best (intersection)
    _mp_sim = """ROUND(list_sum(list_transform(list_zip(q.e, c.e),
            x -> x[1] * x[2]))
          / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
             * sqrt(list_sum(list_transform(c.e, x -> x * x)))), 4)"""
    o["emb_margin_pairs"] = f"""
        WITH v AS (SELECT vec_id, label,
                          CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        sa AS (SELECT vec_id, e FROM v WHERE label <= 4),
        sb AS (SELECT vec_id, e FROM v WHERE label >= 5),
        sab AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  {_mp_sim} AS sim FROM sa q CROSS JOIN sb c),
        sba AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  {_mp_sim} AS sim FROM sb q CROSS JOIN sa c),
        kab AS (SELECT query_id, neighbor_id, sim FROM (
                  SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) AS rnk FROM sab)
                WHERE rnk <= 4),
        kba AS (SELECT query_id, neighbor_id, sim FROM (
                  SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) AS rnk FROM sba)
                WHERE rnk <= 4),
        dena AS (SELECT query_id AS id,
                   SUM(CAST(round(sim * 10000) AS BIGINT)) AS s,
                   COUNT(*) AS n FROM kab GROUP BY 1),
        denb AS (SELECT query_id AS id,
                   SUM(CAST(round(sim * 10000) AS BIGINT)) AS s,
                   COUNT(*) AS n FROM kba GROUP BY 1),
        ma AS (SELECT * FROM (
                 SELECT k.query_id, k.neighbor_id,
                   ROUND(k.sim / nullif((da.s / CAST(da.n AS DOUBLE)
                     + db.s / CAST(db.n AS DOUBLE)) / 2.0 / 10000.0, 0),
                     6) + 0.0 AS margin
                 FROM kab k JOIN dena da ON k.query_id = da.id
                            JOIN denb db ON k.neighbor_id = db.id)
               WHERE margin IS NOT NULL),
        mb AS (SELECT * FROM (
                 SELECT k.query_id, k.neighbor_id,
                   ROUND(k.sim / nullif((db.s / CAST(db.n AS DOUBLE)
                     + da.s / CAST(da.n AS DOUBLE)) / 2.0 / 10000.0, 0),
                     6) + 0.0 AS margin
                 FROM kba k JOIN denb db ON k.query_id = db.id
                            JOIN dena da ON k.neighbor_id = da.id)
               WHERE margin IS NOT NULL),
        besta AS (SELECT query_id, neighbor_id, margin FROM (
                    SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY margin DESC, neighbor_id) AS rn FROM ma)
                  WHERE rn = 1),
        bestb AS (SELECT query_id, neighbor_id, margin FROM (
                    SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY margin DESC, neighbor_id) AS rn FROM mb)
                  WHERE rn = 1)
        SELECT x.query_id AS id_a, x.neighbor_id AS id_b, x.margin
        FROM besta x JOIN bestb y
          ON x.query_id = y.neighbor_id AND x.neighbor_id = y.query_id"""
    o["sim_knn_bruteforce"] = """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        q AS (SELECT * FROM v WHERE vec_id < 5),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            ROUND(list_sum(list_transform(list_zip(q.e, c.e), x -> x[1] * x[2]))
              / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
                 * sqrt(list_sum(list_transform(c.e, x -> x * x)))), 4) AS sim
          FROM v c CROSS JOIN q WHERE c.vec_id <> q.vec_id)
        SELECT query_id, neighbor_id, sim, rank FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id) AS INT) AS rank
          FROM scored) WHERE rank <= 10"""
    # retrieval-quality eval: LSH results vs brute-force truth — the
    # same per-query recall/MRR math as llm.retrieval.retrieval_eval
    o["ret_eval"] = f"""
        WITH res AS ({o["sim_knn_lsh"]}),
        tru AS ({o["sim_knn_bruteforce"]}),
        tc AS (SELECT query_id AS q, COUNT(*) AS n_truth
               FROM tru GROUP BY 1),
        rc AS (SELECT query_id AS q, COUNT(*) AS n_results
               FROM res GROUP BY 1),
        h AS (SELECT r.query_id AS q, COUNT(*) AS hits,
                     MIN(r.rank) AS first_hit
              FROM res r JOIN tru t
                ON r.query_id = t.query_id
               AND r.neighbor_id = t.neighbor_id
              GROUP BY 1)
        SELECT tc.q AS query_id, n_truth,
               COALESCE(n_results, 0) AS n_results,
               COALESCE(hits, 0) AS hits,
               ROUND(CAST(COALESCE(hits, 0) AS DOUBLE) / n_truth, 6)
                 AS recall,
               ROUND(COALESCE(CAST(1 AS DOUBLE) / first_hit, 0), 6)
                 AS mrr
        FROM tc LEFT JOIN rc ON rc.q = tc.q
        LEFT JOIN h ON h.q = tc.q"""
    o["text_tokens"] = f"""
        WITH norm AS (SELECT doc_id, {_NORM_DOC} AS t FROM documents)
        SELECT doc_id,
               len(list_filter(string_split(t, ' '), x -> x <> '')) AS n_tokens,
               CAST(len(regexp_extract_all(t,
                 ' ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+')) AS INT) AS n_bpe_tokens,
               CAST(ceil(length(t) / 4.0) AS BIGINT) AS n_subwords,
               length(t) AS n_chars_norm
        FROM norm"""
    o["text_quality"] = f"""
        WITH norm AS (SELECT doc_id, {_NORM_DOC} AS t FROM documents),
        f AS (SELECT doc_id, t, greatest(length(t), 1) AS n,
              length(regexp_replace(t, '[^a-z]', '', 'g')) AS alpha,
              length(regexp_replace(t, '[^.,;:!?]', '', 'g')) AS punct,
              list_filter(string_split(t, ' '), x -> x <> '') AS words
              FROM norm)
        SELECT doc_id, length(t) AS len_norm,
               ROUND(alpha / CAST(n AS DOUBLE), 6) AS alpha_ratio,
               ROUND(punct / CAST(n AS DOUBLE), 6) AS punct_ratio,
               ROUND(list_sum(list_transform(words, w -> length(w)))
                     / CAST(greatest(len(words), 1) AS DOUBLE), 6) AS mean_word_len,
               ROUND(least(1.0, 0.4 * least(length(t) / 500.0, 1.0)
                     + 0.4 * (alpha / CAST(n AS DOUBLE))
                     + 0.2 * least(punct / CAST(greatest(len(words), 1) AS DOUBLE),
                                   1.0)), 6) AS quality
        FROM f"""
    o["text_fingerprint"] = f"""
        WITH norm AS (SELECT doc_id, {_NORM_DOC} AS t FROM documents),
        w AS (SELECT doc_id, t,
              list_filter(string_split(t, ' '), x -> x <> '') AS words FROM norm),
        g AS (SELECT doc_id, t, [concat_ws(' ', words[i], words[i+1], words[i+2],
                   words[i+3]) for i in range(1, greatest(1, len(words) - 3) + 1)]
              AS grams FROM w),
        h AS (SELECT doc_id, t, list_transform(grams, g ->
                CAST(CONCAT('0x', SUBSTRING(md5(g), 1, 15)) AS BIGINT)) AS gh
              FROM g),
        m AS (SELECT doc_id, t, list_sort(list_distinct(
                [list_min(gh[i:i+15]) for i in
                 range(1, greatest(1, len(gh) - 15) + 1)])) AS fp
              FROM h)
        SELECT doc_id, md5(t) AS content_hash, len(fp) AS n_prints,
               fp[1] AS min_print
        FROM m"""
    o["text_fp_overlap"] = f"""
        WITH norm AS (SELECT doc_id, {_NORM_DOC} AS t FROM documents),
        w AS (SELECT doc_id,
              list_filter(string_split(t, ' '), x -> x <> '') AS words FROM norm),
        g AS (SELECT doc_id, [concat_ws(' ', words[i], words[i+1], words[i+2],
                   words[i+3]) for i in range(1, greatest(1, len(words) - 3) + 1)]
              AS grams FROM w),
        h AS (SELECT doc_id, list_transform(grams, g ->
                CAST(CONCAT('0x', SUBSTRING(md5(g), 1, 15)) AS BIGINT)) AS gh
              FROM g),
        m AS (SELECT doc_id, list_sort(list_distinct(
                [list_min(gh[i:i+15]) for i in
                 range(1, greatest(1, len(gh) - 15) + 1)])) AS fp
              FROM h),
        e AS (SELECT doc_id AS id, UNNEST(fp) AS fph FROM m)
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM e a JOIN e b ON a.fph = b.fph AND a.id < b.id
        GROUP BY 1, 2 HAVING COUNT(*) >= 2"""
    o["text_gopher"] = f"""
        WITH norm AS (SELECT doc_id, {_NORM_DOC} AS t FROM documents),
        w AS (SELECT doc_id,
                list_filter(string_split(t, ' '), x -> x <> '') AS words
              FROM norm),
        f AS (SELECT doc_id, words, CAST(len(words) AS INT) AS n_words,
                ROUND(list_sum(list_transform(words, x -> length(x)))
                  / CAST(greatest(len(words), 1) AS DOUBLE), 6) AS mean_word_len,
                [words[i] || ' ' || words[least(i + 1, len(words))]
                 for i in range(1, greatest(len(words) - 1, 1) + 1)] AS bigrams,
                CAST(list_contains(words, 'the') AS INT)
                + CAST(list_contains(words, 'and') AS INT)
                + CAST(list_contains(words, 'of') AS INT)
                + CAST(list_contains(words, 'to') AS INT)
                + CAST(list_contains(words, 'is') AS INT)
                + CAST(list_contains(words, 'in') AS INT) AS sh
              FROM w),
        m AS (SELECT doc_id, n_words, mean_word_len, sh,
                ROUND(COALESCE(list_max(list_transform(list_distinct(bigrams),
                    b -> len(list_filter(bigrams, x -> x = b)))), 0)
                  / CAST(greatest(n_words - 1, 1) AS DOUBLE), 6)
                  AS top_bigram_frac
              FROM f)
        SELECT doc_id, n_words, mean_word_len, top_bigram_frac,
               CAST(sh AS BIGINT) AS stop_hits,
               (n_words BETWEEN 15 AND 100000
                AND mean_word_len BETWEEN 2.0 AND 10.0
                AND top_bigram_frac < 0.08 AND sh >= 1) AS keep
        FROM m"""
    o["text_pii"] = """
        WITH aug AS (SELECT doc_id,
            concat(text, ' reach user', doc_id, '@mail.example or call '
                   || '+1 555 867 5309 host 192.168.', doc_id % 256, '.7')
              AS text
          FROM documents),
        r1 AS (SELECT doc_id,
            CAST(len(regexp_extract_all(text,
              '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+')) AS INT) AS n_email,
            regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+',
              '[EMAIL]', 'g') AS text
          FROM aug),
        r2 AS (SELECT doc_id, n_email,
            CAST(len(regexp_extract_all(text,
              '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS INT)
              AS n_ipv4,
            regexp_replace(text,
              '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}',
              '[IPV4]', 'g') AS text
          FROM r1)
        SELECT doc_id, n_email, n_ipv4,
            CAST(len(regexp_extract_all(text,
              '\\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3,4}[ -][0-9]{3,4}'))
              AS INT) AS n_phone,
            regexp_replace(text,
              '\\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3,4}[ -][0-9]{3,4}',
              '[PHONE]', 'g') AS redacted
        FROM r2"""
    o["text_topterms"] = f"""
        WITH norm AS (SELECT doc_id, {_NORM_DOC} AS t FROM documents),
        w AS (SELECT doc_id, list_distinct(
                list_filter(string_split(t, ' '), x -> x <> '')) AS words
              FROM norm)
        SELECT term, COUNT(*) AS df
        FROM (SELECT unnest(words) AS term FROM w)
        GROUP BY term ORDER BY df DESC, term LIMIT 20"""
    curation_ctes = f"""
        WITH norm AS (SELECT doc_id, source, n_chars, {_NORM_DOC} AS t
                      FROM documents),
        w AS (SELECT doc_id, source, n_chars, t,
                list_filter(string_split(t, ' '), x -> x <> '') AS words
              FROM norm),
        f AS (SELECT doc_id, source, n_chars, t, words,
                CAST(len(words) AS INT) AS n_words,
                list_sum(list_transform(words, x -> length(x)))
                  / CAST(greatest(len(words), 1) AS DOUBLE) AS mwl,
                [words[i] || ' ' || words[least(i + 1, len(words))]
                 for i in range(1, greatest(len(words) - 1, 1) + 1)]
                  AS bigrams,
                CAST(list_contains(words, 'the') AS INT)
                + CAST(list_contains(words, 'and') AS INT)
                + CAST(list_contains(words, 'of') AS INT)
                + CAST(list_contains(words, 'to') AS INT)
                + CAST(list_contains(words, 'is') AS INT)
                + CAST(list_contains(words, 'in') AS INT) AS sh
              FROM w),
        q AS (SELECT doc_id, source, n_chars, t, words FROM f
              WHERE n_words BETWEEN 15 AND 100000
                AND ROUND(mwl, 6) BETWEEN 2.0 AND 10.0
                AND ROUND(COALESCE(list_max(list_transform(list_distinct(bigrams),
                      b -> len(list_filter(bigrams, x -> x = b)))), 0)
                    / CAST(greatest(n_words - 1, 1) AS DOUBLE), 6) < 0.08
                AND sh >= 1),
        d AS (SELECT doc_id, source, n_chars, words,
                MIN(doc_id) OVER (PARTITION BY md5(t)) AS keep_id
              FROM q),
        m AS (SELECT doc_id, source, n_chars, words FROM d
              WHERE doc_id = keep_id
                AND CAST(CONCAT('0x', SUBSTRING(
                      md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))
                      AS BIGINT) % 1000000
                    < CAST((CASE WHEN source = 'src0' THEN 1.0
                                 WHEN source = 'src1' THEN 0.5
                                 WHEN source = 'src2' THEN 0.25
                                 ELSE 0.5 END) * 1000000 AS BIGINT))"""
    o["pipeline_curation"] = curation_ctes + """
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM m GROUP BY source ORDER BY source"""
    split_case = _split_oracle().split("doc_id, source, ")[1].rsplit(
        " AS split FROM documents", 1)[0]
    o["pipeline_curation_full"] = curation_ctes + f""",
        r AS (SELECT doc_id, source FROM m
              WHERE ROUND(1.0 - len(list_distinct(words))
                    / CAST(greatest(len(words), 1) AS DOUBLE), 6) <= 0.6),
        qt AS (SELECT doc_id, source FROM (
                 SELECT doc_id, source,
                        ROW_NUMBER() OVER (PARTITION BY source
                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                          AS rk
                 FROM r) WHERE rk <= 15)
        SELECT doc_id, source, {split_case} AS split FROM qt"""
    o["text_chunks"] = f"""
        WITH norm AS (SELECT doc_id, {_NORM_DOC} AS t FROM documents),
        w AS (SELECT doc_id,
                list_filter(string_split(t, ' '), x -> x <> '') AS words
              FROM norm),
        c AS (SELECT doc_id, CAST(len(words) AS INT) AS n_tokens_doc,
                [struct_pack(cid := i - 1,
                    txt := array_to_string(
                      words[(i - 1) * 24 + 1 : (i - 1) * 24 + 32], ' '))
                 for i in range(1, greatest(1, CAST(ceil(
                     (len(words) - 8) / 24.0) AS INT)) + 1)] AS chunks
              FROM w),
        e AS (SELECT doc_id, n_tokens_doc, unnest(chunks) AS s FROM c)
        SELECT doc_id, n_tokens_doc, CAST(s.cid AS INT) AS chunk_id,
               s.txt AS chunk_text,
               CAST(len(list_filter(string_split(s.txt, ' '),
                    x -> x <> '')) AS INT) AS n_tokens
        FROM e"""
    o["text_mixture"] = """
        SELECT doc_id, source, n_chars FROM documents
        WHERE CAST(CONCAT('0x', SUBSTRING(
                md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % 1000000
            < CAST((CASE WHEN source = 'src0' THEN 1.0
                         WHEN source = 'src1' THEN 0.5
                         WHEN source = 'src2' THEN 0.25
                         ELSE 0.1 END) * 1000000 AS BIGINT)"""
    o["mm_decode"] = """
        SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
               WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
               COUNT(*) AS n,
               CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT)
                 AS total_bytes
        FROM documents GROUP BY 1"""
    o["mm_decode_real"] = """
        SELECT doc_id AS media_id,
          CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'wav' END AS kind,
          CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 13 + 3 AS INT) END
            AS width,
          CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 7 + 2 AS INT) END
            AS height,
          CAST(CASE WHEN doc_id % 2 = 0
               THEN (doc_id % 13 + 3) * (doc_id % 7 + 2) * 3
               ELSE doc_id % 50 + 10 END AS BIGINT) AS n_samples,
          ROUND(CASE WHEN doc_id % 2 = 0 THEN (doc_id % 251) / 255.0
                ELSE abs(doc_id % 1000 - 500) / 32768.0 END, 6) AS mean_val
        FROM documents"""
    o["mm_decode_png"] = """
        WITH g AS (SELECT doc_id, doc_id % 13 + 3 AS w,
                          doc_id % 7 + 2 AS h, doc_id % 251 AS s
                   FROM documents),
        c AS (SELECT doc_id, w, h, w * h AS n, s FROM g)
        SELECT doc_id AS media_id, 'png' AS kind,
               CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(w * h * 3 AS BIGINT) AS n_samples,
               -- sum over p in [0,n) of (p+s) % 251, closed form:
               -- f(t) = (t//251)*31375 + r(r-1)/2 with r = t%251,
               -- s < 251 so f(s) = s(s-1)/2; tripled for RGB
               CAST(3 * ( ((s + n) // 251) * 31375
                        + ((s + n) % 251) * ((s + n) % 251 - 1) // 2
                        - s * (s - 1) // 2 ) AS BIGINT) AS sum_px
        FROM c"""
    o["mm_decode_jpeg"] = """
        WITH g AS (SELECT doc_id, (doc_id % 3 + 2) AS tw,
                          (doc_id % 2 + 2) AS th
                   FROM documents),
        tiles AS (SELECT doc_id, tw, th,
                         unnest(range(0, tw * th)) AS t FROM g),
        px AS (SELECT doc_id, tw, th,
                      -- constant 8x8 tile v -> only DC survives:
                      -- decoded = round(8(v-128)/Q00)*Q00/8 + 128,
                      -- Q00 = 16 (flat table), clamped + half-away
                      CAST(FLOOR(LEAST(255.0, GREATEST(0.0, ROUND(
                        ROUND(8.0 * (((t + doc_id) % 251) - 128)
                              / 16.0) * 16.0 / 8.0 + 128.0, 6)))
                        + 0.5) AS BIGINT) AS v
               FROM tiles)
        SELECT doc_id AS media_id, 'jpeg' AS kind,
               CAST(MAX(tw) * 8 AS INT) AS width,
               CAST(MAX(th) * 8 AS INT) AS height,
               CAST(MAX(tw) * MAX(th) * 64 AS BIGINT) AS n_samples,
               CAST(SUM(64 * v) AS BIGINT) AS sum_px
        FROM px GROUP BY doc_id"""
    o["mm_decode_jpeg_color"] = """
        WITH g AS (SELECT doc_id, (doc_id % 3 + 2) AS tw,
                          (doc_id % 2 + 2) AS th
                   FROM documents),
        tiles AS (SELECT doc_id, tw, th,
                         unnest(range(0, tw * th)) AS t FROM g),
        rgb AS (SELECT doc_id, tw, th,
                       (t + doc_id) % 251 AS r,
                       (2 * t + doc_id) % 251 AS gg,
                       (3 * t + doc_id) % 251 AS b
                FROM tiles),
        -- encoder: RGB -> YCbCr on the two-stage grid
        -- (clip(half_away(round6(x))) == LEAST/GREATEST(ROUND(ROUND)))
        ycc AS (SELECT doc_id, tw, th,
          LEAST(255, GREATEST(0, ROUND(ROUND(
            0.299 * r + 0.587 * gg + 0.114 * b, 6)))) AS y,
          LEAST(255, GREATEST(0, ROUND(ROUND(
            -0.168736 * r - 0.331264 * gg + 0.5 * b + 128, 6)))) AS cb,
          LEAST(255, GREATEST(0, ROUND(ROUND(
            0.5 * r - 0.418688 * gg - 0.081312 * b + 128, 6)))) AS cr
          FROM rgb),
        -- per-channel DC closed form (constant block, Q00 = 16)
        dec AS (SELECT doc_id, tw, th,
          LEAST(255, GREATEST(0,
            ROUND(8.0 * (y - 128) / 16.0) * 2 + 128)) AS y2,
          LEAST(255, GREATEST(0,
            ROUND(8.0 * (cb - 128) / 16.0) * 2 + 128)) AS cb2,
          LEAST(255, GREATEST(0,
            ROUND(8.0 * (cr - 128) / 16.0) * 2 + 128)) AS cr2
          FROM ycc),
        -- decoder: YCbCr -> RGB, same grid
        out AS (SELECT doc_id, tw, th,
          LEAST(255, GREATEST(0, ROUND(ROUND(
            y2 + 1.402 * (cr2 - 128), 6)))) AS r2,
          LEAST(255, GREATEST(0, ROUND(ROUND(
            y2 - 0.344136 * (cb2 - 128)
               - 0.714136 * (cr2 - 128), 6)))) AS g2,
          LEAST(255, GREATEST(0, ROUND(ROUND(
            y2 + 1.772 * (cb2 - 128), 6)))) AS b2
          FROM dec)
        SELECT doc_id AS media_id, 'jpeg' AS kind,
               CAST(MAX(tw) * 8 AS INT) AS width,
               CAST(MAX(th) * 8 AS INT) AS height,
               CAST(MAX(tw) * MAX(th) * 64 * 3 AS BIGINT) AS n_samples,
               CAST(SUM(64 * (r2 + g2 + b2)) AS BIGINT) AS sum_px
        FROM out GROUP BY doc_id"""
    o["mm_resize"] = """
        WITH g AS (SELECT doc_id, doc_id % 13 + 3 AS w, doc_id % 7 + 2 AS h
                   FROM documents),
        px AS (
          SELECT doc_id,
                 (((tx.x2 * w) // 16) + ((ty.y2 * h) // 16) * w + doc_id)
                   % 251 AS v
          FROM g, generate_series(0, 15) AS tx(x2),
                  generate_series(0, 15) AS ty(y2)
        )
        SELECT doc_id AS media_id, CAST(16 AS INT) AS width,
               CAST(16 AS INT) AS height,
               CAST(768 AS BIGINT) AS n_samples,
               CAST(SUM(v) * 3 AS BIGINT) AS sum_px
        FROM px GROUP BY doc_id"""
    o["mm_resize_png"] = """
        WITH g AS (SELECT doc_id, doc_id % 13 + 3 AS w, doc_id % 7 + 2 AS h
                   FROM documents),
        px AS (
          SELECT doc_id,
                 (((tx.x2 * w) // 16) + ((ty.y2 * h) // 16) * w + doc_id)
                   % 251 AS v
          FROM g, generate_series(0, 15) AS tx(x2),
                  generate_series(0, 15) AS ty(y2)
        )
        SELECT doc_id AS media_id, 'png' AS kind,
               CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
               CAST(768 AS BIGINT) AS n_samples,
               CAST(SUM(v) * 3 AS BIGINT) AS sum_px
        FROM px GROUP BY doc_id"""
    o["mm_frame_sample"] = """
        SELECT CAST(SUM(CAST(floor(length(text) * 10 / 1000.0) AS BIGINT) + 1)
                 AS BIGINT) AS n_frames,
               COUNT(DISTINCT doc_id) AS n_videos
        FROM documents WHERE doc_id % 3 = 2"""
    o["events_sliding"] = """
        WITH e AS (
          SELECT event_type, value,
                 (CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900 AS smax
          FROM events
        )
        SELECT CAST(to_timestamp(smax - i.g * 900) AS TIMESTAMP)::VARCHAR
                 AS window_start,
               event_type, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total_value
        FROM e, generate_series(0, 3) AS i(g)
        GROUP BY 1, 2"""
    o["events_attribution"] = """
        SELECT p.user_id AS user_id, p.event_id AS purchase_id,
               c.event_id AS click_id,
               ROUND(p.value, 2) AS purchase_value,
               ROUND(c.value, 2) AS click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 60 MINUTE"""
    o["events_tumbling"] = """
        SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS bucket, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY 1, 2"""
    # -- round-4 additions --------------------------------------------------
    o["text_repetition"] = f"""
        WITH norm AS (SELECT doc_id,
               list_filter(string_split({_NORM_DOC}, ' '), t -> t <> '') AS w
               FROM documents),
        cw AS (SELECT doc_id, word, COUNT(*) AS cnt
               FROM (SELECT doc_id, UNNEST(w) AS word FROM norm)
               GROUP BY 1, 2),
        agg AS (SELECT doc_id, SUM(cnt) AS n_words, COUNT(*) AS n_distinct,
                MAX(cnt) AS top_cnt,
                SUM(CASE WHEN cnt > 1 THEN (cnt - 1) * LENGTH(word)
                    ELSE 0 END) AS dup_chars,
                SUM(cnt * LENGTH(word)) AS tot_chars
                FROM cw GROUP BY 1),
        bg AS (SELECT doc_id,
               CASE WHEN len(w) >= 2
                    THEN [w[i] || ' ' || w[i + 1] for i in range(1, len(w))]
                    ELSE [] END AS bgs
               FROM norm)
        SELECT a.doc_id, CAST(a.n_words AS BIGINT) AS n_words,
               ROUND(1.0 - a.n_distinct / CAST(greatest(a.n_words, 1)
                     AS DOUBLE), 6) AS dup_word_frac,
               ROUND(1.0 - len(list_distinct(b.bgs))
                     / CAST(greatest(len(b.bgs), 1) AS DOUBLE), 6)
                 AS dup_bigram_frac,
               ROUND(a.top_cnt / CAST(greatest(a.n_words, 1) AS DOUBLE), 6)
                 AS top_word_frac,
               ROUND(a.dup_chars / CAST(greatest(a.tot_chars, 1)
                     AS DOUBLE), 6) AS dup_char_frac
        FROM agg a JOIN bg b ON a.doc_id = b.doc_id"""
    o["text_source_quota"] = """
        SELECT doc_id, source, quota_rank FROM (
          SELECT doc_id, source,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS quota_rank
          FROM documents)
        WHERE quota_rank <= 10"""
    o["text_tfidf"] = f"""
        WITH w AS (SELECT doc_id AS id,
               UNNEST(list_filter(string_split({_NORM_DOC}, ' '),
                      t -> t <> '')) AS term
               FROM documents),
        tf AS (SELECT id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
        dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (SELECT id, tf.term, tf, df,
               ROUND(tf * LN((n_docs + 1) / CAST(df + 1 AS DOUBLE)), 6)
                 AS tfidf
               FROM tf JOIN dfx USING (term) CROSS JOIN n)
        SELECT id AS doc_id, term, tf, df, tfidf, term_rank FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                 ORDER BY tfidf DESC, term) AS term_rank FROM scored)
        WHERE term_rank <= 3"""
    o["text_split"] = _split_oracle()
    # gradient image pixels are (i + id) % 251 over i in [0, w*h);
    # audio is n copies of the constant sample (id % 1000 - 500)
    o["mm_stats"] = """
        WITH g AS (SELECT doc_id,
                          doc_id % 13 + 3 AS w, doc_id % 7 + 2 AS h,
                          doc_id % 50 + 10 AS n_aud,
                          (doc_id % 1000 - 500) / 32768.0 AS s
                   FROM documents),
        px AS (SELECT doc_id, w, h,
                      ((doc_id + i.r) % 251) / 255.0 AS v
               FROM g, generate_series(0, 119) AS i(r)
               WHERE doc_id % 2 = 0 AND i.r < w * h),
        img AS (SELECT doc_id, 'ppm' AS kind,
                       CAST(w * h * 3 AS BIGINT) AS n_samples,
                       ROUND(AVG(v), 6) AS mean_val,
                       ROUND(MIN(v), 6) AS min_val,
                       ROUND(MAX(v), 6) AS max_val,
                       ROUND(SQRT(AVG(POW(v, 2))), 6) AS rms,
                       CAST(NULL AS DOUBLE) AS zcr
                FROM px GROUP BY doc_id, w, h),
        aud AS (SELECT doc_id, 'wav' AS kind,
                       CAST(n_aud AS BIGINT) AS n_samples,
                       ROUND(s, 6) AS mean_val, ROUND(s, 6) AS min_val,
                       ROUND(s, 6) AS max_val, ROUND(ABS(s), 6) AS rms,
                       0.0 AS zcr
                FROM g WHERE doc_id % 2 = 1)
        SELECT doc_id AS media_id, kind, n_samples, mean_val, min_val,
               max_val, rms, zcr
        FROM (SELECT * FROM img UNION ALL SELECT * FROM aud)"""
    o["text_corpus_report"] = f"""
        WITH b AS (SELECT source, lang,
               len(list_filter(string_split({_NORM_DOC}, ' '),
                   t -> t <> '')) AS nw,
               length({_NORM_DOC}) AS nc,
               ROUND(length(regexp_replace({_NORM_DOC}, '[^a-z]', '', 'g'))
                 / CAST(greatest(length({_NORM_DOC}), 1) AS DOUBLE), 6) AS ar
               FROM documents)
        SELECT source, lang, COUNT(*) AS n_docs,
               CAST(SUM(nw) AS BIGINT) AS total_tokens,
               CAST(SUM(nc) AS BIGINT) AS total_chars,
               ROUND(AVG(nw), 6) AS avg_tokens,
               ROUND(AVG(ar), 6) AS avg_alpha_ratio
        FROM b GROUP BY source, lang ORDER BY source, lang"""
    o["emb_stats"] = """
        WITH b AS (SELECT label, len(embedding) AS dim,
               ROUND(SQRT(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS nrm
               FROM embeddings)
        SELECT label, COUNT(*) AS n, MAX(dim) AS dim,
               ROUND(AVG(nrm), 6) AS avg_norm,
               ROUND(MIN(nrm), 6) AS min_norm,
               ROUND(MAX(nrm), 6) AS max_norm
        FROM b GROUP BY label ORDER BY label"""
    o["events_funnel"] = """
        WITH s0 AS (SELECT user_id AS u, MIN(ts) AS t FROM events
                    WHERE event_type = 'signup' GROUP BY user_id),
        s1 AS (SELECT e.user_id AS u, MIN(e.ts) AS t FROM events e
               JOIN s0 ON s0.u = e.user_id
               WHERE e.event_type = 'view' AND e.ts >= s0.t
               GROUP BY e.user_id),
        s2 AS (SELECT e.user_id AS u, MIN(e.ts) AS t FROM events e
               JOIN s1 ON s1.u = e.user_id
               WHERE e.event_type = 'click' AND e.ts >= s1.t
               GROUP BY e.user_id),
        s3 AS (SELECT e.user_id AS u, MIN(e.ts) AS t FROM events e
               JOIN s2 ON s2.u = e.user_id
               WHERE e.event_type = 'purchase' AND e.ts >= s2.t
               GROUP BY e.user_id)
        SELECT 0 AS stage_idx, 'signup' AS stage, COUNT(*) AS n FROM s0
        UNION ALL SELECT 1, 'view', COUNT(*) FROM s1
        UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
        UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3"""
    o["ops_profile"] = """
        SELECT 'l_orderkey' AS column_name, 'n_rows' AS metric, CAST(COUNT(*) AS VARCHAR) AS value FROM lineitem
        UNION ALL SELECT 'l_orderkey', 'n_null', CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS VARCHAR) FROM lineitem
        UNION ALL SELECT 'l_orderkey', 'n_distinct', CAST(COUNT(DISTINCT l_orderkey) AS VARCHAR) FROM lineitem
        UNION ALL SELECT 'l_orderkey', 'min', COALESCE(CAST(MIN(l_orderkey) AS VARCHAR), 'NULL') FROM lineitem
        UNION ALL SELECT 'l_orderkey', 'max', COALESCE(CAST(MAX(l_orderkey) AS VARCHAR), 'NULL') FROM lineitem
        UNION ALL SELECT 'l_partkey' AS column_name, 'n_rows' AS metric, CAST(COUNT(*) AS VARCHAR) AS value FROM lineitem
        UNION ALL SELECT 'l_partkey', 'n_null', CAST(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS VARCHAR) FROM lineitem
        UNION ALL SELECT 'l_partkey', 'n_distinct', CAST(COUNT(DISTINCT l_partkey) AS VARCHAR) FROM lineitem
        UNION ALL SELECT 'l_partkey', 'min', COALESCE(CAST(MIN(l_partkey) AS VARCHAR), 'NULL') FROM lineitem
        UNION ALL SELECT 'l_partkey', 'max', COALESCE(CAST(MAX(l_partkey) AS VARCHAR), 'NULL') FROM lineitem
        UNION ALL SELECT 'l_suppkey' AS column_name, 'n_rows' AS metric, CAST(COUNT(*) AS VARCHAR) AS value FROM lineitem
        UNION ALL SELECT 'l_suppkey', 'n_null', CAST(SUM(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS VARCHAR) FROM lineitem
        UNION ALL SELECT 'l_suppkey', 'n_distinct', CAST(COUNT(DISTINCT l_suppkey) AS VARCHAR) FROM lineitem
        UNION ALL SELECT 'l_suppkey', 'min', COALESCE(CAST(MIN(l_suppkey) AS VARCHAR), 'NULL') FROM lineitem
        UNION ALL SELECT 'l_suppkey', 'max', COALESCE(CAST(MAX(l_suppkey) AS VARCHAR), 'NULL') FROM lineitem
        UNION ALL SELECT 'l_quantity' AS column_name, 'n_rows' AS metric, CAST(COUNT(*) AS VARCHAR) AS value FROM lineitem
        UNION ALL SELECT 'l_quantity', 'n_null', CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS VARCHAR) FROM lineitem
        UNION ALL SELECT 'l_quantity', 'n_distinct', CAST(COUNT(DISTINCT l_quantity) AS VARCHAR) FROM lineitem
        UNION ALL SELECT 'l_quantity', 'min', COALESCE(CAST(MIN(l_quantity) AS VARCHAR), 'NULL') FROM lineitem
        UNION ALL SELECT 'l_quantity', 'max', COALESCE(CAST(MAX(l_quantity) AS VARCHAR), 'NULL') FROM lineitem
        UNION ALL SELECT 'l_returnflag' AS column_name, 'n_rows' AS metric, CAST(COUNT(*) AS VARCHAR) AS value FROM lineitem
        UNION ALL SELECT 'l_returnflag', 'n_null', CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS VARCHAR) FROM lineitem
        UNION ALL SELECT 'l_returnflag', 'n_distinct', CAST(COUNT(DISTINCT l_returnflag) AS VARCHAR) FROM lineitem
        UNION ALL SELECT 'l_returnflag', 'min', COALESCE(CAST(MIN(l_returnflag) AS VARCHAR), 'NULL') FROM lineitem
        UNION ALL SELECT 'l_returnflag', 'max', COALESCE(CAST(MAX(l_returnflag) AS VARCHAR), 'NULL') FROM lineitem
        UNION ALL SELECT 'l_linestatus' AS column_name, 'n_rows' AS metric, CAST(COUNT(*) AS VARCHAR) AS value FROM lineitem
        UNION ALL SELECT 'l_linestatus', 'n_null', CAST(SUM(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS VARCHAR) FROM lineitem
        UNION ALL SELECT 'l_linestatus', 'n_distinct', CAST(COUNT(DISTINCT l_linestatus) AS VARCHAR) FROM lineitem
        UNION ALL SELECT 'l_linestatus', 'min', COALESCE(CAST(MIN(l_linestatus) AS VARCHAR), 'NULL') FROM lineitem
        UNION ALL SELECT 'l_linestatus', 'max', COALESCE(CAST(MAX(l_linestatus) AS VARCHAR), 'NULL') FROM lineitem"""
    o["ops_histogram"] = """
        WITH b AS (SELECT CAST(LEAST(19, GREATEST(0,
               FLOOR((l_extendedprice - 0.0) / 3000.0))) AS INT) AS bucket
               FROM lineitem WHERE l_extendedprice IS NOT NULL)
        SELECT bucket, ROUND(0.0 + bucket * 3000.0, 6) AS lo,
               ROUND(0.0 + (bucket + 1) * 3000.0, 6) AS hi,
               COUNT(*) AS n
        FROM b GROUP BY bucket"""
    o["text_sample_weighted"] = """
        SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
               ROUND(-LN(((CAST(CONCAT('0x',
                   SUBSTRING(md5(CONCAT('42:', CAST(doc_id AS VARCHAR))),
                   1, 15)) AS BIGINT) % 1000000) + 1) / 1000000.0)
                 / n_chars, 9) AS samp_key
        FROM documents
        WHERE n_chars IS NOT NULL AND n_chars > 0
        ORDER BY samp_key, doc_id LIMIT 100"""
    # DSIR: shared gram-bucket CTE prefix (unigram+bigram occurrences
    # hashed into 1024 buckets; the 1e-6-quantized bucket log-ratios
    # sum as exact BIGINTs on both engines, so the per-doc weight is
    # partitioning- and engine-independent)
    _dsir_prefix = f"""
        WITH norm AS (SELECT doc_id, lang, {_NORM_DOC} AS t
                      FROM documents),
        w AS (SELECT doc_id, lang,
              list_filter(string_split(t, ' '), x -> x <> '') AS words
              FROM norm),
        g AS (SELECT doc_id, lang, list_concat(words,
                CASE WHEN len(words) >= 2 THEN
                  [concat_ws(' ', words[i], words[i+1])
                   for i in range(1, len(words))]
                ELSE [] END) AS grams FROM w),
        eg AS (SELECT doc_id,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tflag,
                 unnest(grams) AS gram FROM g),
        e AS (SELECT doc_id, tflag,
                 CAST(CONCAT('0x', SUBSTRING(md5(gram), 1, 15))
                   AS BIGINT) % 1024 AS bucket FROM eg),
        c AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c_raw,
                     CAST(SUM(tflag) AS BIGINT) AS c_target
              FROM e GROUP BY bucket),
        cf AS (SELECT r.bucket, COALESCE(c.c_raw, 0) AS c_raw,
                      COALESCE(c.c_target, 0) AS c_target
               FROM range(0, 1024) r(bucket) LEFT JOIN c USING (bucket)),
        tot AS (SELECT SUM(c_raw) AS tr, SUM(c_target) AS tt FROM cf),
        lr AS (SELECT bucket,
                 CAST(round((ln((c_target + 1.0) / (tt + 1024.0))
                   - ln((c_raw + 1.0) / (tr + 1024.0))) * 1000000)
                   AS BIGINT) AS lr_q
               FROM cf, tot),
        s AS (SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                     CAST(SUM(lr_q) AS BIGINT) AS wq
              FROM e JOIN lr USING (bucket) GROUP BY e.doc_id),
        wt AS (SELECT d.doc_id,
                 COALESCE(s.n_grams, 0) AS n_grams,
                 ROUND(COALESCE(s.wq, 0) / 1000000.0, 6) + 0.0 AS logw
               FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id)"""
    o["text_dsir_weights"] = f"""{_dsir_prefix}
        SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, logw
        FROM wt"""
    # incremental store == full refit (integer counts merge exactly),
    # so the persisted-store entry shares the weights oracle
    o["text_dsir_incremental"] = o["text_dsir_weights"]
    o["text_dsir_sample"] = f"""{_dsir_prefix}
        SELECT doc_id, logw,
               ROUND(logw / 1.0 - LN(-LN(((CAST(CONCAT('0x',
                   SUBSTRING(md5(CONCAT('42:', CAST(doc_id AS VARCHAR))),
                   1, 15)) AS BIGINT) % 999999) + 1) / 1000000.0)), 6)
                 + 0.0 AS samp_key
        FROM wt
        ORDER BY samp_key DESC, doc_id LIMIT 100"""
    # training-shard manifest: md5-shuffle global cumsum, floor cut
    o["text_shard_manifest"] = f"""
        WITH t AS (SELECT doc_id,
                 md5(CONCAT('42:', CAST(doc_id AS VARCHAR))) AS skey,
                 CAST(COALESCE(len(list_filter(string_split(
                   {_NORM_DOC}, ' '), x -> x <> '')), 0) AS BIGINT) AS n
               FROM documents),
        c AS (SELECT *, SUM(n) OVER (ORDER BY skey, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM t),
        s AS (SELECT doc_id, skey, n,
                CAST((cum - n) // 5000 AS BIGINT) AS shard
              FROM c)
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS n_tokens,
               arg_min(doc_id, skey) AS first_id,
               arg_max(doc_id, skey) AS last_id
        FROM s GROUP BY shard"""
    o["events_transitions"] = """
        WITH seq AS (SELECT event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS next_type
               FROM events),
        pairs AS (SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS n FROM seq WHERE next_type IS NOT NULL
               GROUP BY 1, 2)
        SELECT from_type, to_type, n,
               ROUND(n / CAST(SUM(n) OVER (PARTITION BY from_type)
                 AS DOUBLE), 6) AS p
        FROM pairs"""
    # k-means: the fixed-iteration quantized Lloyd loop unrolls into a
    # CTE chain (seed -> [assign -> update] x iters -> final assign);
    # every arithmetic step is exact-integer or a shared
    # round-half-away, so the chain reproduces Spark bit-for-bit
    _KM_K, _KM_ITERS, _KM_DIM = 8, 3, 64

    def _km_d(a: str, b: str) -> str:
        return (f"list_sum([({a}[j] - {b}[j]) * ({a}[j] - {b}[j]) "
                f"for j in range(1, {_KM_DIM + 1})])")

    _km_dist = _km_d("v.xq", "cent.c")
    _km_ctes = [f"""
        v AS (SELECT vec_id AS id,
                list_transform(CAST(embedding AS DOUBLE[]),
                  x -> CAST(round(x * 1000000.0) AS BIGINT)) AS xq
              FROM embeddings
              WHERE embedding IS NOT NULL AND len(embedding) > 0),
        ch0 AS (SELECT 0 AS cell, xq AS c FROM v ORDER BY id LIMIT 1)"""]
    # farthest-first seeding unroll (Gonzalez 1985), mirrors
    # kmeans_assign: next seed = argmax over v of min distance to the
    # chosen set, ties to the smaller id
    for _s in range(1, _KM_K):
        _km_ctes.append(f"""
        fd{_s} AS (SELECT v.id, v.xq,
                 MIN({_km_d("v.xq", "c.c")}) AS dmin
               FROM v, ch{_s - 1} AS c GROUP BY v.id, v.xq),
        fp{_s} AS (SELECT xq FROM fd{_s} ORDER BY dmin DESC, id LIMIT 1),
        ch{_s} AS (SELECT cell, c FROM ch{_s - 1}
               UNION ALL SELECT {_s} AS cell, xq AS c FROM fp{_s})""")
    _km_ctes.append(f"""
        cent0 AS (SELECT cell, c FROM ch{_KM_K - 1})""")
    for _i in range(1, _KM_ITERS + 1):
        _km_ctes.append(f"""
        a{_i} AS (SELECT id, xq, cell, dist FROM (
                SELECT v.id, v.xq, cent.cell, {_km_dist} AS dist
                FROM v, cent{_i - 1} AS cent)
              QUALIFY row_number() OVER (PARTITION BY id
                ORDER BY dist, cell) = 1),
        u{_i} AS (SELECT cell, t.j AS d, SUM(xq[t.j]) AS s,
                 COUNT(*) AS n
               FROM a{_i}, generate_series(1, {_KM_DIM}) AS t(j)
               GROUP BY cell, t.j),
        cent{_i} AS (SELECT cell, list(CAST(round(s / CAST(n AS DOUBLE))
                   AS BIGINT) ORDER BY d) AS c
                 FROM u{_i} GROUP BY cell)""")
    _km_prefix = "WITH" + ",".join(_km_ctes) + f""",
        af AS (SELECT id, cell, dist FROM (
                SELECT v.id, cent.cell, {_km_dist} AS dist
                FROM v, cent{_KM_ITERS} AS cent)
              QUALIFY row_number() OVER (PARTITION BY id
                ORDER BY dist, cell) = 1)"""
    o["emb_kmeans"] = f"""{_km_prefix}
        SELECT id AS vec_id, CAST(cell AS INT) AS cell,
               CAST(dist AS BIGINT) AS dist_q
        FROM af"""
    o["emb_cluster_sample"] = f"""{_km_prefix}
        SELECT id AS vec_id, CAST(cell AS INT) AS cell,
               CAST(rn AS INT) AS rn
        FROM (SELECT id, cell, row_number() OVER (PARTITION BY cell
                ORDER BY CAST(CONCAT('0x', SUBSTRING(md5(CONCAT('42:',
                  CAST(id AS VARCHAR))), 1, 15)) AS BIGINT), id) AS rn
              FROM af)
        WHERE rn <= 10"""
    o["emb_hard_negatives"] = """
        WITH v AS (SELECT vec_id, label,
                          CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        a AS (SELECT * FROM v WHERE vec_id < 5),
        scored AS (
          SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
            c.vec_id AS negative_id, c.label AS negative_label,
            ROUND(list_sum(list_transform(list_zip(a.e, c.e), x -> x[1] * x[2]))
              / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
                 * sqrt(list_sum(list_transform(c.e, x -> x * x)))), 4) AS sim
          FROM v c CROSS JOIN a WHERE c.label <> a.label)
        SELECT anchor_id, anchor_label, negative_id, negative_label, sim,
               rank FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY anchor_id
                     ORDER BY sim DESC, negative_id) AS INT) AS rank
          FROM scored) WHERE rank <= 5"""
    o["emb_prototypes"] = """
        WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        p AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS pos)
        SELECT label, COUNT(*) AS n_vecs, pos,
               ROUND(AVG(e[pos + 1]), 6) AS c
        FROM v CROSS JOIN p GROUP BY label, pos"""
    o["emb_medoids"] = """
        WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        p AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS pos),
        cent AS (SELECT label, pos, AVG(e[pos + 1]) AS c
                 FROM v CROSS JOIN p GROUP BY label, pos),
        cl AS (SELECT label, list(c ORDER BY pos) AS ce
               FROM cent GROUP BY label),
        scored AS (
          SELECT v.label, v.vec_id AS medoid_id,
            ROUND(list_sum(list_transform(list_zip(v.e, cl.ce),
                x -> x[1] * x[2]))
              / (sqrt(list_sum(list_transform(v.e, x -> x * x)))
                 * sqrt(list_sum(list_transform(cl.ce, x -> x * x)))), 4)
              AS sim
          FROM v JOIN cl USING (label))
        SELECT label, medoid_id, sim FROM (
          SELECT *, row_number() OVER (PARTITION BY label
                     ORDER BY sim DESC, medoid_id) AS rn
          FROM scored) WHERE rn = 1"""
    o["emb_quantize"] = """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        p AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS pos),
        params AS (SELECT pos, MIN(e[pos + 1]) AS mn, MAX(e[pos + 1]) AS mx
                   FROM v CROSS JOIN p GROUP BY pos),
        codes AS (SELECT vec_id,
            CASE WHEN mx = mn THEN 0 ELSE
              CAST(GREATEST(-128, LEAST(127,
                FLOOR((e[pos + 1] - mn) / (mx - mn) * 255 + 0.5) - 128))
                AS INT) END AS q
          FROM v CROSS JOIN params)
        SELECT vec_id, CAST(SUM(q) AS INT) AS q_sum,
               MIN(q) AS q_min, MAX(q) AS q_max
        FROM codes GROUP BY vec_id"""
    o["sim_knn_quantized"] = """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        p AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS pos),
        params AS (SELECT pos, MIN(e[pos + 1]) AS mn, MAX(e[pos + 1]) AS mx
                   FROM v CROSS JOIN p GROUP BY pos),
        codes AS (SELECT vec_id, pos, mn, mx,
            CASE WHEN mx = mn THEN 0 ELSE
              CAST(GREATEST(-128, LEAST(127,
                FLOOR((e[pos + 1] - mn) / (mx - mn) * 255 + 0.5) - 128))
                AS INT) END AS q
          FROM v CROSS JOIN params),
        deq AS (SELECT vec_id, list((q + 128) / 255.0 * (mx - mn) + mn
                                    ORDER BY pos) AS e
                FROM codes GROUP BY vec_id),
        q AS (SELECT * FROM deq WHERE vec_id < 5),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            ROUND(list_sum(list_transform(list_zip(q.e, c.e), x -> x[1] * x[2]))
              / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
                 * sqrt(list_sum(list_transform(c.e, x -> x * x)))), 4) AS sim
          FROM deq c CROSS JOIN q WHERE c.vec_id <> q.vec_id)
        SELECT query_id, neighbor_id, sim, rank FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id) AS INT) AS rank
          FROM scored) WHERE rank <= 10"""
    o["events_paths"] = """
        WITH s AS (SELECT event_type,
               LEAD(event_type, 1) OVER w AS t1,
               LEAD(event_type, 2) OVER w AS t2
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        c AS (SELECT event_type || ' > ' || t1 || ' > ' || t2 AS path,
               COUNT(*) AS n FROM s WHERE t2 IS NOT NULL GROUP BY 1)
        SELECT path, n, rank FROM (
          SELECT *, CAST(row_number() OVER (ORDER BY n DESC, path)
                    AS INT) AS rank FROM c) WHERE rank <= 20"""
    o["ops_cdc_compact"] = """
        WITH ch AS (SELECT user_id, event_id, value, ts,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
               FROM events),
        r AS (SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn FROM ch)
        SELECT user_id, event_id, value FROM r
        WHERE rn = 1 AND op <> 'D'"""
    o["ops_scd2"] = """
        WITH dim AS (SELECT c_custkey AS k, c_nationkey AS nat,
               c_mktsegment AS seg, '2020-01-01' AS valid_from,
               CAST(NULL AS VARCHAR) AS valid_to, TRUE AS is_current
               FROM customer),
        upd AS (
          SELECT c_custkey AS k, c_nationkey AS nat,
                 CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
                      ELSE c_mktsegment END AS seg,
                 '2021-06-01' AS ts
          FROM customer
          UNION ALL
          SELECT c_custkey + 1000000, c_nationkey, 'NEWSEG', '2021-06-01'
          FROM customer WHERE c_custkey % 13 = 0),
        j AS (SELECT d.k AS dk, d.nat, d.seg, d.valid_from, d.valid_to,
                     d.is_current, u.k AS uk, u.nat AS unat,
                     u.seg AS useg, u.ts,
                     NOT (d.nat IS NOT DISTINCT FROM u.nat
                          AND d.seg IS NOT DISTINCT FROM u.seg) AS chg
              FROM dim d FULL OUTER JOIN upd u ON d.k = u.k)
        SELECT dk AS k, nat, seg, valid_from, valid_to, is_current
          FROM j WHERE dk IS NOT NULL AND (uk IS NULL OR NOT chg)
        UNION ALL
        SELECT dk, nat, seg, valid_from, ts, FALSE
          FROM j WHERE dk IS NOT NULL AND uk IS NOT NULL AND chg
        UNION ALL
        SELECT uk, unat, useg, ts, CAST(NULL AS VARCHAR), TRUE
          FROM j WHERE uk IS NOT NULL AND (dk IS NULL OR chg)"""
    o["pipeline_embeddings"] = """
        WITH v0 AS (SELECT vec_id, label,
                           CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings),
        v AS (SELECT vec_id, label, e,
                sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
              FROM v0),
        ok AS (SELECT * FROM v WHERE nrm >= 0.9 AND nrm <= 1.1),
        b AS (SELECT vec_id, e,
                CAST(CONCAT('0x', SUBSTRING(md5(CAST(vec_id AS VARCHAR)),
                     1, 15)) AS BIGINT) % 8 AS hcell
              FROM ok),
        s AS (SELECT hcell, MIN(vec_id) AS seed_id FROM b GROUP BY hcell),
        cents AS (SELECT s.hcell AS cell, b2.e AS c FROM s
                  JOIN b b2 ON b2.vec_id = s.seed_id),
        asg AS (SELECT vec_id, e, cell FROM (
            SELECT b.vec_id, b.e, cents.cell,
              row_number() OVER (PARTITION BY b.vec_id ORDER BY
                list_sum(list_transform(list_zip(b.e, cents.c),
                  x -> (x[1] - x[2]) * (x[1] - x[2]))), cents.cell) AS rn
            FROM b CROSS JOIN cents) WHERE rn = 1),
        drops AS (SELECT DISTINCT b2.vec_id AS id_b
          FROM asg a JOIN asg b2
            ON a.cell = b2.cell AND a.vec_id < b2.vec_id
          WHERE ROUND(list_sum(list_transform(list_zip(a.e, b2.e),
                    x -> x[1] * x[2]))
              / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
                 * sqrt(list_sum(list_transform(b2.e, x -> x * x)))), 4)
                >= 0.3),
        kept AS (SELECT * FROM ok
                 WHERE vec_id NOT IN (SELECT id_b FROM drops)),
        p AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS pos),
        params AS (SELECT pos, MIN(e[pos + 1]) AS mn, MAX(e[pos + 1]) AS mx
                   FROM kept CROSS JOIN p GROUP BY pos),
        codes AS (SELECT vec_id,
            CASE WHEN mx = mn THEN 0 ELSE
              CAST(GREATEST(-128, LEAST(127,
                FLOOR((e[pos + 1] - mn) / (mx - mn) * 255 + 0.5) - 128))
                AS INT) END AS q
          FROM kept CROSS JOIN params)
        SELECT k.vec_id, k.label, ROUND(k.nrm, 6) AS norm,
               CAST(SUM(c.q) AS INT) AS q_sum,
               MIN(c.q) AS q_min, MAX(c.q) AS q_max
        FROM kept k JOIN codes c ON c.vec_id = k.vec_id
        GROUP BY k.vec_id, k.label, k.nrm"""
    o["ops_scd2_lookup"] = """
        WITH dim AS (
          SELECT c_custkey AS k, c_mktsegment AS seg,
                 '1990-01-01' AS vf, '1997-01-01' AS vt
          FROM customer WHERE c_custkey % 3 = 0
          UNION ALL
          SELECT c_custkey, 'MOVED', '1997-01-01', NULL
          FROM customer WHERE c_custkey % 3 = 0
          UNION ALL
          SELECT c_custkey, c_mktsegment, '1990-01-01', NULL
          FROM customer WHERE c_custkey % 3 <> 0),
        f AS (SELECT o_orderkey, o_custkey AS k,
                     CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od
              FROM orders)
        SELECT f.o_orderkey, f.k, f.od, d.seg
        FROM f LEFT JOIN dim d
          ON d.k = f.k AND f.od >= d.vf
             AND (d.vt IS NULL OR f.od < d.vt)"""
    o["ops_expectations"] = """
        WITH li AS (
          SELECT COUNT(*) AS total,
            CAST(SUM(CASE WHEN l_orderkey IS NOT NULL THEN 0 ELSE 1 END)
                 AS BIGINT) AS f_notnull,
            CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1
                 END) AS BIGINT) AS f_range,
            CAST(SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 0
                 ELSE 1 END) AS BIGINT) AS f_set,
            CAST(SUM(CASE WHEN l_discount >= 0 AND l_discount < 1
                 THEN 0 ELSE 1 END) AS BIGINT) AS f_disc,
            CAST(SUM(CASE WHEN regexp_matches(CAST(l_linestatus AS
                 VARCHAR), '^[FO]$') THEN 0 ELSE 1 END) AS BIGINT)
                 AS f_status
          FROM lineitem),
        od AS (
          SELECT COUNT(*) AS total,
            CAST(SUM(CASE WHEN o_totalprice BETWEEN 0 AND 1000000 THEN 0
                 ELSE 1 END) AS BIGINT) AS f_price,
            CAST(SUM(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0
                 ELSE 1 END) AS BIGINT) AS f_ostatus,
            CAST(SUM(CASE WHEN regexp_matches(CAST(o_orderpriority AS
                 VARCHAR), '^[1-5]-') THEN 0 ELSE 1 END) AS BIGINT)
                 AS f_prio
          FROM orders),
        uniq AS (
          SELECT CAST(SUM(n) AS BIGINT) AS total,
                 CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n END), 0)
                      AS BIGINT) AS failed
          FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey)),
        refi AS (
          SELECT COUNT(*) AS total,
                 CAST(COALESCE(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1
                      END), 0) AS BIGINT) AS failed
          FROM (SELECT l_orderkey FROM lineitem
                WHERE l_orderkey IS NOT NULL) l
          LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
            ON l.l_orderkey = o.o_orderkey),
        rows_out AS (
          SELECT 'lineitem.not_null(l_orderkey)' AS rule, total,
                 f_notnull AS failed FROM li
          UNION ALL SELECT 'lineitem.in_range(l_quantity,1,50)', total,
                 f_range FROM li
          UNION ALL SELECT 'lineitem.in_set(l_returnflag)', total,
                 f_set FROM li
          UNION ALL SELECT
                 'lineitem.satisfies(discount_is_fractional)',
                 total, f_disc FROM li
          UNION ALL SELECT 'lineitem.matches(l_linestatus)', total,
                 f_status FROM li
          UNION ALL SELECT
                 'lineitem.ref_integrity(l_orderkey->orders.o_orderkey)',
                 total, failed FROM refi
          UNION ALL SELECT 'orders.unique(o_orderkey)', total, failed
                 FROM uniq
          UNION ALL SELECT 'orders.in_range(o_totalprice,0,1000000)',
                 total, f_price FROM od
          UNION ALL SELECT 'orders.in_set(o_orderstatus)', total,
                 f_ostatus FROM od
          UNION ALL SELECT 'orders.matches(o_orderpriority)', total,
                 f_prio FROM od)
        SELECT rule, total, failed,
               ROUND(1.0 - failed * 1.0 / total, 6) AS pass_fraction,
               failed = 0 AS ok
        FROM rows_out ORDER BY rule"""
    o["ops_incremental_agg"] = """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               COUNT(*) AS cnt
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""
    o["ops_table_diff"] = """
        WITH old_s AS (SELECT c_custkey, c_nationkey, c_mktsegment
                       FROM customer),
        new_s AS (
          SELECT c_custkey, c_nationkey,
                 CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
                      ELSE c_mktsegment END AS c_mktsegment
          FROM customer WHERE c_custkey % 13 <> 0
          UNION ALL
          SELECT c_custkey + 1000000, c_nationkey, 'NEWSEG'
          FROM customer WHERE c_custkey % 11 = 0)
        SELECT * FROM (
          SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
                 CASE WHEN o.c_custkey IS NULL THEN 'I'
                      WHEN n.c_custkey IS NULL THEN 'D'
                      WHEN (o.c_nationkey IS DISTINCT FROM n.c_nationkey)
                        OR (o.c_mktsegment IS DISTINCT FROM
                            n.c_mktsegment) THEN 'U'
                 END AS change
          FROM old_s o FULL OUTER JOIN new_s n
            ON o.c_custkey = n.c_custkey)
        WHERE change IS NOT NULL
        ORDER BY c_custkey, change"""
    o["text_stratified"] = """
        SELECT doc_id, source, lang FROM (
          SELECT doc_id, source, lang,
                 ROW_NUMBER() OVER (PARTITION BY source, lang
                   ORDER BY CAST(CONCAT('0x', SUBSTRING(md5(
                     CONCAT('42:', CAST(doc_id AS VARCHAR))), 1, 15))
                     AS BIGINT), doc_id) AS rk
          FROM documents)
        WHERE rk <= 5 ORDER BY source, lang, doc_id"""
    o["ops_gap_fill"] = """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 COUNT(*) AS n, ROUND(SUM(value), 2) AS day_value
          FROM events GROUP BY 1, 2),
        span AS (SELECT event_type, MIN(d) AS d0, MAX(d) AS d1
                 FROM daily GROUP BY 1),
        spine AS (SELECT event_type,
                    CAST(unnest(generate_series(d0, d1,
                                INTERVAL 1 DAY)) AS DATE) AS d
                  FROM span),
        j AS (SELECT s.event_type, s.d, daily.n, daily.day_value,
                     daily.n IS NULL AS is_filled
              FROM spine s LEFT JOIN daily
                ON daily.event_type = s.event_type AND daily.d = s.d)
        SELECT event_type, CAST(d AS VARCHAR) AS day,
               COALESCE(n, 0) AS n,
               LAST_VALUE(day_value IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY d
                 ROWS UNBOUNDED PRECEDING) AS day_value,
               is_filled
        FROM j ORDER BY event_type, day"""
    o["text_char_entropy"] = f"""
        WITH norm AS (SELECT doc_id, {_NORM_DOC} AS t FROM documents),
        nz AS (SELECT doc_id, t FROM norm WHERE t <> ''),
        ch AS (SELECT doc_id, unnest(string_split(t, '')) AS c FROM nz),
        cnt AS (SELECT doc_id, c, COUNT(*) AS n FROM ch GROUP BY 1, 2),
        tot AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS nn,
                       COUNT(*) AS k FROM cnt GROUP BY 1)
        SELECT cnt.doc_id,
               CAST(MAX(tot.nn) AS INT) AS n_chars_norm,
               CAST(MAX(tot.k) AS INT) AS n_distinct,
               ROUND(-SUM((n * 1.0 / nn) * log2(n * 1.0 / nn)), 6)
                 AS char_entropy
        FROM cnt JOIN tot USING (doc_id)
        GROUP BY cnt.doc_id ORDER BY cnt.doc_id"""
    o["text_dup_spans"] = f"""
        WITH norm AS (SELECT doc_id, {_NORM_DOC} AS t FROM documents),
        w AS (SELECT doc_id,
                     list_filter(string_split(t, ' '), x -> x <> '')
                     AS words FROM norm),
        g AS (SELECT doc_id, len(words) AS nw,
                [CAST(CONCAT('0x', SUBSTRING(md5(
                     array_to_string(words[i:i+7], ' ')), 1, 15))
                 AS BIGINT)
                 for i in range(1, greatest(1, len(words) - 7) + 1)]
                AS gh FROM w),
        p AS (SELECT doc_id, nw, u.pos AS pos, u.gh AS gh
              FROM (SELECT doc_id, nw,
                      unnest([{{'pos': i, 'gh': gh[i]}}
                              for i in range(1, len(gh) + 1)]) AS u
                    FROM g)),
        d AS (SELECT gh FROM p GROUP BY gh HAVING COUNT(*) >= 2),
        h AS (SELECT * FROM p WHERE gh IN (SELECT gh FROM d)),
        i AS (SELECT doc_id, nw, pos,
                     pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                              ORDER BY pos) AS isl
              FROM h),
        s AS (SELECT doc_id, MIN(pos) AS start_word,
                     LEAST(MAX(pos) + 7, MAX(nw)) AS end_word
              FROM i GROUP BY doc_id, isl)
        SELECT doc_id, start_word, end_word,
               end_word - start_word + 1 AS span_words
        FROM s ORDER BY doc_id, start_word"""
    o["text_heavy_hitters"] = f"""
        WITH norm AS (SELECT {_NORM_DOC} AS t FROM documents),
        w AS (SELECT unnest(list_filter(string_split(t, ' '),
                            x -> x <> '')) AS term FROM norm)
        SELECT term, COUNT(*) AS n FROM w
        GROUP BY term ORDER BY n DESC, term LIMIT 20"""
    o["text_vocab_coverage"] = f"""
        WITH norm AS (SELECT {_NORM_DOC} AS t FROM documents),
        w AS (SELECT unnest(list_filter(string_split(t, ' '),
                            x -> x <> '')) AS term FROM norm),
        tf AS (SELECT term, COUNT(*) AS tf FROM w GROUP BY term),
        tot AS (SELECT SUM(tf) AS total FROM tf),
        top AS (SELECT term, tf FROM tf ORDER BY tf DESC, term LIMIT 100)
        SELECT CAST(row_number() OVER (ORDER BY tf DESC, term) AS INT)
                 AS rank, term, tf,
               ROUND(SUM(tf) OVER (ORDER BY tf DESC, term
                       ROWS UNBOUNDED PRECEDING)
                 / CAST((SELECT total FROM tot) AS DOUBLE), 6) AS cum_frac
        FROM top"""
    o["text_ngrams"] = f"""
        WITH norm AS (SELECT {_NORM_DOC} AS t FROM documents),
        w AS (SELECT list_filter(string_split(t, ' '), x -> x <> '')
                AS words FROM norm),
        g AS (SELECT unnest([concat_ws(' ', words[i], words[i+1])
                             for i in range(1, len(words))]) AS ngram
              FROM w WHERE len(words) >= 2),
        c AS (SELECT ngram, COUNT(*) AS tf FROM g GROUP BY ngram
              ORDER BY tf DESC, ngram LIMIT 50)
        SELECT ngram, tf, CAST(row_number() OVER (ORDER BY tf DESC, ngram)
                 AS INT) AS rank FROM c"""
    o["events_anomaly"] = """
        WITH per AS (SELECT event_type,
               CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               COUNT(*) AS n FROM events GROUP BY 1, 2)
        SELECT event_type, day, n,
               ROUND(CASE WHEN stddev_pop(n) OVER
                   (PARTITION BY event_type) = 0 THEN 0.0
                 ELSE (n - avg(n) OVER (PARTITION BY event_type))
                   / stddev_pop(n) OVER (PARTITION BY event_type)
                 END, 6) AS z,
               abs(ROUND(CASE WHEN stddev_pop(n) OVER
                   (PARTITION BY event_type) = 0 THEN 0.0
                 ELSE (n - avg(n) OVER (PARTITION BY event_type))
                   / stddev_pop(n) OVER (PARTITION BY event_type)
                 END, 6)) >= 2.0 AS is_anomaly
        FROM per"""
    o["events_retention"] = """
        WITH days AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
                      FROM events),
        cohort AS (SELECT u, MIN(d) AS c0 FROM days GROUP BY u)
        SELECT CAST(c0 AS VARCHAR) AS cohort_day,
               date_diff('day', c0, d) AS day_offset,
               COUNT(*) AS n_users
        FROM days JOIN cohort USING (u)
        GROUP BY 1, 2 ORDER BY 1, 2"""
    o["events_json"] = """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
               MIN(CAST(props->>'k' AS BIGINT)) AS k_min,
               MAX(CAST(props->>'k' AS BIGINT)) AS k_max
        FROM events GROUP BY event_type ORDER BY event_type"""
    o["text_pack"] = f"""
        WITH t AS (SELECT doc_id,
               len(list_filter(string_split({_NORM_DOC}, ' '),
                   t -> t <> '')) AS n
               FROM documents),
        c AS (SELECT doc_id, n,
              SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cend
              FROM t WHERE n > 0),
        s AS (SELECT doc_id, n, cend, cend - n AS cstart FROM c)
        SELECT doc_id,
               CAST(cstart // 64 + o.k AS BIGINT) AS seq_id,
               CAST(GREATEST(cstart, (cstart // 64 + o.k) * 64) - cstart
                    AS BIGINT) AS doc_tok_start,
               CAST(LEAST(cend, (cstart // 64 + o.k + 1) * 64)
                    - GREATEST(cstart, (cstart // 64 + o.k) * 64)
                    AS BIGINT) AS n_tok
        FROM s, generate_series(0, 8) o(k)
        WHERE cstart // 64 + o.k <= (cend - 1) // 64"""
    o["dedup_incremental"] = f"""
        WITH norm AS (SELECT doc_id AS id, {_NORM_DOC} AS t FROM documents),
        sets AS (SELECT id, list_distinct([substring(t, i, 5)
                 for i in range(1, greatest(1, length(t) - 4) + 1)]) AS shs
                 FROM norm),
        hashed AS (SELECT id, list_transform(shs, s ->
                   CAST(CONCAT('0x', SUBSTRING(md5(s), 1, 15)) AS BIGINT)
                   % 2147483647) AS hs FROM sets),
        sigs AS (SELECT id, [list_min(list_transform(hs, h ->
                 ((2 * i + 1) * h + i * 40503 + 1) % 2147483647))
                 for i in range(0, 32)] AS sig FROM hashed),
        banded AS (SELECT id, sig, t.b AS band,
                   md5(CAST(sig[t.b * 4 + 1 : t.b * 4 + 4] AS VARCHAR)) AS bhash
                   FROM sigs, range(0, 8) t(b)),
        cand AS (SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
                 FROM banded c JOIN banded n
                 ON c.band = n.band AND c.bhash = n.bhash
                 AND c.id % 5 <> 0 AND n.id % 5 = 0)
        SELECT new_id, corpus_id,
               ROUND(list_sum(list_transform(list_zip(sn.sig, sc.sig),
                     x -> CASE WHEN x[1] = x[2] THEN 1 ELSE 0 END))
                     / len(sn.sig), 6) AS est_jaccard
        FROM cand
        JOIN sigs sn ON sn.id = new_id
        JOIN sigs sc ON sc.id = corpus_id
        WHERE list_sum(list_transform(list_zip(sn.sig, sc.sig),
              x -> CASE WHEN x[1] = x[2] THEN 1 ELSE 0 END))
              / len(sn.sig) >= 0.5"""
    # -- wave-3 oracles ----------------------------------------------------
    # PageRank: same power iteration unrolled as plain CTEs (the
    # generator lives next to the operator so the arithmetic can never
    # drift from the Spark side)
    from yardstick_spark.operators import (lpa_sql, pagerank_sql,
                                           zorder_key_sql_duckdb)

    _PR_EDGES = """
        SELECT from_type AS src, to_type AS dst,
               CAST(COUNT(*) AS DOUBLE) AS w
        FROM (SELECT event_type AS from_type,
                     LEAD(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                       AS to_type
              FROM events) t
        WHERE to_type IS NOT NULL GROUP BY 1, 2"""
    o["graph_pagerank"] = (
        "SELECT node, ROUND(rank, 6) AS rank FROM ("
        + pagerank_sql(_PR_EDGES, iterations=8, materialized=True)
        + ") q"
    )
    _ZDIMS = [("x", 0, 4095), ("y", 0, 4095)]
    o["ops_zorder"] = f"""
        WITH d AS (SELECT CAST(o_custkey % 4096 AS BIGINT) AS x,
                          CAST((o_orderkey * 2654435761) % 4096 AS BIGINT)
                            AS y
                   FROM orders),
        z AS (SELECT x, y, {zorder_key_sql_duckdb(_ZDIMS, 12)} AS zkey
              FROM d)
        SELECT zkey >> 20 AS bucket, COUNT(*) AS n,
               MIN(x) AS min_x, MAX(x) AS max_x,
               MIN(y) AS min_y, MAX(y) AS max_y
        FROM z GROUP BY 1"""
    # blocked levenshtein ER: identical blocking (token + length//4
    # bucket), length pre-filter, and edit threshold
    o["dedup_fuzzy"] = r"""
        WITH k AS (SELECT DISTINCT id, s,
                          tok || '#' || CAST(length(s) // 4 AS VARCHAR)
                            AS block
                   FROM (SELECT p_partkey AS id, lower(trim(p_name)) AS s,
                                unnest(string_split_regex(
                                  lower(trim(p_name)), '\s+')) AS tok
                         FROM part) t
                   WHERE tok <> ''),
        ok AS (SELECT block FROM k GROUP BY block
               HAVING COUNT(*) <= 10000)
        SELECT DISTINCT a.id AS id_a, b.id AS id_b,
               levenshtein(a.s, b.s) AS edit
        FROM k a JOIN ok USING (block) JOIN k b USING (block)
        WHERE a.id < b.id
          AND abs(length(a.s) - length(b.s)) <= 1
          AND levenshtein(a.s, b.s) <= 1"""
    o["events_pivot"] = """
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               ROUND(SUM(CASE WHEN event_type = 'click' THEN value END), 2)
                 AS click,
               ROUND(SUM(CASE WHEN event_type = 'error' THEN value END), 2)
                 AS error,
               ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 2)
                 AS purchase,
               ROUND(SUM(CASE WHEN event_type = 'signup' THEN value END), 2)
                 AS signup,
               ROUND(SUM(CASE WHEN event_type = 'view' THEN value END), 2)
                 AS view
        FROM events GROUP BY 1"""
    # mm_phash: analytic oracle — synth_textured_media is built so
    # equal content id (doc_id % 40) <=> identical pHash (brightness
    # shifts land entirely in the dropped DC term) and distinct
    # contents are >= 17 bits apart, so the exact pair set is
    # intra-content pairs at hamming 0 (see _q_mm_phash)
    o["mm_phash"] = """
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0 AS hamming
        FROM documents a JOIN documents b
          ON a.doc_id % 40 = b.doc_id % 40 AND a.doc_id < b.doc_id"""
    # fuzzy pairs -> transitive closure -> canonical verdict (same
    # recursive-CTE closure as dedup_clusters, over levenshtein edges)
    o["dedup_fuzzy_clusters"] = r"""
        WITH RECURSIVE k AS (SELECT DISTINCT id, s,
                          tok || '#' || CAST(length(s) // 4 AS VARCHAR)
                            AS block
                   FROM (SELECT p_partkey AS id, lower(trim(p_name)) AS s,
                                unnest(string_split_regex(
                                  lower(trim(p_name)), '\s+')) AS tok
                         FROM part) t
                   WHERE tok <> ''),
        ok AS (SELECT block FROM k GROUP BY block
               HAVING COUNT(*) <= 10000),
        fpairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                   FROM k a JOIN ok USING (block) JOIN k b USING (block)
                   WHERE a.id < b.id
                     AND abs(length(a.s) - length(b.s)) <= 1
                     AND levenshtein(a.s, b.s) <= 1),
        edges AS (SELECT id_a AS src, id_b AS dst FROM fpairs
                  UNION SELECT id_b, id_a FROM fpairs),
        walk(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src
        ),
        lbl AS (SELECT src AS id, LEAST(src, MIN(dst)) AS cluster_id
                FROM walk GROUP BY src)
        SELECT p.p_partkey,
               COALESCE(l.cluster_id, p.p_partkey) AS cluster_id,
               p.p_partkey = COALESCE(l.cluster_id, p.p_partkey) AS keep
        FROM part p LEFT JOIN lbl l ON l.id = p.p_partkey"""
    # doc-centrality: bit-exact minhash pair SQL feeds the unrolled
    # power iteration (unit weights, symmetrized)
    _DOC_EDGES = f"""
        WITH p AS ({mh_pairs})
        SELECT id_a AS src, id_b AS dst, 1.0 AS w FROM p
        UNION ALL
        SELECT id_b AS src, id_a AS dst, 1.0 AS w FROM p"""
    o["graph_doc_rank"] = (
        "SELECT node, ROUND(rank, 6) AS rank FROM ("
        + pagerank_sql(_DOC_EDGES, iterations=6, materialized=True)
        + ") q"
    )
    # LPA communities over the same bit-exact near-dup pair SQL;
    # lpa_sql symmetrizes internally, so feed the raw directed pairs
    o["graph_communities"] = lpa_sql(
        f"WITH p AS ({mh_pairs}) SELECT id_a AS src, id_b AS dst FROM p",
        iterations=4, materialized=True,
    )
    # square-wave audio features are analytic: n = 20*hp samples in 20
    # alternating blocks -> 19 sign transitions; period = 2*hp;
    # amp = a/32768 (see synth_square_wav)
    o["mm_audio_fp"] = """
        WITH g AS (SELECT doc_id, (doc_id % 30) % 10 + 2 AS hp,
                          (doc_id % 5 + 1) * 3000 AS a
                   FROM documents)
        SELECT doc_id AS media_id,
               CAST(20 * hp AS BIGINT) AS n_samples,
               CAST(19 AS INT) AS n_transitions,
               ROUND(19.0 / (20 * hp - 1), 6) AS zcr,
               CAST(2 * hp AS INT) AS est_period,
               ROUND(a / 32768.0, 6) AS amp
        FROM g"""
    # containment: same shingle CTE as the jaccard oracle, but
    # common / min(|A|, |B|) — the near-superset signal
    o["dedup_containment"] = f"""
        WITH norm AS (SELECT doc_id AS id, {_NORM_DOC} AS t FROM documents),
        sh AS (SELECT id, UNNEST(list_distinct([substring(t, i, 5)
                   for i in range(1, greatest(1, length(t) - 4) + 1)])) AS sh
               FROM norm),
        sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
        pairs AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS common
                  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
                  GROUP BY 1, 2)
        SELECT id_a, id_b,
               ROUND(common / least(sa.n_sh, sb.n_sh), 6) AS containment
        FROM pairs
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE common / least(sa.n_sh, sb.n_sh) >= 0.8"""
    # scene cuts are analytic: w=id%5+2, h=id%3+2, n=id%6+4 frames,
    # cut after frame c=id%(n-1)+1, colors v1=id%251 / v2=(7id+13)%251
    # -> diff=|v2-v1|/255 at frame c, 0 elsewhere (synth_video)
    o["mm_scene_cuts"] = """
        WITH g AS (SELECT doc_id,
                          doc_id % 6 + 4 AS n,
                          doc_id % (doc_id % 6 + 3) + 1 AS c,
                          doc_id % 251 AS v1,
                          (doc_id * 7 + 13) % 251 AS v2
                   FROM documents),
        f AS (SELECT doc_id, CAST(unnest(range(1, n)) AS INT)
                     AS frame_idx, c, v1, v2 FROM g)
        SELECT doc_id AS media_id, frame_idx,
               CASE WHEN frame_idx = c
                    THEN ROUND(abs(v2 - v1) / 255.0, 6)
                    ELSE 0.0 END AS diff,
               CASE WHEN frame_idx = c
                    THEN ROUND(abs(v2 - v1) / 255.0, 6) > 0.1
                    ELSE FALSE END AS is_cut
        FROM f"""
    # Zipf fit: same closed-form OLS (REGR_*) over the identically-
    # ranked top-50 term counts
    o["text_zipf"] = f"""
        WITH norm AS (SELECT {_NORM_DOC} AS t FROM documents),
        w AS (SELECT unnest(list_filter(string_split(t, ' '),
                 x -> x <> '')) AS term FROM norm),
        c AS (SELECT term, COUNT(*) AS tf FROM w GROUP BY term),
        top AS (SELECT term, tf FROM c ORDER BY tf DESC, term LIMIT 50),
        r AS (SELECT tf, row_number() OVER (ORDER BY tf DESC, term)
                 AS rank FROM top)
        SELECT COUNT(*) AS n_terms,
               ROUND(REGR_SLOPE(ln(tf), ln(rank)), 6) AS slope,
               ROUND(REGR_INTERCEPT(ln(tf), ln(rank)), 6) AS intercept,
               ROUND(REGR_R2(ln(tf), ln(rank)), 6) AS r2
        FROM r"""
    # MMR rounds unrolled as CTEs; sims round to 4 dp on both engines
    # and the score literals are the same two doubles
    from yardstick_spark.llm import mmr_sql
    o["sim_mmr"] = mmr_sql("embeddings", "id < 3", k=5, pool=20, lam=0.7)
    # distance-to-own-prototype z-scores; prototype CTE identical to
    # the emb_medoids oracle (ROUND(AVG, 6) matches label_prototypes)
    o["emb_outliers"] = """
        WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        p AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS pos),
        cent AS (SELECT label, pos, ROUND(AVG(e[pos + 1]), 6) AS c
                 FROM v CROSS JOIN p GROUP BY label, pos),
        cl AS (SELECT label, list(c ORDER BY pos) AS ce
               FROM cent GROUP BY label),
        sc AS (SELECT v.vec_id AS id, v.label,
               ROUND(sqrt(list_sum(list_transform(list_zip(v.e, cl.ce),
                   t -> (t[1] - t[2]) * (t[1] - t[2])))), 6) AS dist
               FROM v JOIN cl USING (label))
        SELECT id, label, dist,
               ROUND(CASE WHEN STDDEV_POP(dist)
                              OVER (PARTITION BY label) = 0 THEN 0
                     ELSE (dist - AVG(dist) OVER (PARTITION BY label))
                          / STDDEV_POP(dist) OVER (PARTITION BY label)
                     END, 4) + 0.0 AS z
        FROM sc"""
    # one-pass distributed covariance.  Both engines quantize each
    # coordinate to floor(x*1e6) and sum EXACT integers (Spark:
    # int64 Gram chunks folded into DECIMAL(38,0); DuckDB: HUGEINT),
    # then assemble cov with the token-identical double expression —
    # so the comparison is bit-exact under ANY partition split (the
    # round-5 red row was float-sum order sensitivity at the 6-dp
    # rounding boundary)
    o["emb_covariance"] = """
        WITH v AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * 1000000) AS HUGEINT)) AS q
                   FROM embeddings
                   WHERE embedding IS NOT NULL AND len(embedding) > 0),
        p AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS pos),
        s AS (SELECT p1.pos AS i, p2.pos AS j,
                     SUM(q[p1.pos + 1] * q[p2.pos + 1]) AS sxy,
                     SUM(q[p1.pos + 1]) AS sx,
                     SUM(q[p2.pos + 1]) AS sy,
                     COUNT(*) AS n
              FROM v CROSS JOIN p p1 CROSS JOIN p p2
              WHERE p1.pos <= p2.pos
              GROUP BY p1.pos, p2.pos)
        SELECT i, j,
               ROUND(CAST(sxy * n - sx * sy AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e12),
                     6) + 0.0 AS cov
        FROM s"""
    # JL signs are md5 parity — f"42:{plane}:{dim}", low bit of the
    # 15-hex-digit prefix — identical to similarity._md5_signs
    o["emb_jl_project"] = """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings),
        p AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS pos),
        d AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS di),
        s AS (SELECT pos, di,
                CASE WHEN CAST(CONCAT('0x', SUBSTRING(md5(
                         '42:' || CAST(pos AS VARCHAR) || ':'
                         || CAST(di AS VARCHAR)), 1, 15)) AS BIGINT)
                     % 2 = 1
                     THEN 1.0 ELSE -1.0 END AS sgn
              FROM p CROSS JOIN d)
        SELECT vec_id AS id, pos,
               ROUND(SUM(e[di + 1] * sgn) / sqrt(8), 6) AS val
        FROM v CROSS JOIN s
        GROUP BY vec_id, pos"""
    # PQ: codebook cells are md5 buckets of f"{sub}:{id}" (min-id donor
    # vector's subspace slice), distances rounded to 6 dp before the
    # argmin on BOTH engines, ties to the lower code
    _PQ_CB = """
        v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS arr
              FROM embeddings
              WHERE embedding IS NOT NULL AND len(embedding) > 0),
        subs AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS sub),
        cells AS (SELECT sub,
                  CAST(CONCAT('0x', SUBSTRING(md5(CAST(sub AS VARCHAR)
                       || ':' || CAST(id AS VARCHAR)), 1, 15)) AS BIGINT)
                  % 16 AS code,
                  MIN(id) AS id
                  FROM v CROSS JOIN subs GROUP BY sub, 2),
        cb AS (SELECT sub, code,
                      arr[sub * 8 + 1 : sub * 8 + 8] AS centroid
               FROM cells JOIN v USING (id)),
        enc AS (SELECT v.id, cb.sub, cb.code,
                ROUND(list_sum(list_transform(
                    list_zip(v.arr[cb.sub * 8 + 1 : cb.sub * 8 + 8],
                             cb.centroid),
                    t -> (t[1] - t[2]) * (t[1] - t[2]))), 6) AS dist
                FROM v CROSS JOIN cb),
        best AS (SELECT id, sub, code FROM (
                 SELECT *, row_number() OVER (PARTITION BY id, sub
                          ORDER BY dist, code) AS rn FROM enc)
                 WHERE rn = 1)"""
    o["emb_pq"] = f"""
        WITH {_PQ_CB}
        SELECT id AS vec_id, sub, CAST(code AS INT) AS code FROM best"""
    o["sim_knn_pq"] = f"""
        WITH {_PQ_CB},
        lut AS (SELECT q.id AS query_id, cb.sub, cb.code,
                ROUND(list_sum(list_transform(
                    list_zip(q.arr[cb.sub * 8 + 1 : cb.sub * 8 + 8],
                             cb.centroid),
                    t -> (t[1] - t[2]) * (t[1] - t[2]))), 6) AS pdist
                FROM v q CROSS JOIN cb WHERE q.id < 5),
        ad AS (SELECT lut.query_id, b.id AS neighbor_id,
                      ROUND(SUM(pdist), 6) AS adist
               FROM best b
               JOIN lut ON b.sub = lut.sub AND b.code = lut.code
               GROUP BY 1, 2)
        SELECT query_id, neighbor_id, adist, rank FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY adist, neighbor_id) AS INT) AS rank
          FROM ad) WHERE rank <= 10"""
    # trained PQ: the md5 seed cells initialize 2 unrolled Lloyd
    # rounds on the exact 1e-6 integer grid (BIGINT distances, the
    # kmeans-oracle mean idiom), then the same encode/LUT/ADC chain
    # runs over the trained centroids (x / 1e6 — the identical double
    # on both engines)
    _PQ_LLOYD = "\n".join(
        f"""
        a{t} AS (SELECT sub, code, sq FROM (
                SELECT vq.id, vq.sub, c.code, vq.sq,
                       list_sum([(vq.sq[j] - c.cq[j])
                                 * (vq.sq[j] - c.cq[j])
                                 for j in range(1, 9)]) AS dist
                FROM vq JOIN cq{t - 1} AS c USING (sub))
               QUALIFY row_number() OVER (PARTITION BY id, sub
                        ORDER BY dist, code) = 1),
        u{t} AS (SELECT sub, code, t.j AS d, SUM(sq[t.j]) AS s,
                        COUNT(*) AS n
                FROM a{t}, generate_series(1, 8) AS t(j)
                GROUP BY sub, code, t.j),
        cq{t} AS (SELECT sub, code,
                 list(CAST(round(s / CAST(n AS DOUBLE)) AS BIGINT)
                      ORDER BY d) AS cq
                 FROM u{t} GROUP BY sub, code),"""
        for t in (1, 2))
    o["sim_knn_pq_trained"] = f"""
        WITH
        v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS arr
              FROM embeddings
              WHERE embedding IS NOT NULL AND len(embedding) > 0),
        subs AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS sub),
        cells AS (SELECT sub,
                  CAST(CONCAT('0x', SUBSTRING(md5(CAST(sub AS VARCHAR)
                       || ':' || CAST(id AS VARCHAR)), 1, 15)) AS BIGINT)
                  % 16 AS code,
                  MIN(id) AS id
                  FROM v CROSS JOIN subs GROUP BY sub, 2),
        vq AS (SELECT v.id, subs.sub,
               list_transform(v.arr[subs.sub * 8 + 1 : subs.sub * 8 + 8],
                 x -> CAST(round(x * 1000000.0) AS BIGINT)) AS sq
               FROM v CROSS JOIN subs),
        cq0 AS (SELECT cells.sub, cells.code,
                list_transform(v.arr[cells.sub * 8 + 1
                                     : cells.sub * 8 + 8],
                  x -> CAST(round(x * 1000000.0) AS BIGINT)) AS cq
                FROM cells JOIN v USING (id)),
        {_PQ_LLOYD}
        cb AS (SELECT sub, code,
               list_transform(cq, x -> x / 1000000.0) AS centroid
               FROM cq2),
        enc AS (SELECT v.id, cb.sub, cb.code,
                ROUND(list_sum(list_transform(
                    list_zip(v.arr[cb.sub * 8 + 1 : cb.sub * 8 + 8],
                             cb.centroid),
                    t -> (t[1] - t[2]) * (t[1] - t[2]))), 6) AS dist
                FROM v CROSS JOIN cb),
        best AS (SELECT id, sub, code FROM (
                 SELECT *, row_number() OVER (PARTITION BY id, sub
                          ORDER BY dist, code) AS rn FROM enc)
                 WHERE rn = 1),
        lut AS (SELECT q.id AS query_id, cb.sub, cb.code,
                ROUND(list_sum(list_transform(
                    list_zip(q.arr[cb.sub * 8 + 1 : cb.sub * 8 + 8],
                             cb.centroid),
                    t -> (t[1] - t[2]) * (t[1] - t[2]))), 6) AS pdist
                FROM v q CROSS JOIN cb WHERE q.id < 5),
        ad AS (SELECT lut.query_id, b.id AS neighbor_id,
                      ROUND(SUM(pdist), 6) AS adist
               FROM best b
               JOIN lut ON b.sub = lut.sub AND b.code = lut.code
               GROUP BY 1, 2)
        SELECT query_id, neighbor_id, adist, rank FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY adist, neighbor_id) AS INT) AS rank
          FROM ad) WHERE rank <= 10"""
    # triangle set is orientation-independent: naive a<b<c triple join
    # over the bigram co-occurrence edges
    o["graph_triangles"] = f"""
        WITH norm AS (SELECT {_NORM_DOC} AS t FROM documents),
        w AS (SELECT list_filter(string_split(t, ' '), x -> x <> '')
                AS words FROM norm),
        g AS (SELECT unnest([[words[i], words[i+1]]
                             for i in range(1, len(words))]) AS pr
              FROM w WHERE len(words) >= 2),
        e AS (SELECT DISTINCT least(pr[1], pr[2]) AS a,
                     greatest(pr[1], pr[2]) AS b
              FROM g WHERE pr[1] <> pr[2]),
        t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM e e1
              JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
              JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        m AS (SELECT x AS node FROM t UNION ALL SELECT y FROM t
              UNION ALL SELECT z FROM t),
        c AS (SELECT node, COUNT(*) AS n_triangles FROM m GROUP BY node),
        nodes AS (SELECT a AS node FROM e UNION SELECT b FROM e)
        SELECT nodes.node,
               CAST(COALESCE(c.n_triangles, 0) AS BIGINT) AS n_triangles
        FROM nodes LEFT JOIN c USING (node)"""
    o["ops_benford"] = """
        WITH b AS (SELECT CAST(floor(o_totalprice
                     / pow(10, floor(log10(o_totalprice)))) AS INT)
                     AS digit
                   FROM orders WHERE o_totalprice > 0),
        g AS (SELECT digit, COUNT(*) AS n FROM b GROUP BY digit),
        t AS (SELECT SUM(n) AS tot FROM g)
        SELECT digit, n, ROUND(n / tot, 6) AS share,
               ROUND(log10(1 + 1 / digit), 6) AS benford,
               ROUND(n / tot - log10(1 + 1 / digit), 6) AS delta
        FROM g, t"""
    # CCNet line dedup: frequent normalized lines dropped everywhere,
    # documents reassembled in original line order
    o["dedup_lines"] = """
        WITH ex AS (SELECT doc_id,
                      generate_subscripts(string_split("text", chr(10)), 1)
                        AS pos,
                      unnest(string_split("text", chr(10))) AS line
                    FROM documents WHERE "text" IS NOT NULL),
        keyed AS (SELECT doc_id, pos, line,
                    regexp_replace(lower(trim(line)), '\\s+', ' ', 'g') AS k
                  FROM ex),
        freq AS (SELECT k FROM keyed WHERE k <> ''
                 GROUP BY k HAVING COUNT(DISTINCT doc_id) >= 2)
        SELECT keyed.doc_id,
               COALESCE(string_agg(line, chr(10) ORDER BY pos)
                        FILTER (WHERE freq.k IS NULL), '') AS clean_text,
               COUNT(*) AS n_lines,
               CAST(COALESCE(SUM(CASE WHEN freq.k IS NOT NULL
                                      THEN 1 ELSE 0 END), 0) AS BIGINT)
                 AS n_dropped
        FROM keyed LEFT JOIN freq ON keyed.k = freq.k
        GROUP BY keyed.doc_id"""
    # split leakage: the exact n-gram-Jaccard pair SQL, each side
    # assigned its split by the same md5 CASE ladder, cross-split only
    o["ops_split_leakage"] = f"""
        WITH p AS ({o['dedup_ngram_jaccard']})
        SELECT id_a, id_b, jaccard,
               {_split_case_sql('id_a')} AS split_a,
               {_split_case_sql('id_b')} AS split_b
        FROM p
        WHERE {_split_case_sql('id_a')} <> {_split_case_sql('id_b')}"""
    # leakage-safe remediation: the dedup_clusters verdict with the
    # split CASE keyed on the cluster representative
    o["ops_leakage_safe_split"] = f"""
        WITH c AS ({o['dedup_clusters']})
        SELECT doc_id, cluster_id, keep,
               {_split_case_sql('cluster_id')} AS split
        FROM c"""
    # quality-canonical dedup: same closure, keep = highest n_chars
    # (ties to the lower id) within each cluster
    o["dedup_keep_best"] = f"""
        WITH c AS ({o['dedup_clusters']})
        SELECT c.doc_id, c.cluster_id, d.n_chars AS score,
               ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                  ORDER BY d.n_chars DESC, c.doc_id) = 1
                 AS keep
        FROM c JOIN documents d USING (doc_id)"""
    # incremental line dedup: the combined corpus+batch distinct-doc
    # count equals the count over ALL documents (disjoint doc sets),
    # restricted to the batch's rows
    o["dedup_lines_incremental"] = """
        WITH ex AS (SELECT doc_id,
                      generate_subscripts(string_split("text", chr(10)), 1)
                        AS pos,
                      unnest(string_split("text", chr(10))) AS line
                    FROM documents WHERE "text" IS NOT NULL),
        keyed AS (SELECT doc_id, pos, line,
                    regexp_replace(lower(trim(line)), '\\s+', ' ', 'g') AS k
                  FROM ex),
        freq AS (SELECT k FROM keyed WHERE k <> ''
                 GROUP BY k HAVING COUNT(DISTINCT doc_id) >= 2)
        SELECT keyed.doc_id,
               COALESCE(string_agg(line, chr(10) ORDER BY pos)
                        FILTER (WHERE freq.k IS NULL), '') AS clean_text,
               COUNT(*) AS n_lines,
               CAST(COALESCE(SUM(CASE WHEN freq.k IS NOT NULL
                                      THEN 1 ELSE 0 END), 0) AS BIGINT)
                 AS n_dropped
        FROM keyed LEFT JOIN freq ON keyed.k = freq.k
        WHERE keyed.doc_id % 5 = 0
        GROUP BY keyed.doc_id"""
    # ER survivorship over the same closure: merged per-family record
    o["dedup_survivorship"] = f"""
        WITH c AS ({o['dedup_clusters']})
        SELECT c.cluster_id, MIN(c.doc_id) AS keep_id,
               COUNT(*) AS n_members,
               string_agg(DISTINCT d.source, ',' ORDER BY d.source)
                 AS sources,
               MAX(d.n_chars) AS max_size,
               CAST(SUM(d.n_chars) AS BIGINT) AS total_size
        FROM c JOIN documents d USING (doc_id)
        GROUP BY c.cluster_id"""
    o["events_dedup_window"] = """
        WITH w AS (SELECT event_id, user_id, event_type, ts,
                     LAG(ts) OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS prev
                   FROM events)
        SELECT event_id, user_id, event_type, ts,
               (prev IS NOT NULL AND ts - prev <= INTERVAL '120' SECOND)
                 AS is_duplicate
        FROM w"""
    # cross-source duplication matrix over the minhash pair set
    o["dedup_source_matrix"] = f"""
        WITH p AS ({mh_pairs}),
        lk AS (SELECT doc_id, source FROM documents),
        att AS (SELECT least(a.source, b.source) AS source_a,
                       greatest(a.source, b.source) AS source_b
                FROM p JOIN lk a ON a.doc_id = p.id_a
                       JOIN lk b ON b.doc_id = p.id_b),
        cells AS (SELECT source_a, source_b, COUNT(*) AS n_pairs
                  FROM att GROUP BY 1, 2),
        t AS (SELECT SUM(n_pairs) AS tot FROM cells)
        SELECT source_a, source_b, n_pairs,
               ROUND(n_pairs / tot, 6) AS share
        FROM cells, t"""
    o["text_mojibake"] = """
        WITH c AS (SELECT doc_id, length("text") AS n_chars,
               len(regexp_extract_all("text", 'Ã|Â|â€'))
                 AS n_mojibake,
               len(regexp_extract_all("text", '\\x{FFFD}'))
                 AS n_replacement,
               len(regexp_extract_all("text",
                   '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) AS n_control
             FROM documents),
        k AS (SELECT *, ROUND((n_mojibake + n_replacement + n_control)
                     * 1000.0 / greatest(n_chars, 1), 6) AS per_kchar
              FROM c)
        SELECT doc_id, n_chars, n_mojibake, n_replacement, n_control,
               per_kchar, per_kchar >= 1.0 AS flagged
        FROM k"""
    o["text_token_budget"] = f"""
        WITH norm AS (SELECT doc_id, {_NORM_DOC} AS t FROM documents),
        f AS (SELECT doc_id, greatest(length(t), 1) AS n, length(t) AS lt,
                length(regexp_replace(t, '[^a-z]', '', 'g')) AS alpha,
                length(regexp_replace(t, '[^.,;:!?]', '', 'g')) AS punct,
                list_filter(string_split(t, ' '), x -> x <> '') AS words
              FROM norm),
        q AS (SELECT doc_id,
                ROUND(least(1.0, 0.4 * least(lt / 500.0, 1.0)
                      + 0.4 * (alpha / CAST(n AS DOUBLE))
                      + 0.2 * least(punct / CAST(greatest(len(words), 1)
                                                 AS DOUBLE), 1.0)), 6)
                  AS score,
                CAST(len(words) AS INT) AS n_tokens FROM f),
        c AS (SELECT doc_id, score, n_tokens,
                CAST(SUM(n_tokens) OVER (ORDER BY score DESC, doc_id)
                     AS BIGINT) AS cum_tokens
              FROM q WHERE n_tokens > 0)
        SELECT doc_id, score, n_tokens, cum_tokens
        FROM c WHERE cum_tokens <= 15000"""
    return o
