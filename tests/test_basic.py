"""Slice-0 end-to-end: catalog + AGGREGATE + implicit GROUP BY + AT (ALL*)
on decomposable measures (SURVEY.md §7 order-of-work step 1).

Golden values from /root/reference/test/sql/measures.test:12-35, :722-729,
:1447-1458.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def sales_v(ys, sales):
    ys.sql(
        "CREATE VIEW sales_v AS SELECT year, region, "
        "SUM(amount) AS MEASURE revenue FROM sales"
    )
    return ys


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_basic_aggregate(sales_v):
    df = sales_v.sql("SELECT year, region, AGGREGATE(revenue) AS rev FROM sales_v")
    assert rows(df) == [
        (2022, "EU", 50.0),
        (2022, "US", 100.0),
        (2023, "EU", 75.0),
        (2023, "US", 150.0),
    ]


def test_grand_total_no_dims(sales_v):
    df = sales_v.sql("SELECT AGGREGATE(revenue) AS rev FROM sales_v")
    assert rows(df) == [(375.0,)]


def test_at_all(sales_v):
    df = sales_v.sql(
        "SELECT year, region, AGGREGATE(revenue) AS rev, "
        "AGGREGATE(revenue) AT (ALL) AS total FROM sales_v"
    )
    assert rows(df) == [
        (2022, "EU", 50.0, 375.0),
        (2022, "US", 100.0, 375.0),
        (2023, "EU", 75.0, 375.0),
        (2023, "US", 150.0, 375.0),
    ]


def test_at_all_dim(sales_v):
    # measures.test:722-729 shape: yearly total per (year, region)
    df = sales_v.sql(
        "SELECT year, region, AGGREGATE(revenue) AS rev, "
        "AGGREGATE(revenue) AT (ALL region) AS year_total FROM sales_v"
    )
    assert rows(df) == [
        (2022, "EU", 50.0, 150.0),
        (2022, "US", 100.0, 150.0),
        (2023, "EU", 75.0, 225.0),
        (2023, "US", 150.0, 225.0),
    ]


def test_pct_of_total(sales_v):
    df = sales_v.sql(
        "SELECT year, region, "
        "AGGREGATE(revenue) / AGGREGATE(revenue) AT (ALL) * 100 AS pct "
        "FROM sales_v ORDER BY year, region"
    )
    got = [(r[0], r[1], round(r[2], 2)) for r in df.collect()]
    assert got == [
        (2022, "EU", 13.33),
        (2022, "US", 26.67),
        (2023, "EU", 20.0),
        (2023, "US", 40.0),
    ]


def test_at_where(sales_v):
    # AT (WHERE ...) replaces the context filter and is NOT correlated
    df = sales_v.sql(
        "SELECT year, AGGREGATE(revenue) AT (WHERE region = 'US') AS us_rev "
        "FROM sales_v GROUP BY year"
    )
    assert rows(df) == [(2022, 250.0), (2023, 250.0)]


def test_at_set(sales_v):
    df = sales_v.sql(
        "SELECT year, AGGREGATE(revenue) AS rev, "
        "AGGREGATE(revenue) AT (SET year = year - 1) AS prev_rev "
        "FROM sales_v GROUP BY year"
    )
    assert rows(df) == [(2022, 150.0, None), (2023, 225.0, 150.0)]


def test_visible_with_where(sales_v):
    import pytest

    # AT (ALL) dropping the outer year filter is exactly the S12
    # warning contract — assert the warning instead of leaking it
    with pytest.warns(UserWarning, match="does not preserve outer WHERE"):
        df = sales_v.sql(
            "SELECT region, AGGREGATE(revenue) AS rev, "
            "AGGREGATE(revenue) AT (ALL) AS total, "
            "AGGREGATE(revenue) AT (VISIBLE) AS vis "
            "FROM sales_v WHERE year = 2023 GROUP BY region"
        )
    # AT (ALL) ignores outer WHERE (375); VISIBLE honors it per-group
    assert rows(df) == [("EU", 75.0, 375.0, 75.0), ("US", 150.0, 375.0, 150.0)]


def test_where_filters_groups(sales_v):
    df = sales_v.sql(
        "SELECT year, region, AGGREGATE(revenue) AS rev FROM sales_v "
        "WHERE year = 2023"
    )
    assert rows(df) == [(2023, "EU", 75.0), (2023, "US", 150.0)]


def test_install_intercepts_bare_spark_sql(sales_v):
    # after install(), plain spark.sql handles measure queries (Q6
    # transparent-override parity); internal engine calls don't recurse,
    # ordinary SQL is untouched, uninstall() restores the original
    spark = sales_v.spark
    sales_v.install()
    try:
        df = spark.sql(
            "SELECT year, AGGREGATE(revenue) AS rev FROM sales_v "
            "GROUP BY year"
        )
        assert rows(df) == [(2022, 150.0), (2023, 225.0)]
        # non-measure SQL passes through unchanged
        assert spark.sql("SELECT 1 AS one").collect()[0]["one"] == 1
        # DDL through the bare entry point registers measures too
        spark.sql(
            "CREATE VIEW sales_v2 AS SELECT region, "
            "SUM(amount) AS MEASURE rev2 FROM sales"
        )
        df2 = spark.sql("SELECT region, AGGREGATE(rev2) AS r FROM sales_v2")
        assert rows(df2) == [("EU", 125.0), ("US", 250.0)]
    finally:
        sales_v.uninstall()
    # restored: bare spark.sql no longer understands AGGREGATE()
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.sql("SELECT AGGREGATE(revenue) FROM sales_v").collect()


def test_star_join_view_with_qualified_refs(spark):
    # a measure view whose body JOINS tables keeps its table aliases
    # visible to the context SQL: qualified dims (n.n_name) and measures
    # (SUM(o.o_totalprice)) must resolve — the derived-table wrapper
    # used to erase the aliases and fail analysis
    from yardstick_spark import MeasureSession
    from yardstick_spark.sources import register_parquet_dir

    register_parquet_dir(spark, "/root/testdata/sf0.001",
                         ["orders", "customer", "nation"])
    ys = MeasureSession(spark)
    ys.collect_warnings = False
    ys.sql(
        "CREATE OR REPLACE VIEW star_join_m AS SELECT n.n_name AS nation, "
        "SUM(o.o_totalprice) AS MEASURE rev "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE o.o_orderstatus = 'F'"
    )
    got = sorted(
        map(tuple, ys.sql(
            "SELECT nation, ROUND(AGGREGATE(rev), 2) AS rev, "
            "ROUND(AGGREGATE(rev) AT (ALL), 2) AS tot, "
            "ROUND(AGGREGATE(rev) AT (WHERE o_orderpriority = '1-URGENT'), 2)"
            " AS urgent "
            "FROM star_join_m GROUP BY nation"
        ).collect())
    )
    want = sorted(
        map(tuple, spark.sql(
            "SELECT n.n_name AS nation, ROUND(SUM(o.o_totalprice), 2) AS r, "
            "ROUND((SELECT SUM(o_totalprice) FROM orders "
            "WHERE o_orderstatus = 'F'), 2) AS tot, "
            "ROUND((SELECT SUM(o_totalprice) FROM orders "
            "WHERE o_orderstatus = 'F' "
            "AND o_orderpriority = '1-URGENT'), 2) AS urgent "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "WHERE o.o_orderstatus = 'F' GROUP BY n.n_name"
        ).collect())
    )
    assert got == want


def test_inline_as_measure_raises_clear_error(spark):
    # AS MEASURE belongs to CREATE VIEW; in a plain query it used to
    # half-expand into a confusing downstream parse error — the
    # engine now states the contract.  A comment or a plain alias
    # named `measure` must NOT trip the detector (measures.test:130).
    import pytest as _pytest

    from yardstick_spark import MeasureSession
    from yardstick_spark.sources import register_parquet_dir

    register_parquet_dir(spark, "/root/testdata/sf0.001", ["lineitem"])
    ys = MeasureSession(spark)
    ys.collect_warnings = False
    with _pytest.raises(Exception, match="only supported in CREATE VIEW"):
        ys.sql(
            "SELECT l_returnflag, AGGREGATE(rev) AS r FROM "
            "(SELECT l_returnflag, SUM(l_extendedprice) AS MEASURE rev "
            "FROM lineitem) GROUP BY l_returnflag"
        )
    # benign look-alikes pass through
    assert ys.sql(
        "SELECT l_returnflag AS measure FROM lineitem LIMIT 1 "
        "/* AS MEASURE */"
    ).count() == 1


def test_double_quoted_identifiers_with_spark_dialect_flag(spark):
    # DuckDB-style "quoted identifier" views work once Spark's own
    # dialect switch is on (LIMITATIONS.md §9)
    from yardstick_spark import MeasureSession
    from yardstick_spark.sources import register_parquet_dir

    saved = spark.conf.get("spark.sql.ansi.doubleQuotedIdentifiers", "false")
    spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    try:
        register_parquet_dir(spark, "/root/testdata/sf0.001", ["lineitem"])
        ys = MeasureSession(spark)
        ys.collect_warnings = False
        ys.sql(
            'CREATE OR REPLACE VIEW v_dq AS SELECT l_returnflag AS '
            '"flag col", SUM(l_extendedprice) AS MEASURE rev FROM lineitem'
        )
        rows = ys.sql(
            'SELECT "flag col", ROUND(AGGREGATE(rev), 2) AS r, '
            'ROUND(AGGREGATE(rev) AT (ALL), 2) AS t '
            'FROM v_dq GROUP BY "flag col"'
        ).collect()
        assert len(rows) == 3
        assert len({r["t"] for r in rows}) == 1
    finally:
        spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", saved)


def test_qualify_clause_rewrites_to_spark(spark):
    # DuckDB QUALIFY has no Spark counterpart; the compat layer wraps
    # the select and filters on the projected window predicate
    import yardstick_spark as yp

    ys = yp.connect(spark)
    spark.range(10).selectExpr(
        "id", "id % 2 AS grp"
    ).createOrReplaceTempView("q_t")
    rows = ys.sql(
        "SELECT grp, id FROM q_t "
        "QUALIFY row_number() OVER (PARTITION BY grp ORDER BY id DESC) = 1 "
        "ORDER BY grp"
    ).collect()
    assert [(r["grp"], r["id"]) for r in rows] == [(0, 8), (1, 9)]
    # nested subquery QUALIFY + DISTINCT motion
    rows = ys.sql(
        "SELECT DISTINCT grp FROM ("
        "SELECT grp, id FROM q_t "
        "QUALIFY rank() OVER (ORDER BY id) <= 4) ORDER BY grp"
    ).collect()
    assert [r["grp"] for r in rows] == [0, 1]
    # QUALIFY on a measure query (expansion then compat rewrite)
    ys2 = yp.connect(spark)
    ys2.sql("CREATE OR REPLACE VIEW qm2 AS SELECT grp, "
            "SUM(id) AS MEASURE s FROM q_t")
    rows = ys2.sql(
        "SELECT grp, AGGREGATE(s) AS s FROM qm2 GROUP BY grp "
        "QUALIFY row_number() OVER (ORDER BY s DESC) = 1"
    ).collect()
    assert [(r["grp"], r["s"]) for r in rows] == [(1, 25)]


def test_qualify_named_window_refs(spark):
    # QUALIFY referencing a named window from the WINDOW clause: the
    # spec is inlined into the wrapper predicate, and the retained
    # inner WINDOW clause is rewritten self-contained (Spark lacks
    # DuckDB's `w2 AS (w1 ORDER BY x)` inheritance grammar)
    import yardstick_spark as yp

    ys = yp.connect(spark)
    spark.sql("CREATE OR REPLACE TEMP VIEW qw_t AS SELECT * FROM VALUES "
              "(1,10),(1,20),(2,5),(2,9),(2,7) AS t(grp, id)")
    rows = ys.sql(
        "SELECT grp, id, rank() OVER w AS r FROM qw_t "
        "WINDOW w AS (PARTITION BY grp ORDER BY id DESC) "
        "QUALIFY row_number() OVER w = 1 ORDER BY grp"
    ).collect()
    assert [(r["grp"], r["id"], r["r"]) for r in rows] == [
        (1, 20, 1), (2, 9, 1)]
    # window inheritance expanded on both the predicate and inner scope
    rows = ys.sql(
        "SELECT grp, id FROM qw_t WINDOW w1 AS (PARTITION BY grp), "
        "w2 AS (w1 ORDER BY id) QUALIFY rank() OVER w2 <= 2"
    ).collect()
    assert sorted((r["grp"], r["id"]) for r in rows) == [
        (1, 10), (1, 20), (2, 5), (2, 7)]
    # QUALIFY written before the WINDOW clause (DuckDB accepts both
    # orders): the clause relocates into the inner select
    rows = ys.sql(
        "SELECT grp, id FROM qw_t QUALIFY row_number() OVER w = 1 "
        "WINDOW w AS (PARTITION BY grp ORDER BY id)"
    ).collect()
    assert sorted((r["grp"], r["id"]) for r in rows) == [(1, 10), (2, 5)]


def test_duckdb_star_replace(spark):
    # DuckDB `* REPLACE (expr AS col)` → `* EXCEPT (col), expr AS col`
    # (value-identical; replaced columns append after the star)
    import yardstick_spark as yp

    ys = yp.connect(spark)
    spark.sql("CREATE OR REPLACE TEMP VIEW sr_t AS SELECT * FROM VALUES "
              "(1, 'X', 5.0), (2, 'Y', 7.0) AS t(id, nm, v)")
    rows = ys.sql(
        "SELECT * REPLACE (v * 2 AS v) FROM sr_t ORDER BY id").collect()
    assert [(r["id"], r["nm"], r["v"]) for r in rows] == [
        (1, "X", 10.0), (2, "Y", 14.0)]
    # multi-item, qualified star, and the function form left alone
    rows = ys.sql(
        "SELECT t.* REPLACE (lower(nm) AS nm, v + 1 AS v) "
        "FROM sr_t AS t WHERE id = 2").collect()
    assert (rows[0]["nm"], rows[0]["v"]) == ("y", 8.0)
    rows = ys.sql("SELECT REPLACE(nm, 'X', 'Z') AS r FROM sr_t "
                  "ORDER BY id").collect()
    assert [r["r"] for r in rows] == ["Z", "Y"]
    # CREATE OR REPLACE statements pass through untouched
    ys.sql("CREATE OR REPLACE TEMP VIEW sr_v AS SELECT id FROM sr_t")
    assert spark.table("sr_v").count() == 2


def test_duckdb_star_exclude_and_sample(spark):
    import yardstick_spark as yp

    ys = yp.connect(spark)
    spark.range(10).selectExpr(
        "id", "id % 2 AS g", "id * 2 AS v"
    ).createOrReplaceTempView("ex_t")
    rows = ys.sql("SELECT * EXCLUDE (g, v) FROM ex_t ORDER BY id").collect()
    assert [r.asDict() for r in rows[:2]] == [{"id": 0}, {"id": 1}]
    # the word in a string literal or identifier must survive
    rows = ys.sql("SELECT 'EXCLUDE' AS w, id FROM ex_t LIMIT 1").collect()
    assert rows[0]["w"] == "EXCLUDE"
    # USING SAMPLE forms parse and bound the row count
    assert ys.sql("SELECT id FROM ex_t USING SAMPLE 3 ROWS").count() == 3
    assert ys.sql("SELECT id FROM ex_t USING SAMPLE 100%").count() == 10


def test_catalog_sidecar_roundtrip_new_session(spark, tmp_path):
    # a brand-new wrapper session (fresh catalog, fresh temp-view
    # namespace via spark.newSession) must be able to reload persisted
    # measure views and answer AGGREGATE() queries — the reference gets
    # this for free from its .db-file catalog (measures.rs:56-57)
    import yardstick_spark as yp

    ys = yp.connect(spark)
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
        .createOrReplaceTempView("li_persist")
    ys.sql("CREATE OR REPLACE VIEW li_pm AS SELECT l_returnflag, "
           "SUM(l_extendedprice * (1 - l_discount)) AS MEASURE rev, "
           "COUNT(*) AS MEASURE n FROM li_persist")
    want = sorted(map(tuple, ys.sql(
        "SELECT l_returnflag, ROUND(AGGREGATE(rev), 2) AS r, "
        "AGGREGATE(n) AS n FROM li_pm GROUP BY l_returnflag"
    ).collect()))
    path = str(tmp_path / "catalog.json")
    ys.save_catalog(path)

    s2 = spark.newSession()
    s2.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
        .createOrReplaceTempView("li_persist")
    ys2 = yp.connect(s2)
    assert ys2.catalog.views == {}
    n = ys2.load_catalog(path)
    assert n == 1
    got = sorted(map(tuple, ys2.sql(
        "SELECT l_returnflag, ROUND(AGGREGATE(rev), 2) AS r, "
        "AGGREGATE(n) AS n FROM li_pm GROUP BY l_returnflag"
    ).collect()))
    assert got == want and got


def test_catalog_dict_roundtrip_excludes_temps():
    from yardstick_spark.catalog import (
        MeasureCatalog, MeasureView, ViewMeasure,
    )

    cat = MeasureCatalog()
    perm = MeasureView(
        view_name="v1",
        measures=[ViewMeasure("rev", "SUM(x)", True),
                  ViewMeasure("ratio", "rev / n", False)],
        base_query="SELECT * FROM t",
        base_table="t",
        base_relation_sql="SELECT * FROM t",
        dimension_exprs={"y": "YEAR(d)"},
        group_by_cols=[],
    )
    temp = MeasureView(
        view_name="tmp1", measures=[ViewMeasure("m", "SUM(z)", True)],
        base_query="SELECT * FROM z", base_table="z",
        base_relation_sql=None, dimension_exprs={}, group_by_cols=[],
        is_temp=True,
    )
    cat.register(perm)
    cat.register(temp)
    back = MeasureCatalog.from_dict(cat.to_dict())
    assert set(back.views) == {"v1"}  # temps don't persist
    assert back.views["v1"] == perm
