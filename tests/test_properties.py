"""Property-based invariants of measure semantics (hypothesis).

Rather than mirroring the rewriter in the oracle, these assert
identities that hold BY DEFINITION of the paper semantics on randomized
data:

  P1  AT (ALL) equals the sum of per-group values (decomposable SUM)
  P2  AT (ALL d) equals the sum of group values sharing the other dims
  P3  AT (VISIBLE) equals the plain AGGREGATE under any WHERE
  P4  joining an arbitrary N-side table never changes measure values
      (fan-out immunity)
  P5  the combinator API compiles to the same result as hand-written SQL
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=2020, max_value=2023),           # year
        st.sampled_from(["US", "EU", "APAC"]),                 # region
        st.integers(min_value=-50, max_value=100),             # amount
    ),
    min_size=1,
    max_size=24,
)


def _mk_view(ys, rows, tag):
    spark = ys.spark
    vals = ", ".join(
        f"({y}, '{r}', CAST({a} AS DOUBLE))" for y, r, a in rows
    )
    spark.sql(
        f"CREATE OR REPLACE TEMP VIEW prop_sales_{tag} AS "
        f"SELECT year, region, amount FROM VALUES {vals} "
        f"AS t(year, region, amount)"
    )
    ys.sql(
        f"CREATE OR REPLACE VIEW prop_v_{tag} AS SELECT year, region, "
        f"SUM(amount) AS MEASURE revenue FROM prop_sales_{tag}"
    )
    return f"prop_v_{tag}"


@pytest.fixture(scope="module")
def pys(spark):
    from yardstick_spark import MeasureSession

    ys = MeasureSession(spark)
    ys.collect_warnings = False
    return ys


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ROWS)
def test_p1_all_equals_group_sum(pys, rows):
    v = _mk_view(pys, rows, "p1")
    got = pys.sql(
        f"SELECT year, AGGREGATE(revenue) AS r, "
        f"AGGREGATE(revenue) AT (ALL) AS t FROM {v} GROUP BY year"
    ).collect()
    total = sum(r["r"] for r in got if r["r"] is not None)
    for r in got:
        assert math.isclose(r["t"], total, rel_tol=1e-9)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ROWS)
def test_p2_all_dim_equals_partial_sum(pys, rows):
    v = _mk_view(pys, rows, "p2")
    got = pys.sql(
        f"SELECT year, region, AGGREGATE(revenue) AS r, "
        f"AGGREGATE(revenue) AT (ALL region) AS yt FROM {v} "
        f"GROUP BY year, region"
    ).collect()
    by_year: dict = {}
    for r in got:
        by_year.setdefault(r["year"], 0.0)
        by_year[r["year"]] += r["r"]
    for r in got:
        assert math.isclose(r["yt"], by_year[r["year"]], rel_tol=1e-9)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ROWS, cutoff=st.integers(min_value=2020, max_value=2023))
def test_p3_visible_equals_plain_under_where(pys, rows, cutoff):
    v = _mk_view(pys, rows, "p3")
    got = pys.sql(
        f"SELECT region, AGGREGATE(revenue) AS r, "
        f"AGGREGATE(revenue) AT (VISIBLE) AS vis FROM {v} "
        f"WHERE year >= {cutoff} GROUP BY region"
    ).collect()
    for r in got:
        assert r["vis"] == r["r"]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ROWS, fanout=st.integers(min_value=1, max_value=4))
def test_p4_fanout_immunity(pys, rows, fanout):
    v = _mk_view(pys, rows, "p4")
    spark = pys.spark
    years = sorted({y for y, _, _ in rows})
    dup_vals = ", ".join(
        f"({y}, {i})" for y in years for i in range(fanout)
    )
    spark.sql(
        f"CREATE OR REPLACE TEMP VIEW prop_side_p4 AS "
        f"SELECT year, k FROM VALUES {dup_vals} AS t(year, k)"
    )
    base = {
        (r["year"],): r["r"]
        for r in pys.sql(
            f"SELECT year, AGGREGATE(revenue) AS r FROM {v} GROUP BY year"
        ).collect()
    }
    joined = pys.sql(
        f"SELECT v.year, AGGREGATE(revenue) AS r FROM {v} v "
        f"JOIN prop_side_p4 s ON v.year = s.year GROUP BY v.year"
    ).collect()
    for r in joined:
        assert math.isclose(r["r"], base[(r["year"],)], rel_tol=1e-9), (
            f"fan-out x{fanout} changed the measure"
        )


def test_p5_combinator_api_matches_sql(pys, spark):
    from yardstick_spark import measure

    v = _mk_view(pys, [(2022, "US", 10), (2022, "EU", 5),
                       (2023, "US", 20)], "p5")
    api_df = (
        pys.query(v)
        .group_by("year")
        .select(
            measure("revenue").round(2).alias("rev"),
            measure("revenue").at(all_=True).round(2).alias("total"),
            measure("revenue").at(set_={"year": "year - 1"})
            .alias("prev"),
        )
        .to_df()
    )
    sql_df = pys.sql(
        f"SELECT year, ROUND(AGGREGATE(revenue), 2) AS rev, "
        f"ROUND(AGGREGATE(revenue) AT (ALL), 2) AS total, "
        f"AGGREGATE(revenue) AT (SET year = year - 1) AS prev "
        f"FROM {v} GROUP BY year"
    )
    assert sorted(map(tuple, api_df.collect())) == sorted(
        map(tuple, sql_df.collect())
    )
