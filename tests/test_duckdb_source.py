"""DuckDB-database source: driver Arrow read and partitioned
mapInPandas range scan must both round-trip table contents exactly."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pytest


@pytest.fixture(scope="module")
def duck_file():
    path = os.path.join(tempfile.mkdtemp(prefix="ys_duck_"), "t.duckdb")
    con = duckdb.connect(path)
    con.execute(
        "CREATE TABLE items AS "
        "SELECT i AS item_id, i % 7 AS grp, "
        "CAST(i AS DOUBLE) / 3 AS val, 'name_' || i AS name "
        "FROM range(0, 1000) AS t(i)"
    )
    con.execute("CREATE TABLE empty_t (x BIGINT, y VARCHAR)")
    con.close()
    return path


def test_read_duckdb_driver(spark, duck_file):
    from yardstick_spark.sources import read_duckdb

    df = read_duckdb(spark, duck_file,
                     "SELECT grp, COUNT(*) AS n, SUM(val) AS s "
                     "FROM items GROUP BY grp")
    rows = {r["grp"]: (r["n"], round(r["s"], 4)) for r in df.collect()}
    con = duckdb.connect(duck_file, read_only=True)
    want = {g: (n, round(s, 4)) for g, n, s in con.execute(
        "SELECT grp, COUNT(*), SUM(val) FROM items GROUP BY grp"
    ).fetchall()}
    con.close()
    assert rows == want


def test_read_duckdb_partitioned_roundtrip(spark, duck_file):
    from yardstick_spark.sources import read_duckdb_partitioned

    df = read_duckdb_partitioned(spark, duck_file, "items", "item_id",
                                 num_partitions=8)
    assert df.rdd.getNumPartitions() == 8
    got = sorted((r["item_id"], r["grp"], r["name"]) for r in df.collect())
    assert len(got) == 1000
    assert got[0] == (0, 0, "name_0") and got[-1] == (999, 999 % 7, "name_999")
    # every range read exactly once — no dup/drop at the boundaries
    assert len({i for i, _, _ in got}) == 1000


def test_read_duckdb_partitioned_empty(spark, duck_file):
    from yardstick_spark.sources import read_duckdb_partitioned

    df = read_duckdb_partitioned(spark, duck_file, "empty_t", "x")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["x", "y"]


def test_read_duckdb_nullable_bigint_exact(spark, duck_file):
    # nullable BIGINT > 2^53 must not round-trip through float64
    # (pandas NaN-widening would silently round it)
    from yardstick_spark.sources import read_duckdb

    big = (1 << 53) + 1
    df = read_duckdb(
        spark, ":memory:",
        f"SELECT * FROM (VALUES (1, {big}), (2, NULL)) AS t(id, v)",
    )
    rows = {r["id"]: r["v"] for r in df.collect()}
    assert rows[1] == big and rows[2] is None
    assert dict(df.dtypes)["v"] == "bigint"


def test_read_duckdb_partitioned_rejects_non_integer_col(spark, duck_file):
    from yardstick_spark.sources import read_duckdb_partitioned

    with pytest.raises(TypeError, match="integer-typed"):
        read_duckdb_partitioned(spark, duck_file, "items", "name")


def test_write_duckdb_roundtrip(spark, tmp_path):
    from yardstick_spark.sources import read_duckdb, write_duckdb

    db = str(tmp_path / "out.duckdb")
    big = (1 << 53) + 1
    df = spark.createDataFrame(
        [(1, "a", 1.5, big), (2, "b", None, None)],
        "id bigint, name string, score double, big bigint",
    )
    assert write_duckdb(df, db, "results") == 2
    back = read_duckdb(spark, db, "SELECT * FROM results ORDER BY id")
    rows = back.collect()
    assert [r["id"] for r in rows] == [1, 2]
    assert rows[0]["big"] == big and rows[1]["big"] is None

    # append mode accumulates; overwrite replaces
    write_duckdb(df, db, "results", mode="append")
    assert read_duckdb(spark, db, "SELECT COUNT(*) AS n FROM results") \
        .first()["n"] == 4
    write_duckdb(df, db, "results", mode="overwrite")
    assert read_duckdb(spark, db, "SELECT COUNT(*) AS n FROM results") \
        .first()["n"] == 2


def test_write_duckdb_quoted_identifier(spark, tmp_path):
    from yardstick_spark.sources import read_duckdb, write_duckdb

    db = str(tmp_path / "q.duckdb")
    df = spark.createDataFrame([(1,)], "x bigint")
    write_duckdb(df, db, 'odd "name"')
    assert read_duckdb(
        spark, db, 'SELECT COUNT(*) AS n FROM "odd ""name"""'
    ).first()["n"] == 1


def test_write_duckdb_schema_qualified_and_by_name_append(spark, tmp_path):
    import duckdb

    from yardstick_spark.sources import read_duckdb, write_duckdb

    db = str(tmp_path / "s.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE SCHEMA staging")
    con.close()
    df = spark.createDataFrame([(1, "a")], "id bigint, name string")
    write_duckdb(df, db, "staging.results")
    assert read_duckdb(
        spark, db, 'SELECT COUNT(*) AS n FROM staging.results'
    ).first()["n"] == 1
    # append with swapped column order must bind BY NAME, not position
    swapped = spark.createDataFrame([("b", 2)], "name string, id bigint")
    write_duckdb(swapped, db, "staging.results", mode="append")
    rows = read_duckdb(
        spark, db, "SELECT id, name FROM staging.results ORDER BY id"
    ).collect()
    assert [(r["id"], r["name"]) for r in rows] == [(1, "a"), (2, "b")]


def test_write_duckdb_rejects_bad_mode_before_collect(spark, tmp_path):
    import pytest as _pytest

    from yardstick_spark.sources import write_duckdb

    df = spark.createDataFrame([(1,)], "x bigint")
    with _pytest.raises(ValueError, match="unsupported mode"):
        write_duckdb(df, str(tmp_path / "m.duckdb"), "t", mode="upsert")


def test_read_with_rejects_routes_bad_lines(spark, tmp_path):
    from pyspark.sql import types as T

    from yardstick_spark.sources import read_with_rejects

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "txt": "ok"}\n'
        'this is not json\n'
        '{"id": 2, "txt": "also ok"}\n'
        '{"id": "NaN-ish", "txt": 3}\n'   # type mismatch vs contract
        '{broken\n'
    )
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("txt", T.StringType()),
    ])
    good, bad = read_with_rejects(spark, str(p), fmt="json", schema=schema)
    grows = sorted((r["id"], r["txt"]) for r in good.collect())
    brows = sorted(r["raw_record"] for r in bad.collect())
    # every input line is accounted for exactly once
    assert grows == [(1, "ok"), (2, "also ok")]
    assert len(brows) == 3
    assert any("not json" in b for b in brows)
    assert any("NaN-ish" in b for b in brows)
    good.unpersist()
    # csv form
    c = tmp_path / "in.csv"
    c.write_text("1,aa\n2,bb\nxx,cc,extra,cols\n3,dd\n")
    cschema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("txt", T.StringType()),
    ])
    good, bad = read_with_rejects(spark, str(c), fmt="csv", schema=cschema)
    assert sorted((r["id"], r["txt"]) for r in good.collect()) == [
        (1, "aa"), (2, "bb"), (3, "dd")]
    assert bad.count() == 1
    good.unpersist()
