"""DuckDB database source: read DuckDB tables/queries into Spark.

`BASELINE.json` declared "DuckDB read via JDBC" as part of the original
plan; a pure-Python deployment has no JDBC jar, so this module provides
the same capability through DuckDB's Arrow surface instead:

- `read_duckdb(spark, db, query)` — run one query on the driver, ship
  the Arrow result into a DataFrame.  Right for catalog/dimension-sized
  results (the driver holds one copy).
- `read_duckdb_partitioned(spark, db, table, partition_col, n)` — scan
  a big table in parallel: the driver fetches only min/max of the
  partition column, then each Spark task opens the database file
  READ-ONLY and pulls its half-open id range via Arrow batches inside
  `mapInPandas`.  This is the same range-splitting contract Spark's
  JDBC source uses (partitionColumn/lowerBound/upperBound/numPartitions),
  so it scales exactly as far: n concurrent readers against one file,
  work split by key range.  The database file must be reachable from
  every executor (shared FS) — true in local mode and on clusters with
  a mounted artifact store.

Reference parity: the reference is itself a DuckDB extension, so "read
the user's existing DuckDB database" is the natural migration path for
its users (`/root/reference/README.md:25-45` quick start operates on
DuckDB tables).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession


def _arrow_to_spark(spark: SparkSession, tbl) -> DataFrame:
    # hand the Arrow table to Spark directly (Spark 4 accepts
    # pyarrow.Table): no pandas hop, so nullable BIGINT columns never
    # pass through float64 (which silently rounds values > 2^53)
    try:
        return spark.createDataFrame(tbl)
    except Exception:  # noqa: BLE001 — older API: explicit schema + pandas
        import pandas as _pd

        from pyspark.sql.pandas.types import from_arrow_schema

        schema = from_arrow_schema(tbl.schema)
        # ArrowDtype keeps nullable ints exact (no float64 widening)
        return spark.createDataFrame(
            tbl.to_pandas(types_mapper=_pd.ArrowDtype), schema=schema)


def read_duckdb(spark: SparkSession, db: str, query: str) -> DataFrame:
    """Run `query` against the DuckDB database at `db` (a file path, or
    ':memory:' for scratch SQL) and return the result as a DataFrame.
    Driver-side materialization — use for small/medium results."""
    import duckdb

    con = duckdb.connect(db, read_only=db != ":memory:")
    try:
        return _arrow_to_spark(spark, con.execute(query).arrow())
    finally:
        con.close()


def read_duckdb_partitioned(spark: SparkSession, db: str, table: str,
                            partition_col: str,
                            num_partitions: int = 16) -> DataFrame:
    """Parallel scan of `table`: split `partition_col`'s [min, max] into
    `num_partitions` half-open ranges, one DuckDB range query per Spark
    task via mapInPandas (Arrow batches end to end)."""
    import duckdb

    import pandas as pd

    # quote identifiers so names with spaces/quotes can't break the
    # query or smuggle SQL in
    def q(ident: str) -> str:
        return '"' + ident.replace('"', '""') + '"'

    tbl_q = ".".join(q(part) for part in table.split("."))
    col_q = q(partition_col)

    con = duckdb.connect(db, read_only=True)
    try:
        schema_tbl = con.execute(
            f"SELECT * FROM {tbl_q} LIMIT 0"
        ).arrow()
        import pyarrow.types as pat

        field = schema_tbl.schema.field(partition_col)
        if not pat.is_integer(field.type):
            raise TypeError(
                f"partition_col {partition_col!r} must be integer-typed "
                f"for range splitting, got {field.type}"
            )
        lo, hi = con.execute(
            f"SELECT MIN({col_q}), MAX({col_q}) FROM {tbl_q}"
        ).fetchone()
    finally:
        con.close()
    empty = _arrow_to_spark(spark, schema_tbl)
    if lo is None:
        return empty
    lo, hi = int(lo), int(hi)
    n = max(1, min(num_partitions, hi - lo + 1))
    step = (hi - lo + 1 + n - 1) // n
    bounds = [(lo + i * step, lo + (i + 1) * step) for i in range(n)]
    ranges = spark.createDataFrame(bounds, "lo bigint, hi bigint").repartition(n)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = duckdb.connect(db, read_only=True)
        try:
            for b in batches:
                for _, r in b.iterrows():
                    out = c.execute(
                        f"SELECT * FROM {tbl_q} "
                        f"WHERE {col_q} >= ? AND {col_q} < ?",
                        [int(r.lo), int(r.hi)],
                    ).df()
                    if len(out):
                        yield out
        finally:
            c.close()

    return ranges.mapInPandas(scan, schema=empty.schema)


def write_duckdb(df: DataFrame, db: str, table: str,
                 mode: str = "overwrite") -> int:
    """Write a DataFrame into a DuckDB table — the reference's native
    CTAS target, so a migrating user can round-trip results back into
    their existing database file.

    DuckDB is single-writer: the write necessarily funnels through one
    driver-side connection, so this is for dimension- and result-sized
    tables (aggregates, dedup verdicts, curation reports — the shapes a
    measure engine emits).  For corpus-sized data write parquet with
    `write_partitioned` and ATTACH it from DuckDB instead; this
    function intentionally has no distributed path to pretend
    otherwise.  Arrow end to end (no pandas hop), so nullable BIGINT
    survives exactly.  Returns the row count written."""
    import duckdb

    if mode not in ("overwrite", "append"):
        # validate BEFORE the Spark job runs — a bad mode must not cost
        # a full collect first
        raise ValueError(f"unsupported mode: {mode!r}")
    try:
        arrow_tbl = df.toArrow()
    except AttributeError:
        # no silent pandas fallback: toPandas() widens nullable BIGINT
        # through float64 (NULL->NaN, >2^53 rounds) — the exact
        # corruption the read path exists to avoid
        raise RuntimeError(
            "write_duckdb needs DataFrame.toArrow() (Spark >= 4.0); "
            "on older Spark export via parquet and ATTACH instead"
        ) from None
    # quote schema-qualified names part-by-part, same contract as the
    # read path ('main.results' -> "main"."results")
    qident = ".".join(
        '"' + part.replace('"', '""') + '"' for part in table.split(".")
    )
    con = duckdb.connect(db)
    try:
        con.register("__ys_write_src", arrow_tbl)
        if mode == "overwrite":
            con.execute(
                f"CREATE OR REPLACE TABLE {qident} AS "
                "SELECT * FROM __ys_write_src"
            )
        else:  # append — BY NAME so a column-order mismatch with the
            # existing table binds correctly instead of positionally
            con.execute(
                f"CREATE TABLE IF NOT EXISTS {qident} AS "
                "SELECT * FROM __ys_write_src WHERE 1=0"
            )
            con.execute(
                f"INSERT INTO {qident} BY NAME SELECT * FROM __ys_write_src"
            )
        con.unregister("__ys_write_src")
        return arrow_tbl.num_rows
    finally:
        con.close()
