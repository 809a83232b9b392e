"""Parquet/CSV/JSON source registration.

Handles the TIMESTAMP(NANOS) parquet quirk: Spark's vectorized reader
rejects INT64 nanos; we read them as long (spark.sql.legacy.parquet
.nanosAsLong) and convert to TIMESTAMP via integer division — a cast
that stays in whole-stage codegen.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

_TS_NANO_COLS = {"events": ["ts"]}


def read_table(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read one table, converting any long-read nano-timestamp columns."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    df = getattr(reader, fmt)(path)
    name = Path(path).stem
    dtypes = dict(df.dtypes)
    for col in _TS_NANO_COLS.get(name, []):
        if dtypes.get(col) == "bigint":
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def register_parquet_dir(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Register every `<sf_dir>/<name>.parquet` as a temp view `<name>`.
    Returns the registered names."""
    registered: list[str] = []
    paths = (
        [Path(sf_dir) / f"{t}.parquet" for t in tables]
        if tables
        else sorted(Path(sf_dir).glob("*.parquet"))
    )
    for p in paths:
        if not p.exists():
            continue
        read_table(spark, str(p)).createOrReplaceTempView(p.stem)
        registered.append(p.stem)
    return registered


def read_with_rejects(spark: SparkSession, path: str, fmt: str = "json",
                      schema=None, **options
                      ) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE ingest that ROUTES malformed records instead of
    silently nulling them — the reject-file contract every bulk loader
    needs: returns (good, bad) where `good` has the declared schema
    and `bad` is (raw_record) for quarantine/replay.

    A 100 TB crawl delivery always contains broken lines; FAILFAST
    kills the whole job on the first one and plain PERMISSIVE leaves
    silent NULL rows, so routing is the only shape that both finishes
    and accounts for every input line.  Works for `json` (JSONL) and
    `csv`.  If `schema` is omitted it is inferred in a separate pass
    (fine interactively; production jobs should pass the contract
    schema explicitly — inference over rejects-bearing data can widen
    types).

    The returned frames share ONE cached read: Spark's parsers drop
    the corrupt-record column unless it is materialized before being
    filtered on (the documented `columnNameOfCorruptRecord` caveat),
    and the cache also means good+bad together cost a single scan.
    Call `good.unpersist()` when done with both."""
    from pyspark.sql import types as T

    corrupt = "__ys_corrupt"
    if schema is None:
        base = getattr(spark.read.options(**options), fmt)(path)
        schema = base.schema
    if not any(f.name == corrupt for f in schema.fields):
        schema = T.StructType(
            list(schema.fields) + [T.StructField(corrupt, T.StringType())]
        )
    reader = (spark.read.schema(schema)
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", corrupt)
              .options(**options))
    df = getattr(reader, fmt)(path).cache()
    good = (df.filter(F.col(corrupt).isNull())
            .drop(corrupt))
    bad = (df.filter(F.col(corrupt).isNotNull())
           .select(F.col(corrupt).alias("raw_record")))
    return good, bad
