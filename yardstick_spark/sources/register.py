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
