"""Sinks: partitioned and bucketed parquet writers.

Partitioning prunes at read time (directory-level predicate pushdown);
bucketing pre-shuffles by join/agg keys so later equi-joins and groupBys
on the bucket columns skip the exchange entirely — the co-located-join
strategy for repeated large-table joins at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """Directory-partitioned parquet; readers prune partitions on
    `partition_cols` predicates without touching data files."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 32, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed managed table (bucketing requires saveAsTable).  Joins
    and aggregations keyed on `bucket_cols` between tables with the same
    bucketing skip the shuffle (SortMergeJoin without Exchange)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
