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


def write_sorted(df: DataFrame, path: str, sort_cols: list[str],
                 mode: str = "overwrite",
                 target_files: int | None = None) -> None:
    """Range-sorted parquet layout: repartitionByRange on `sort_cols`
    (each output file covers a disjoint key range) + sortWithinPartitions
    (rows ordered inside each file), so every parquet row group carries
    tight min/max statistics on the sort keys.  Point/range predicates
    on those keys then skip whole files AND row groups at scan time —
    the third leg of the layout toolkit next to directory partitioning
    (low-cardinality keys) and bucketing (join keys): use range-sorting
    for high-cardinality range-filtered keys (timestamps, ids).

    One shuffle at write time buys every subsequent read's skipping;
    `target_files` caps output file count (defaults to the session's
    shuffle parallelism)."""
    cols = [df[c] for c in sort_cols]
    part = (df.repartitionByRange(target_files, *cols) if target_files
            else df.repartitionByRange(*cols))
    part.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)
