"""Data-quality profiling: the look-before-you-load operators every
pipeline runs against a new 100 TB delivery before trusting it.

Both operators are single-scan by construction: `profile_table`
computes every column's metrics in ONE aggregation (Spark plans the
multi-column count-distincts via expand — still one pass over the
parquet), and `numeric_histogram` takes explicit bounds so bucketing
needs no separate min/max pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None
                  ) -> DataFrame:
    """Long-format column profile: one row per (column, metric) with
    the value rendered as a string (profiles are heterogeneous; a
    typed wide row per column would need a schema per table).

    Metrics per column: n_rows (table-wide), n_null, n_distinct
    (exact), min, max.  One aggregation — a single scan regardless of
    column count — then a stack() unpivot of the 1-row result, which
    is driver-trivial.  NULL min/max (all-null column) renders as the
    string 'NULL' so the row set is total."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .alias(f"__null_{c}"),
            F.countDistinct(c).alias(f"__dist_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    pieces = []
    for c in cols:
        pieces.append(
            f"'{c}', 'n_rows', CAST(__n AS STRING), "
            f"'{c}', 'n_null', CAST(__null_{c} AS STRING), "
            f"'{c}', 'n_distinct', CAST(__dist_{c} AS STRING), "
            f"'{c}', 'min', COALESCE(__min_{c}, 'NULL'), "
            f"'{c}', 'max', COALESCE(__max_{c}, 'NULL')"
        )
    n = 5 * len(cols)
    stack = (f"stack({n}, " + ", ".join(pieces)
             + ") AS (column_name, metric, value)")
    return one.select(F.expr(stack))


def numeric_histogram(df: DataFrame, col: str, bins: int,
                      lo: float, hi: float) -> DataFrame:
    """Equi-width histogram over [lo, hi): one row per OCCUPIED bucket
    with its bounds and count.  Bounds are explicit parameters (not a
    min/max pre-pass) so the operator is one scan + one tiny
    aggregation at any size; values at exactly `hi` fold into the last
    bucket (the standard closed-right-edge rule), values outside
    [lo, hi] are clamped into the edge buckets so the histogram is
    total over non-null rows."""
    if bins <= 0 or not lo < hi:
        raise ValueError("numeric_histogram: need bins > 0 and lo < hi")
    width = (hi - lo) / bins
    bucket = (f"CAST(least({bins - 1}, greatest(0, "
              f"floor(({col} - {lo!r}) / {width!r}))) AS INT)")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.expr(bucket).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            F.expr(f"round({lo!r} + bucket * {width!r}, 6)").alias("lo"),
            F.expr(f"round({lo!r} + (bucket + 1) * {width!r}, 6)")
            .alias("hi"),
            "n",
        )
    )
