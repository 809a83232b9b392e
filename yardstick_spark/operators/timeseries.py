"""Time-series gap filling with last-observation-carried-forward.

The TimescaleDB `time_bucket_gapfill` + `locf` shape: a daily (or any
fixed-step) series per key must contain EVERY bucket between the
key's first and last observation, with missing buckets either
zero-filled (additive measures like counts) or carried forward
(level measures like balances).  Downstream window math (moving
averages, deltas) silently breaks on missing rows, so this runs right
after rollup in any metrics pipeline.

Scale shape: the calendar spine is `sequence()` + explode per key —
O(keys x buckets) rows, which is the OUTPUT size, not overhead; the
actuals join is a uniform (key, bucket) equi-join; LOCF is one
`last(value, ignoreNulls)` running window per key — a single shuffle
by key, ordered within partitions.  Nothing is quadratic and nothing
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def gap_fill_daily(df: DataFrame, key_cols: list[str], day_col: str,
                   zero_cols: list[str] | None = None,
                   locf_cols: list[str] | None = None) -> DataFrame:
    """Fill every missing day between each key's first and last
    observed day.  ``zero_cols`` fill gaps with 0 (additive measures);
    ``locf_cols`` carry the last observed value forward (levels).
    ``day_col`` must be a DATE column; output adds ``is_filled``.
    """
    zero_cols = zero_cols or []
    locf_cols = locf_cols or []
    spine = (df.groupBy(*key_cols)
             .agg(F.min(day_col).alias("__d0"),
                  F.max(day_col).alias("__d1"))
             .select(*key_cols,
                     F.explode(F.expr(
                         "sequence(__d0, __d1, interval 1 day)"))
                     .alias(day_col)))
    actual = df.select(*[F.col(k).alias(f"__a_{k}") for k in key_cols],
                       F.col(day_col).alias("__a_day"),
                       *zero_cols, *locf_cols,
                       F.lit(False).alias("is_filled"))
    # null-safe key equality: a NULL-keyed series is one series (its
    # spine comes from the same NULL group), so its actual rows must
    # rejoin rather than every day looking like a gap
    cond = F.col(day_col) == F.col("__a_day")
    for k in key_cols:
        cond = cond & F.col(k).eqNullSafe(F.col(f"__a_{k}"))
    joined = (spine.join(actual, cond, "left")
              .drop("__a_day", *[f"__a_{k}" for k in key_cols]))
    w = (Window.partitionBy(*key_cols).orderBy(day_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    out = joined.select(
        *key_cols, day_col,
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in zero_cols],
        *[F.last(c, ignorenulls=True).over(w).alias(c)
          for c in locf_cols],
        F.coalesce(F.col("is_filled"), F.lit(True)).alias("is_filled"))
    return out
