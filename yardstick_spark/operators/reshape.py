"""Reshape operators — pivot (long → wide) and unpivot (wide → long).

Reference parity: the reference engine exposes DuckDB's PIVOT/UNPIVOT
surface (duckdb PIVOT docs; the SLT corpus exercises conditional
aggregation shapes).  Spark-first design:

* `pivot_table` uses `RelationalGroupedDataset.pivot` **with an
  explicit value list**.  Without one Spark runs an extra distinct-scan
  job to discover the pivot values — at 100 TB that is a full scan you
  didn't ask for, and the resulting column set is non-deterministic in
  the presence of dirty keys.  With the list, the plan is a single
  hash-aggregate shuffle on the group key (pivot columns are just
  conditional aggregates — no extra shuffle vs a plain groupBy).
* `unpivot` uses the native `DataFrame.unpivot` (Spark ≥ 3.4), which
  expands rows map-side (an `Expand` node) — no shuffle, no explode of
  an intermediate array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def pivot_table(
    df: DataFrame,
    group_cols: list[str],
    pivot_col: str,
    values: list,
    agg: Column,
) -> DataFrame:
    """Wide conditional-aggregate table: one row per `group_cols`, one
    column per entry of `values` holding `agg` over the matching rows.

    `values` is required (not discovered) — see module docstring.
    """
    return df.groupBy(*group_cols).pivot(pivot_col, values).agg(agg)


def unpivot(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long: one output row per (input row, value column).

    Maps to Spark's native `unpivot` (an Expand node: map-side row
    multiplication, no shuffle).  Value columns are cast to their
    common LUB type by Spark; cast explicitly first if mixing
    decimals/doubles matters.
    """
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )
