"""As-of (point-in-time) join.

Spark has no ASOF JOIN (DuckDB does — it is the correctness oracle for
this operator).  The naive formulation is a range join
(l.ts >= r.ts, take max) which Catalyst executes as a broadcast
nested-loop or cartesian — quadratic per key.  This implementation uses
the union + ordered-window trick instead:

    union both sides tagged by origin, sort within each key by
    (ts, side), and carry the last-seen right-side payload forward with
    last(ignorenulls) over an unbounded-preceding frame.

One shuffle on the key, O(n log n) per partition, no range-join blowup
— the shape that survives 100 TB.  Ties (l.ts == r.ts) match, same as
DuckDB's `ON l.ts >= r.ts`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row (by `on` key,
    right_ts <= left_ts).  Unmatched rows keep NULLs (LEFT ASOF JOIN).

    value_cols: right-side columns to carry (default: all non-key,
    non-timestamp columns); each appears as `<col><suffix>`.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]

    # carry ONE struct per right row (not per-column carries): the
    # matched output must come from the single most recent right row,
    # NULL values included — per-column last(ignorenulls) would skip a
    # NULL in the newest row and splice columns from different rows,
    # deviating from ASOF JOIN semantics.  The struct itself is
    # non-null for every right row, so last(ignorenulls) picks the row.
    l_tagged = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__carry"),
    )
    union = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows sort before left rows at equal ts, so ties match
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = union.withColumn(
        "__match", F.last("__carry", ignorenulls=True).over(w)
    )
    return (
        out.filter(F.col("__side") == 1)
        .select(
            *left.columns,
            *[F.col(f"__match.{c}").alias(f"{c}{suffix}")
              for c in value_cols],
        )
    )
