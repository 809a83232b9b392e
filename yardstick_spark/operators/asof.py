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

`direction` covers the full pandas `merge_asof` surface: "backward"
(default — most recent right row at or before), "forward" (earliest at
or after; DuckDB oracle: `ON l.ts <= r.ts`), and "nearest" (closer of
the two, ties to backward).  `tolerance` (an SQL INTERVAL literal,
e.g. "INTERVAL 1 HOUR") voids matches farther than the bound — the
sensor-fusion contract where a stale quote must NOT attach to a trade.
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
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row selected by `direction`
    (by `on` key; backward: right_ts <= left_ts, forward: right_ts >=
    left_ts, nearest: the closer of the two, ties backward).
    Unmatched rows keep NULLs (LEFT ASOF JOIN).

    value_cols: right-side columns to carry (default: all non-key,
    non-timestamp columns); each appears as `<col><suffix>`.
    tolerance: SQL INTERVAL literal; matches farther than this from
    the left timestamp are voided to NULL.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]

    # carry ONE struct per right row (not per-column carries): the
    # matched output must come from the single selected right row,
    # NULL values included — per-column last(ignorenulls) would skip a
    # NULL in the newest row and splice columns from different rows,
    # deviating from ASOF JOIN semantics.  The struct itself is
    # non-null for every right row, so last(ignorenulls) picks the
    # row.  The matched timestamp rides in the struct for tolerance
    # and nearest-distance checks.
    l_tagged = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(F.col(right_ts).alias("__mts"),
                 *[F.col(c) for c in value_cols]).alias("__carry"),
    )
    union = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    out = union
    if direction in ("backward", "nearest"):
        # right rows sort before left rows at equal ts, so ties match
        wb = (
            Window.partitionBy(*keys)
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn(
            "__m_back", F.last("__carry", ignorenulls=True).over(wb))
    if direction in ("forward", "nearest"):
        # left rows (side 1... must sort BEFORE right at equal ts for a
        # tie to land in the following frame): order side descending
        wf = (
            Window.partitionBy(*keys)
            .orderBy("__ts", F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        out = out.withColumn(
            "__m_fwd", F.first("__carry", ignorenulls=True).over(wf))

    if direction == "backward":
        match = F.col("__m_back")
    elif direction == "forward":
        match = F.col("__m_fwd")
    else:
        back_d = F.col("__ts").cast("timestamp").cast("double") - \
            F.col("__m_back.__mts").cast("timestamp").cast("double")
        fwd_d = F.col("__m_fwd.__mts").cast("timestamp").cast("double") \
            - F.col("__ts").cast("timestamp").cast("double")
        match = (
            F.when(F.col("__m_back").isNull(), F.col("__m_fwd"))
            .when(F.col("__m_fwd").isNull(), F.col("__m_back"))
            .when(back_d <= fwd_d, F.col("__m_back"))  # tie: backward
            .otherwise(F.col("__m_fwd")))
    out = out.withColumn("__match", match)
    if tolerance is not None:
        within = (
            (F.col("__match.__mts") >=
             F.expr(f"__ts - {tolerance}")) &
            (F.col("__match.__mts") <=
             F.expr(f"__ts + {tolerance}")))
        out = out.withColumn(
            "__match", F.when(within, F.col("__match")))
    return (
        out.filter(F.col("__side") == 1)
        .select(
            *left.columns,
            *[F.col(f"__match.{c}").alias(f"{c}{suffix}")
              for c in value_cols],
        )
    )
