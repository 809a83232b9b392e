"""Hypertable-style rollup hierarchy: continuous-aggregate tables at
increasing time granularities, each coarser level derived from the
finer one rather than from raw events.

The point at 100 TB: the raw table is scanned ONCE (for the finest
level); every coarser level re-aggregates the previous level — input
size drops by the granularity ratio at each step, so a
minute→hour→day→month chain costs raw + raw/60 + raw/1440 + … ≈ one
raw pass total.  Correct for the algebraic aggregates kept here
(count, sum, min, max — values carried as integer cents, so two-stage
summation is bit-identical to direct aggregation; the oracle checks
exactly that identity).  Non-algebraic aggregates (distinct counts,
percentiles) would need sketches (HLL / t-digest) carried per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rollup_events(events: DataFrame, granularity: str = "hour",
                  ts_col: str = "ts") -> DataFrame:
    """Finest rollup level, computed from raw events: per-bucket
    per-type counts and integer-cent value sums."""
    return (
        events.groupBy(
            F.date_trunc(granularity, F.col(ts_col)).alias("bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr(
                "CAST(ROUND(value * 100, 0) AS BIGINT)"
            )).alias("value_cents"),
            F.min(F.expr(
                "CAST(ROUND(value * 100, 0) AS BIGINT)"
            )).alias("min_cents"),
            F.max(F.expr(
                "CAST(ROUND(value * 100, 0) AS BIGINT)"
            )).alias("max_cents"),
        )
    )


def rollup_coarser(finer: DataFrame, granularity: str) -> DataFrame:
    """Next rollup level, derived from a finer level — never re-reads
    raw events.  counts and cent-sums are algebraic, so summing the
    finer buckets equals aggregating raw rows directly."""
    return (
        finer.groupBy(
            F.date_trunc(granularity, F.col("bucket")).alias("bucket"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("value_cents").alias("value_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )


def rollup_hierarchy(events: DataFrame,
                     granularities: tuple[str, ...] = ("hour", "day"),
                     ts_col: str = "ts") -> dict[str, DataFrame]:
    """All levels, finest first; level i>0 derives from level i-1."""
    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for g in granularities:
        prev = (rollup_events(events, g, ts_col) if prev is None
                else rollup_coarser(prev, g))
        out[g] = prev
    return out
