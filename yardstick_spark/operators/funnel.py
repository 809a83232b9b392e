"""Event funnel and retention-cohort analytics.

Classic product-analytics shapes over the events table.  Both are
pure DataFrame compositions: per-stage MIN-timestamp aggregations
joined user-to-user (uniform user_id keys, map-side combined), never
a sessionization scan or a per-user collect — the shapes hold on an
arbitrarily long event history because state per user per stage is
one timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_counts(events: DataFrame, stages: list[str],
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """Ordered-funnel user counts: a user is in stage k if they did
    stage k's event AT OR AFTER their earliest qualifying stage-(k-1)
    event (first-touch semantics, the standard product funnel).

    Returns (stage_idx, stage, n_users), one row per stage.  Each step
    is one filtered aggregation joined on user_id — k-1 shuffles of
    per-user single rows; at 100 TB the per-stage tables are
    user-cardinality, not event-cardinality."""
    cur = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(ts_col).alias("t"))
    )
    counts = [cur.agg(F.count("*").alias("n"))
              .select(F.lit(0).alias("stage_idx"),
                      F.lit(stages[0]).alias("stage"), "n")]
    for i, stage in enumerate(stages[1:], start=1):
        nxt = (
            events.filter(F.col(type_col) == stage)
            .select(F.col(user_col).alias("u"), F.col(ts_col).alias("t2"))
            .join(cur, "u")
            .filter(F.col("t2") >= F.col("t"))
            .groupBy("u")
            .agg(F.min("t2").alias("t"))
        )
        counts.append(nxt.agg(F.count("*").alias("n"))
                      .select(F.lit(i).alias("stage_idx"),
                              F.lit(stage).alias("stage"), "n"))
        cur = nxt
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted
    on each later activity-day offset.  Returns (cohort_day STRING,
    day_offset, n_users).

    Two shuffles at user/user-day grain: the cohort table (per-user
    MIN day) and the distinct (user, offset) count — both map-side
    combined on uniform keys."""
    days = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).cast("date").alias("d"),
    ).distinct()
    cohort = days.groupBy("u").agg(F.min("d").alias("c0"))
    return (
        days.join(cohort, "u")
        .select(
            "u", "c0", F.datediff(F.col("d"), F.col("c0")).alias("day_offset")
        )
        .groupBy(F.col("c0").cast("string").alias("cohort_day"), "day_offset")
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )
