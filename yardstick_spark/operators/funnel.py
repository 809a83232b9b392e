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


def dedup_events_window(events: DataFrame, tolerance_s: int = 2,
                        key_cols: tuple = ("user_id", "event_type"),
                        ts_col: str = "ts",
                        id_col: str = "event_id") -> DataFrame:
    """Telemetry double-fire dedup: an event is a duplicate when the
    SAME key (default user+type) fired within `tolerance_s` seconds of
    the immediately preceding event — the standard double-click /
    client-retry cleanup.  Returns the input keys plus is_duplicate
    (lag-based debounce: each event is compared to its predecessor,
    the deterministic windowable form every engine agrees on).

    One window keyed on the event key (partition = one user's one
    event type — small, uniform); ties on the timestamp break by id
    so verdicts are partition-layout independent."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(ts_col, id_col)
    prev = F.lag(ts_col).over(w)
    return events.select(
        id_col, *key_cols, ts_col,
        (
            prev.isNotNull()
            & (F.col(ts_col) - prev
               <= F.expr(f"INTERVAL {int(tolerance_s)} SECOND"))
        ).alias("is_duplicate"),
    )


def event_transitions(events: DataFrame,
                      user_col: str = "user_id",
                      type_col: str = "event_type",
                      ts_col: str = "ts",
                      id_col: str = "event_id") -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every (from_type, to_type) pair of CONSECUTIVE
    events of one user (ordered by timestamp, ties broken by event id
    so the sequence is total and engine-portable), the transition
    count and its probability given from_type.

    Returns (from_type, to_type, n, p) with p = n / Σ_to n.

    Scale shape: ONE shuffle on user_id for the LAG window (per-user
    sequences are independent), then a map-side-combined count over
    the (from, to) pairs — type-pair cardinality output, and the
    per-from normalization is a window over that tiny table.  No
    sessionization state, no per-user collect."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.withColumn("__next", F.lead(type_col).over(w))
        .filter(F.col("__next").isNotNull())
        .groupBy(F.col(type_col).alias("from_type"),
                 F.col("__next").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    return pairs.withColumn(
        "p",
        F.expr("round(n / CAST(SUM(n) OVER "
               "(PARTITION BY from_type) AS DOUBLE), 6)"),
    )


def daily_anomalies(events: DataFrame, z_threshold: float = 2.0,
                    type_col: str = "event_type",
                    ts_col: str = "ts") -> DataFrame:
    """Per-type daily volume anomalies: each (event_type, day) count
    scored as a z-score against that type's own daily mean/stddev; the
    monitoring primitive behind every "traffic looks weird today"
    alert.

    Returns (event_type, day, n, z, is_anomaly) for every type-day.
    Population stddev (stddev_pop) so a 2-day type isn't NULL-scored;
    single-day types get z = 0 (no variance, nothing to flag).

    Scale shape: one map-side-combined groupBy to type-day grain (the
    hard reduction — output is types × days, tiny), then windows over
    that table partitioned by type."""
    day = F.expr(f"CAST(CAST({ts_col} AS DATE) AS STRING)")
    per = (events.groupBy(F.col(type_col).alias("event_type"),
                          day.alias("day"))
           .agg(F.count("*").alias("n")))
    z = ("round(IF(stddev_pop(n) OVER (PARTITION BY event_type) = 0, 0.0D, "
         "(n - avg(n) OVER (PARTITION BY event_type)) "
         "/ stddev_pop(n) OVER (PARTITION BY event_type)), 6)")
    return (
        per.withColumn("z", F.expr(z))
        .withColumn("is_anomaly", F.expr(f"abs(z) >= {z_threshold!r}"))
    )


def event_paths(events: DataFrame, length: int = 3, top_k: int = 20,
                user_col: str = "user_id", type_col: str = "event_type",
                ts_col: str = "ts", id_col: str = "event_id") -> DataFrame:
    """Top-k most common event-type paths of `length` consecutive
    events per user — the n-gram generalization of
    `event_transitions` (which is the length-2 case), used for "what
    do users actually do" journey mining.

    Returns (path, n, rank) with path = " > "-joined type sequence,
    rank by count desc then path asc (total order, engine-portable).

    Scale shape: the same SINGLE user_id shuffle as event_transitions
    feeds length-1 stacked LEAD windows over one sort, then a
    map-side-combined count whose key cardinality is the distinct-path
    vocabulary (bounded by types^length, not events), and the final
    top-k is one tiny sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    df = events.select(F.col(type_col).alias("t0"),
                       F.col(user_col), F.col(ts_col), F.col(id_col))
    for i in range(1, length):
        df = df.withColumn(f"t{i}", F.lead("t0", i).over(w))
    path = F.concat_ws(" > ", *[F.col(f"t{i}") for i in range(length)])
    counts = (
        df.filter(F.col(f"t{length - 1}").isNotNull())
        .groupBy(path.alias("path"))
        .agg(F.count("*").alias("n"))
    )
    wr = Window.orderBy(F.col("n").desc(), F.col("path"))
    return (
        counts.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= top_k)
    )
