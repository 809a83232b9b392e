"""Event-time windowed aggregation and sessionization — each operator in
a batch form (oracle-checkable against DuckDB) and a Structured
Streaming form (watermark + window / session_window) that computes the
same result under `trigger(availableNow)`.

Streaming shapes: tumbling counts use `window()` + watermark (late rows
beyond the watermark are dropped); sessions use `session_window()` whose
state merges as gaps close — both are Spark's native incremental
operators, no custom state needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (schema pinned from a batch
    read; nano timestamps read as long and converted)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # FileStreamSource requires a directory; select the single table
    # file via pathGlobFilter
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # Watermarks require TIMESTAMP; with the session tz pinned to UTC
        # this cast is a no-op on the instant.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts_batch(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Per-window per-type counts + value sums (batch form)."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


def tumbling_counts_stream(events: DataFrame, minutes: int = 60,
                           watermark: str = "2 hours") -> DataFrame:
    """Streaming twin: watermarked event-time tumbling windows.  In
    append mode a window emits once the watermark passes its end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


def sliding_counts_batch(events: DataFrame, minutes: int = 60,
                         slide_minutes: int = 15) -> DataFrame:
    """Per-sliding-window per-type counts + value sums (batch form).

    `window(ts, size, slide)` assigns each row to size/slide overlapping
    windows (an internal explode) then hash-aggregates — one shuffle,
    map-side combined, identical cost model to tumbling times the
    overlap factor.  The DuckDB oracle reproduces the assignment with
    generate_series over covering window starts."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes",
                     f"{slide_minutes} minutes").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


def sliding_counts_stream(events: DataFrame, minutes: int = 60,
                          slide_minutes: int = 15,
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming twin: watermarked sliding windows; state per open
    window, size/slide windows open per event."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", f"{minutes} minutes",
                     f"{slide_minutes} minutes").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user (batch form): a new session starts
    when the gap to the previous event exceeds `gap_minutes`.  One
    shuffle on user_id; cumulative-sum window assigns session ids."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Timestamp subtraction yields a day-time interval for both TIMESTAMP
    # and TIMESTAMP_NTZ inputs (numeric casts of NTZ are rejected).
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | ((F.col("ts") - prev) > F.expr(f"INTERVAL {gap_minutes * 60} SECONDS")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        events.withColumn("__new", is_new)
        .withColumn(
            "session_seq",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming twin via native session_window state merging."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events", "session_value",
        )
    )


def dedup_stream(events: DataFrame, key_cols: list[str] | None = None,
                 ts_col: str = "ts",
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact deduplication: drop repeats of the same key
    within the watermark horizon via native
    `dropDuplicatesWithinWatermark` — state per distinct key, evicted
    once the watermark passes, so state is O(rate x horizon) not
    O(stream length).  The batch twin is `dropDuplicates(key_cols)`."""
    keys = key_cols or ["event_id"]
    return (
        events.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def dedup_batch(events: DataFrame,
                key_cols: list[str] | None = None) -> DataFrame:
    """Batch twin of `dedup_stream`."""
    return events.dropDuplicates(key_cols or ["event_id"])
