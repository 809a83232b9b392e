"""Stream-stream interval join (click→purchase attribution) with a
batch twin.

Spark's stream-stream inner join buffers both sides in state, bounded
by the watermark plus the join's time-range condition — the canonical
attribution shape: each purchase joins the clicks of the SAME user in
the preceding `window_minutes`.  State for a click row is dropped once
the watermark passes click_ts + window (Spark derives the eviction
bound from the range predicate), so state size is O(rate × window),
independent of stream length.

The batch twin is the identical join expressed over a static frame —
the DuckDB oracle reproduces it directly (entry `events_attribution`),
and `tests/test_operators.py` asserts stream≡batch under
trigger(availableNow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _split(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


def _attr_condition(window_minutes: int):
    return (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts")
           >= F.col("purchase_ts") - F.expr(
               f"INTERVAL {window_minutes} MINUTES"))
    )


def _project(joined: DataFrame) -> DataFrame:
    return joined.select(
        F.col("p_user").alias("user_id"),
        "purchase_id", "click_id",
        F.round("purchase_value", 2).alias("purchase_value"),
        F.round("click_value", 2).alias("click_value"),
    )


def attribution_batch(events: DataFrame,
                      window_minutes: int = 60) -> DataFrame:
    """Batch twin: every (purchase, click) pair of the same user with
    the click in the `window_minutes` before the purchase."""
    clicks, purchases = _split(events)
    return _project(purchases.join(clicks, _attr_condition(window_minutes)))


def attribution_stream(events: DataFrame, window_minutes: int = 60,
                       watermark: str = "2 hours") -> DataFrame:
    """Streaming twin: watermarked stream-stream interval join.  Both
    sides carry event-time watermarks; the range condition lets Spark
    evict click state `window_minutes` past the watermark."""
    clicks, purchases = _split(events)
    return _project(
        purchases.withWatermark("purchase_ts", watermark).join(
            clicks.withWatermark("click_ts", watermark),
            _attr_condition(window_minutes),
        )
    )
