"""Bucketized range (interval containment) join.

`point BETWEEN start AND end` with no equi-key is the join Spark plans
worst: the only native strategy is a broadcast nested loop — O(n × m)
compares, and an outright failure when neither side broadcasts.  The
classic distributed fix is temporal bucketing: quantize time into
fixed buckets, explode each interval into the buckets it covers, tag
each point with its bucket, equi-join on the bucket (plus any real
equi keys), and re-check exact containment.  Shuffle volume is
n + m × avg_buckets_per_interval, hash-partitioned on near-uniform
bucket ids — the right asymptotic shape at any scale, with the bucket
width trading shuffle fan-out (long intervals → many buckets) against
join selectivity (wide buckets → more false candidates).

This composition mirrors what dedicated engines do natively (e.g.
interval/range-bucket joins in temporal databases); DuckDB's planner
handles BETWEEN directly, which is the oracle in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(points: DataFrame, intervals: DataFrame,
               point_ts: str, start_col: str, end_col: str,
               on: list[str] | None = None,
               bucket_seconds: int = 3600) -> DataFrame:
    """Inner-join each point row to every interval row containing it:
    `start <= ts <= end` (+ optional equi-keys `on`).  Output carries
    all columns of both inputs (interval columns suffixed only on
    name collisions is the caller's concern — keep names distinct)."""
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    sec = "CAST(unix_seconds(CAST({c} AS TIMESTAMP)) AS BIGINT)"
    p_bucket = f"CAST(floor(({sec.format(c=point_ts)}) / {bucket_seconds}) AS BIGINT)"
    i_lo = f"CAST(floor(({sec.format(c=start_col)}) / {bucket_seconds}) AS BIGINT)"
    i_hi = f"CAST(floor(({sec.format(c=end_col)}) / {bucket_seconds}) AS BIGINT)"
    keys = list(on or [])
    p = points.withColumn("__rb", F.expr(p_bucket))
    i = intervals.withColumn("__rb", F.explode(F.expr(
        f"sequence({i_lo}, {i_hi})")))
    joined = p.join(i, ["__rb", *keys]).filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("__rb")
