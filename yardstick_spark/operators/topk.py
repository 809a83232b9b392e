"""Top-k per group — rank-window + filter, the shape Catalyst rewrites
into a per-partition bounded sort (WindowGroupLimit) instead of a full
sort, so it scales to arbitrary group counts."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str | Column | list,
    k: int,
    ascending: bool = False,
) -> DataFrame:
    cols = order_col if isinstance(order_col, list) else [order_col]
    orders = []
    for c in cols:
        c = F.col(c) if isinstance(c, str) else c
        orders.append(c.asc() if ascending else c.desc())
    w = Window.partitionBy(*group_cols).orderBy(*orders)
    return (
        df.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .drop("__rnk")
    )
