"""Skew mitigation: salted equi-join.

When one join key dominates (a hot user, a null-ish default), the
shuffle partition holding it becomes the straggler.  Salting splits the
hot key's rows across `salt` partitions: the large (skewed) side gets a
deterministic salt in [0, salt), the small side is replicated once per
salt value, and the join key becomes (key, salt).  Results are identical
to the plain join; wall-clock follows the now-uniform partition sizes.

AQE's skew-join handling (spark.sql.adaptive.skewJoin.enabled) covers
sort-merge joins automatically; explicit salting remains the tool for
aggregations and for joins AQE cannot split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(skewed: DataFrame, small: DataFrame, on: str | list[str],
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Join `skewed` to `small` on `on` with `salt`-way key splitting.

    `small` is replicated `salt` times (keep it the smaller input).
    Output columns match `skewed.join(small, on, how)`.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "salted_join supports inner/left joins (the replicated side "
            "would duplicate right/full-outer results)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    skew_salted = skewed.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(k) for k in keys],
                      F.monotonically_increasing_id()), F.lit(salt)),
    )
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = skew_salted.join(small_rep, [*keys, "__salt"], how)
    return out.drop("__salt")


def skew_report(df: DataFrame, key_cols: list[str] | str, k: int = 10,
                n_partitions: int = 32,
                capacity: int | None = None) -> DataFrame:
    """Data-driven input to `salted_join`: the k hottest join keys,
    each with its exact count, share of all rows, and the salt factor
    that flattens it to the average partition load
    (ceil(count * n_partitions / total) - 1 means no salting needed).

    Built on `heavy_hitters`, so finding the hot keys shuffles only
    O(partitions * capacity) sketch rows, never the key space; the
    exact recount and the row total are one extra scan each — the
    diagnostic is two scans however wide the key domain is.  Run this
    BEFORE a big join: a top share near 1/n_partitions means salting
    buys nothing; a 0.3 share on one key is the shuffle straggler.
    """
    from .heavy import heavy_hitters

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    # unit-separator join avoids ('ab','c') colliding with ('a','bc');
    # an all-NULL key stays NULL (heavy_hitters drops it) and the
    # share denominator counts only keyed rows, matching that
    all_null = F.lit(True)
    for c in keys:
        all_null = all_null & F.col(c).isNull()
    sep = chr(31)
    keyed = df.select(F.when(all_null, F.lit(None)).otherwise(
        F.concat_ws(sep, *[F.col(c).cast("string") for c in keys])
    ).alias("__key"))
    total = keyed.filter(F.col("__key").isNotNull()).count()
    try:
        hot = heavy_hitters(keyed, "__key", k=k, capacity=capacity)
    except ValueError:
        # near-uniform key domain: the sketch cannot certify a top-k
        # (which itself says "no skew worth salting") — fall back to
        # the exact groupBy; same answer, one key shuffle
        hot = (keyed.filter(F.col("__key").isNotNull())
               .groupBy("__key").agg(F.count(F.lit(1)).alias("n"))
               .orderBy(F.desc("n"), "__key").limit(k)
               .select(F.col("__key").alias("term"), "n"))
    return hot.select(
        F.col("term").alias("key"), F.col("n"),
        F.round(F.col("n") / F.lit(total), 6).alias("share"),
        F.greatest(F.lit(1), F.ceil(
            F.col("n") * n_partitions / F.lit(total)).cast("int")
        ).alias("suggested_salt"))
