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
