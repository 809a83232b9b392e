"""Incremental materialized-aggregate maintenance and snapshot diff.

At 100 TB the difference between "refresh the rollup" and "rescan the
fact table" is the whole game: a day's ingest is ~0.1% of the corpus,
so the refresh must cost O(batch + aggregate cardinality), never
O(history).

``incremental_agg_merge`` implements the classic self-maintainable
view update for decomposable aggregates (SUM/COUNT, and anything
derived from them downstream — AVG as sum/cnt): partially aggregate
ONLY the delta batch (map-side combined, one small shuffle on the
group keys), then full-outer-join it against the existing aggregate
table on those keys and coalesce-add.  The aggregate table is
group-key cardinality, not fact cardinality, so the join is
dimension-sized; deletes/corrections enter as negative contributions
(retractions), which SUM/COUNT absorb without special cases.

``table_diff`` classifies rows between two snapshots of a keyed table
as inserted / deleted / updated with ONE null-safe full outer join on
the key — the shape every CDC backfill validator and reconciliation
job needs.  Comparison uses null-safe equality per column, so NULL ->
value and value -> NULL transitions are real updates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def incremental_agg_merge(agg: DataFrame, delta: DataFrame,
                          keys: list[str], sum_cols: list[str],
                          count_col: str = "cnt",
                          weight_col: str | None = None) -> DataFrame:
    """Merge an existing aggregate table ``agg`` (columns: keys +
    ``sum_cols`` + ``count_col``) with a RAW delta batch ``delta``
    (fact rows carrying the same keys and the pre-aggregation measure
    columns named like ``sum_cols``).  Returns the refreshed aggregate
    with identical schema.  ``weight_col`` (+1 insert / -1 retract)
    makes deletes and corrections first-class: measures contribute
    ``value * weight`` and the count contributes the weight.  Groups
    whose merged count reaches 0 (fully retracted) are dropped,
    matching a from-scratch recompute.
    """
    if weight_col is None:
        d = delta.groupBy(*keys).agg(
            *[F.sum(c).alias(c) for c in sum_cols],
            F.count(F.lit(1)).alias(count_col))
    else:
        w = F.col(weight_col)
        d = delta.groupBy(*keys).agg(
            *[F.sum(F.col(c) * w).alias(c) for c in sum_cols],
            F.sum(w).alias(count_col))
    # null-safe key equality: a NULL group key is a real group (SQL
    # GROUP BY treats NULLs as equal) — a plain equi-join would never
    # match it and emit two NULL-key rows instead of merging them
    cond = None
    for k in keys:
        c = F.col(f"a.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else cond & c
    j = agg.alias("a").join(d.alias("d"), cond, "full_outer")
    merged = j.select(
        *[F.coalesce(F.col(f"a.{k}"), F.col(f"d.{k}")).alias(k)
          for k in keys],
        *[(F.coalesce(F.col(f"a.{c}"), F.lit(0)) +
           F.coalesce(F.col(f"d.{c}"), F.lit(0))).alias(c)
          for c in sum_cols],
        (F.coalesce(F.col(f"a.{count_col}"), F.lit(0)) +
         F.coalesce(F.col(f"d.{count_col}"), F.lit(0))
         ).alias(count_col))
    return merged.filter(F.col(count_col) > 0)


def table_diff(old: DataFrame, new: DataFrame, keys: list[str],
               compare_cols: list[str] | None = None) -> DataFrame:
    """Snapshot diff on key columns: one row per key present in either
    snapshot whose state changed — (keys..., change) with change in
    ('I', 'D', 'U').  Unchanged keys are filtered out.  ``compare_cols``
    defaults to all shared non-key columns.  One full outer join on
    the (uniform) key; at scale both sides prune to keys +
    compare_cols at the scan (no SELECT *), and AQE handles one side
    being a small correction batch by broadcasting it."""
    if compare_cols is None:
        compare_cols = [c for c in old.columns
                        if c in set(new.columns) and c not in set(keys)]
    o = old.select(*keys, *compare_cols,
                   F.lit(True).alias("_in_old")).alias("o")
    n = new.select(*keys, *compare_cols,
                   F.lit(True).alias("_in_new")).alias("n")
    cond = None
    for k in keys:  # null-safe: a NULL key matches itself, not I+D
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    return (j.select(
        *[F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k)
          for k in keys],
        F.when(F.col("o._in_old").isNull(), F.lit("I"))
         .when(F.col("n._in_new").isNull(), F.lit("D"))
         .when(changed, F.lit("U")).alias("change"))
        .filter(F.col("change").isNotNull()))
