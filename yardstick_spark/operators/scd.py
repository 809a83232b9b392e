"""Dimension-maintenance operators: CDC compaction (latest row per
key) and Type-2 slowly-changing-dimension merge — the warehouse-side
twins of the ingest operators in `llm/`.

100 TB design: both operators are single key-partitioned passes.
`cdc_compact` is one window executed as a map-side partial
WindowGroupLimit (each scan task forwards at most one row per key);
`scd2_merge` is ONE key-uniform join between the dimension's current
slice and the (compacted) update batch — history rows pass through
untouched via a partition-prunable `is_current` predicate, so a
date/current-partitioned dimension table never rescans closed rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cdc_compact(changes: DataFrame, key_cols: list[str], ts_col: str,
                op_col: str | None = None, delete_op: str = "D",
                tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Latest surviving row per key from a change-data-capture feed:
    keeps each key's newest row by (`ts_col`, then `tiebreak_cols` so
    the order is total and engine-portable), and — when `op_col` is
    given — drops keys whose newest operation is `delete_op`.

    The standard compaction before applying a CDC batch to a
    dimension: one window, map-side WindowGroupLimit, no join."""
    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    out = (changes.withColumn("__ys_rn", F.row_number().over(w))
           .filter(F.col("__ys_rn") == 1).drop("__ys_rn"))
    if op_col is not None:
        out = out.filter(F.col(op_col) != delete_op).drop(op_col)
    return out


def scd2_merge(dim: DataFrame, updates: DataFrame, key_cols: list[str],
               tracked_cols: list[str], ts_col: str,
               valid_from: str = "valid_from", valid_to: str = "valid_to",
               current_col: str = "is_current") -> DataFrame:
    """Type-2 SCD merge: apply an update batch to a versioned
    dimension, closing changed current rows and inserting new
    versions, preserving full history.

    `dim` carries (`key_cols`, `tracked_cols`, valid_from, valid_to,
    is_current); `updates` carries (`key_cols`, `tracked_cols`,
    `ts_col`) with AT MOST ONE row per key (run `cdc_compact` first —
    enforced with a runtime raise_error guard rather than a separate
    counting pass).  Semantics per update key:

    - key absent from the current slice → INSERT (valid_from = ts,
      open-ended, current)
    - present with identical tracked values (NULL-safe) → no-op
    - present with changed values → close the current row
      (valid_to = ts, not current) and insert the new version

    History rows (is_current = false) stream through untouched, so the
    join input is |current slice| + |batch|, never the full history."""
    upd_ren = updates.select(
        *[F.col(c).alias(f"__u_{c}") for c in key_cols],
        *[F.col(c).alias(f"__u_{c}") for c in tracked_cols],
        F.col(ts_col).alias("__u_ts"),
    )
    # at-most-one-row-per-key contract: cheap distributed guard that
    # fails the job with a clear message instead of silently emitting
    # duplicate current rows
    expected = set(key_cols) | set(tracked_cols) | {
        valid_from, valid_to, current_col}
    if set(dim.columns) != expected:
        raise ValueError(
            "scd2_merge: dim columns must be exactly keys + tracked + "
            f"SCD columns; got {sorted(dim.columns)} vs "
            f"{sorted(expected)}")
    wk = Window.partitionBy(*[f"__u_{c}" for c in key_cols])
    upd_ren = (
        upd_ren.withColumn("__u_n", F.count(F.lit(1)).over(wk))
        .filter(
            F.when(F.col("__u_n") > 1, F.expr(
                "raise_error('scd2_merge: updates contain duplicate "
                "keys - run cdc_compact first')").cast("boolean"))
            .otherwise(F.lit(True)))
        .drop("__u_n")
    )
    history = dim.filter(~F.col(current_col))
    # literal presence flags, NOT key-column isNotNull: the join is
    # eqNullSafe precisely because NULL key components are real
    # matching values, so a row whose first key component is NULL must
    # still count as present on its side (key-isNotNull presence
    # silently dropped such rows from every branch — data loss; same
    # pattern as table_diff/incremental_agg_merge's _in_old/_in_new)
    current = dim.filter(F.col(current_col)) \
        .withColumn("__in_dim", F.lit(True))
    upd_ren = upd_ren.withColumn("__in_upd", F.lit(True))
    cond = [current[c].eqNullSafe(upd_ren[f"__u_{c}"]) for c in key_cols]
    joined = current.join(upd_ren, cond, "full_outer")
    changed = ~F.expr(" AND ".join(
        f"({c} <=> __u_{c})" for c in tracked_cols))
    has_dim = current["__in_dim"].isNotNull()
    has_upd = F.col("__in_upd").isNotNull()
    # ONE pass over the join output: a union of three filtered
    # projections would make Catalyst re-execute the join (and the
    # update-batch window guard) three times — measured 6 exchanges
    # at 10x scale.  Instead each joined row conditionally emits its
    # 1-2 output rows (kept | closed+new version | insert) as an
    # array of dim-schema structs, exploded in the same stage: one
    # window shuffle + one join, total.
    types = {f.name: f.dataType for f in dim.schema.fields}
    kept_s = F.struct(*[current[c].alias(c) for c in dim.columns])
    closed_s = F.struct(
        *[(F.col("__u_ts").cast(types[valid_to]).alias(c)
           if c == valid_to else
           F.lit(False).alias(c) if c == current_col else
           current[c].alias(c))
          for c in dim.columns])
    inserted_s = F.struct(
        *[(F.col(f"__u_{c}").cast(types[c]).alias(c)
           if c in key_cols or c in tracked_cols else
           F.col("__u_ts").cast(types[valid_from]).alias(c)
           if c == valid_from else
           F.lit(None).cast(types[valid_to]).alias(c)
           if c == valid_to else
           F.lit(True).alias(c))
          for c in dim.columns])
    rows = (
        F.when(has_dim & (~has_upd | ~changed), F.array(kept_s))
        .when(has_dim & has_upd & changed, F.array(closed_s, inserted_s))
        .otherwise(F.array(inserted_s))
    )
    merged = (joined.select(F.explode(rows).alias("__r"))
              .select(*[F.col(f"__r.{c}").alias(c) for c in dim.columns]))
    return history.unionByName(merged)


def scd2_lookup(facts: DataFrame, dim: DataFrame, key_cols: list[str],
                fact_ts_col: str, valid_from: str = "valid_from",
                valid_to: str = "valid_to",
                how: str = "left") -> DataFrame:
    """Point-in-time join: each fact row picks the dimension version
    that was valid AT ITS OWN timestamp (`valid_from <= ts < valid_to`,
    open-ended current rows match everything after their start) — the
    feature-generation join that avoids label leakage, where joining
    the current dimension would leak future attribute values into
    historical training rows.

    Key-uniform equi-join with the interval predicate as a residual
    filter: versions per key are few (SCD depth), so the residual
    costs O(versions) per fact, never a range-join blowup.  `how` is
    'left' (facts with no valid version keep NULL attributes) or
    'inner'."""
    cond = [facts[c] == dim[c] for c in key_cols]
    interval = (
        (facts[fact_ts_col] >= dim[valid_from])
        & (dim[valid_to].isNull() | (facts[fact_ts_col] < dim[valid_to]))
    )
    if how not in ("left", "inner"):
        raise ValueError("scd2_lookup: how must be 'left' or 'inner'")
    dim_attrs = [c for c in dim.columns if c not in key_cols]
    # the interval predicate rides the join condition: as a post-filter
    # it would drop unmatched fact rows from the LEFT form
    return facts.join(dim, [*cond, interval], how).select(
        *[facts[c] for c in facts.columns],
        *[dim[c] for c in dim_attrs],
    )
