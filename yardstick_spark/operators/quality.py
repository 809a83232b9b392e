"""Declarative data-quality expectations (Deequ-style rule checking).

A large-scale ingest pipeline gates every batch on constraint checks:
null fractions, domain membership, value ranges, row predicates, key
uniqueness, referential integrity.  This module compiles a rule list
into the minimum number of Spark jobs:

* every ROW-LEVEL rule (not_null / in_range / in_set / matches /
  satisfies) becomes one conditional SUM inside a SINGLE aggregation
  over ONE scan of the table — map-side combined, no shuffle beyond
  the final 1-row reduce, any number of rules for the price of one
  pass (the same shape Deequ's analyzer batching uses);
* ``unique`` needs a shuffle by definition — one groupBy on the key
  columns, with the total piggy-backed on the same aggregate so no
  second scan is paid;
* ``ref_integrity`` is one join of the non-null FK column against the
  DISTINCT referenced keys (AQE broadcasts a small dimension side,
  shuffles on uniform keys otherwise) followed by a 1-row aggregate.

Each rule yields one row ``(rule, total, failed, pass_fraction, ok)``;
a batch gate is then ``results.filter(~col('ok')).isEmpty()``.

NULL semantics follow Deequ/SQL: a row satisfies a predicate only if
it evaluates to TRUE, so a NULL quantity fails ``in_range`` — use an
explicit ``satisfies`` rule with ``... IS NULL OR ...`` to opt out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


# ---- rule constructors (plain dicts keep the API serializable) ----

def not_null(column: str) -> dict:
    return {"kind": "row", "name": f"not_null({column})",
            "expr": f"({column}) IS NOT NULL"}


def in_range(column: str, lo, hi) -> dict:
    return {"kind": "row", "name": f"in_range({column},{lo},{hi})",
            "expr": f"({column}) BETWEEN {lo} AND {hi}"}


def in_set(column: str, values: list) -> dict:
    lits = ", ".join(
        "'" + str(v).replace("'", "''") + "'" if isinstance(v, str)
        else str(v) for v in values)
    return {"kind": "row", "name": f"in_set({column})",
            "expr": f"({column}) IN ({lits})"}


def matches(column: str, pattern: str) -> dict:
    pat = pattern.replace("'", "''")
    return {"kind": "row", "name": f"matches({column})",
            "expr": f"regexp_like(CAST({column} AS STRING), '{pat}')"}


def satisfies(name: str, predicate_sql: str) -> dict:
    return {"kind": "row", "name": f"satisfies({name})",
            "expr": predicate_sql}


def unique(columns: list[str] | str) -> dict:
    cols = [columns] if isinstance(columns, str) else list(columns)
    return {"kind": "unique", "name": f"unique({','.join(cols)})",
            "columns": cols}


def ref_integrity(column: str, ref: DataFrame, ref_column: str,
                  ref_name: str = "ref") -> dict:
    return {"kind": "ref", "name": f"ref_integrity({column}->"
                                   f"{ref_name}.{ref_column})",
            "column": column, "ref": ref, "ref_column": ref_column}


def check_expectations(df: DataFrame, rules: list[dict],
                       prefix: str = "") -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns one row per rule:
    ``(rule STRING, total BIGINT, failed BIGINT, pass_fraction DOUBLE,
    ok BOOLEAN)``.

    Row-level rules share one single-scan aggregation; ``unique`` and
    ``ref_integrity`` each add the one extra job their semantics
    require (a key shuffle / a key join).  Reference parity: the
    reference engine exposes no quality DSL — this is a pipeline
    operator in the spirit of its ingest gates, expressed Spark-first.
    """
    pieces: list[DataFrame] = []

    row_rules = [r for r in rules if r["kind"] == "row"]
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("_total")]
        for i, r in enumerate(row_rules):
            # coalesce: SUM over an empty table is NULL, but an empty
            # batch vacuously passes (failed = 0)
            aggs.append(F.coalesce(F.sum(
                F.when(F.expr(r["expr"]), F.lit(0)).otherwise(F.lit(1))
            ), F.lit(0)).alias(f"_f{i}"))
        one = df.agg(*aggs)
        # 1-row wide aggregate -> k rule rows via stack (no extra scan)
        # rule names land inside SQL string literals: escape quotes so
        # a satisfies("o'brien", ...) rule can't break the projection
        stack_args = ", ".join(
            "'" + (prefix + r["name"]).replace("'", "''") + f"', _f{i}"
            for i, r in enumerate(row_rules))
        pieces.append(one.selectExpr(
            f"stack({len(row_rules)}, {stack_args}) AS (rule, failed)",
            "_total AS total").select("rule", "total", "failed"))

    for r in rules:
        if r["kind"] == "unique":
            grouped = df.groupBy(*r["columns"]).agg(
                F.count(F.lit(1)).alias("_n"))
            pieces.append(grouped.agg(
                F.lit(prefix + r["name"]).alias("rule"),
                F.coalesce(F.sum("_n"), F.lit(0))
                .cast("bigint").alias("total"),
                F.coalesce(
                    F.sum(F.when(F.col("_n") > 1, F.col("_n"))),
                    F.lit(0)).cast("bigint").alias("failed")))
        elif r["kind"] == "ref":
            fk, rc = r["column"], r["ref_column"]
            keys = r["ref"].select(F.col(rc).alias("_rk")).distinct()
            joined = (df.select(F.col(fk).alias("_fk"))
                      .filter(F.col("_fk").isNotNull())
                      .join(keys, F.col("_fk") == F.col("_rk"), "left"))
            pieces.append(joined.agg(
                F.lit(prefix + r["name"]).alias("rule"),
                F.count(F.lit(1)).alias("total"),
                F.coalesce(
                    F.sum(F.when(F.col("_rk").isNull(), 1)),
                    F.lit(0)).cast("bigint").alias("failed")))

    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule", "total", "failed",
        F.round(F.lit(1.0) - F.try_divide(F.col("failed"),
                                          F.col("total")), 6)
        .alias("pass_fraction"),  # NULL (not an error) on empty input
        (F.col("failed") == 0).alias("ok"))
