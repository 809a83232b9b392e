"""MeasureSession — the engine's single entry point (SURVEY.md §3.3: the
reference needs parser overrides/second-chance binders to intercept DuckDB;
our engine's entry function IS the interception point, Q6).

Usage:
    ys = MeasureSession(spark)
    ys.sql("CREATE VIEW sales_v AS SELECT year, region, "
           "SUM(amount) AS MEASURE revenue FROM sales")
    df = ys.sql("SELECT year, AGGREGATE(revenue) AT (ALL region) FROM sales_v")
"""

from __future__ import annotations

import warnings as _warnings
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .catalog import MeasureCatalog
from .ddl import parse_drop_view, process_create_view
from .expand import QueryExpander
from .functions.compat import normalize_statement_to_spark
from .sqlutil import skip_code_unit


class YardstickError(Exception):
    pass


def split_statements(sql: str) -> list[str]:
    """Split a batch on top-level semicolons, respecting strings/comments/
    dollar-quotes (reference: src/yardstick_extension.cpp:358-454)."""
    out: list[str] = []
    i, n = 0, len(sql)
    last = 0
    while i < n:
        j = skip_code_unit(sql, i)
        if j > i:
            i = j
            continue
        if sql[i] == ";":
            stmt = sql[last:i].strip()
            if stmt:
                out.append(stmt)
            last = i + 1
        i += 1
    stmt = sql[last:].strip()
    if stmt:
        out.append(stmt)
    return out


@dataclass
class MeasureSession:
    """Thin wrapper around a SparkSession with a measure catalog."""

    spark: SparkSession
    catalog: MeasureCatalog = field(default_factory=MeasureCatalog)
    warnings_as_errors: bool = False
    collect_warnings: bool = True
    last_warnings: list[str] = field(default_factory=list)

    def _view_columns(self, name: str):
        try:
            return self.spark.table(name).columns
        except Exception:
            return None

    def _expander(self) -> QueryExpander:
        return QueryExpander(self.catalog, view_columns=self._view_columns)

    # -- entry points -----------------------------------------------------

    def sql(self, text: str) -> DataFrame | None:
        """Execute one statement or a batch; returns the DataFrame of the
        last executable statement.  Catalog changes roll back if a later
        statement in the batch fails (cpp:566-691 snapshot semantics)."""
        statements = split_statements(text)
        snap = self.catalog.snapshot()
        result: DataFrame | None = None
        try:
            for stmt in statements:
                result = self._run_one(stmt)
        except Exception:
            self.catalog.restore(snap)
            raise
        return result

    def rewrite(self, text: str) -> str:
        """Return the rewritten Spark SQL without executing (debugging /
        EXPLAIN workflows)."""
        res = self._expander().expand(text)
        if res.error:
            raise YardstickError(res.error)
        return normalize_statement_to_spark(res.sql)

    def _run_one(self, stmt: str) -> DataFrame | None:
        self.last_warnings = []
        upper = stmt.lstrip().upper()

        # SEMANTIC prefix compatibility (Q6)
        if upper.startswith("SEMANTIC "):
            stmt = stmt.lstrip()[len("SEMANTIC "):]
            upper = stmt.lstrip().upper()

        if upper.startswith("CREATE"):
            cv = process_create_view(stmt)
            if cv.is_measure_view and cv.view is not None:
                clean = normalize_statement_to_spark(cv.clean_sql)
                clean = self._spark_view_ddl(clean, cv.is_replace, cv.is_temp)
                df = self.spark.sql(clean)
                self.catalog.register(cv.view)
                return df
            return self.spark.sql(self._spark_view_ddl(stmt, cv.is_replace, cv.is_temp)
                                  if "VIEW" in upper else stmt)

        drop = parse_drop_view(stmt)
        if drop is not None:
            name, if_exists = drop
            self.catalog.drop(name)
            return self.spark.sql(
                f"DROP VIEW {'IF EXISTS ' if if_exists else ''}{name}"
            )

        res = self._expander().expand(stmt)
        if res.error:
            raise YardstickError(res.error)
        for w in res.warnings:
            self.last_warnings.append(w)
            if self.warnings_as_errors:
                raise YardstickError(w)
            if self.collect_warnings:
                _warnings.warn(w, stacklevel=3)
        return self.spark.sql(normalize_statement_to_spark(res.sql))

    def _spark_view_ddl(self, sql: str, is_replace: bool, is_temp: bool) -> str:
        """Spark's in-memory catalog can't persist plain views without a
        metastore in some configs; prefer TEMP views for session scope.
        Permanent views work against the default catalog too — keep the
        statement as-is except normalizing CREATE VIEW to CREATE OR REPLACE
        TEMPORARY VIEW when the session has no persistent catalog."""
        import re

        m = re.match(
            r"^\s*CREATE\s+(OR\s+REPLACE\s+)?(TEMP(?:ORARY)?\s+)?VIEW\b",
            sql,
            re.IGNORECASE,
        )
        if not m:
            return sql
        rest = sql[m.end():]
        return "CREATE OR REPLACE TEMPORARY VIEW" + rest

    # -- catalog API --------------------------------------------------------

    def create_measure_view(self, name: str, sql_body: str, temp: bool = True) -> None:
        self.sql(f"CREATE OR REPLACE {'TEMP ' if temp else ''}VIEW {name} AS {sql_body}")

    def drop_measure_view(self, name: str, if_exists: bool = True) -> None:
        self.sql(f"DROP VIEW {'IF EXISTS ' if if_exists else ''}{name}")
