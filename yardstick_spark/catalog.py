"""Measure catalog — session-scoped registry of measure views.

Mirrors the reference's process-global catalog
(/root/reference/yardstick-rs/src/sql/measures.rs:32-57, :7623-7661) but
scoped to a wrapper session instead of a global mutex.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ViewMeasure:
    """One `AGG(expr) AS MEASURE name` item (measures.rs:32-37)."""

    column_name: str
    expression: str  # verbatim (Spark-normalized) SQL aggregate expression
    is_decomposable: bool
    is_window: bool = False


@dataclass
class MeasureView:
    """Catalog entry for a measure view (measures.rs:41-53)."""

    view_name: str
    measures: list[ViewMeasure]
    base_query: str  # the clean view body (measures replaced)
    base_table: str | None
    base_relation_sql: str | None  # SELECT * FROM <from> [WHERE ...]
    dimension_exprs: dict[str, str]  # normalized alias -> expression
    group_by_cols: list[str]  # view's own GROUP BY (usually empty)
    is_temp: bool = False

    def find_measure(self, name: str) -> ViewMeasure | None:
        low = name.lower()
        for m in self.measures:
            if m.column_name.lower() == low:
                return m
        return None


@dataclass
class ResolvedMeasure:
    """resolve_measure_source output (measures.rs:4906-4929)."""

    agg_fn: str
    source_view: str
    derived_expr: str | None
    is_decomposable: bool
    is_window: bool
    base_table: str | None
    base_relation_sql: str | None
    dimension_exprs: dict[str, str]
    view_group_by_cols: list[str]
    expression: str

    @property
    def eval_expression(self) -> str:
        return self.derived_expr if self.derived_expr else self.expression


@dataclass
class MeasureCatalog:
    views: dict[str, MeasureView] = field(default_factory=dict)

    @staticmethod
    def _key(name: str) -> str:
        return name.strip().strip('"').lower()

    def register(self, view: MeasureView) -> None:
        self.views[self._key(view.view_name)] = view

    def drop(self, view_name: str) -> bool:
        return self.views.pop(self._key(view_name), None) is not None

    def get(self, view_name: str) -> MeasureView | None:
        return self.views.get(self._key(view_name))

    # -- persistence (reference keeps its catalog in the DuckDB .db file
    # via a process-global registry, measures.rs:56-57; a Spark session's
    # catalog is process-lifetime, so measure metadata serializes to a
    # JSON sidecar and/or each hive view's TBLPROPERTIES) ---------------

    def to_dict(self) -> dict:
        return {
            "version": 1,
            "views": [view_to_dict(v) for v in self.views.values()
                      if not v.is_temp],
        }

    @classmethod
    def from_dict(cls, data: dict) -> "MeasureCatalog":
        cat = cls()
        for v in data.get("views", []):
            cat.register(view_from_dict(v))
        return cat

    def known_measure_names(self) -> set[str]:
        out: set[str] = set()
        for v in self.views.values():
            out.update(m.column_name.lower() for m in v.measures)
        return out

    def snapshot(self) -> dict[str, MeasureView]:
        return dict(self.views)

    def restore(self, snap: dict[str, MeasureView]) -> None:
        self.views = dict(snap)

    def measures_by_view(self) -> dict[str, set[str]]:
        return {
            k: {m.column_name.lower() for m in v.measures}
            for k, v in self.views.items()
        }

    def resolve(
        self,
        measure_name: str,
        default_table: str,
        overrides: dict[str, "MeasureView"] | None = None,
    ) -> ResolvedMeasure | None:
        """Resolution prefers the query's primary table, then any view
        (multi-fact JOIN support — measures.rs:4931-4994).  Returns None
        when the measure is unknown (caller decides the SUM fallback).
        `overrides` substitutes specific views (e.g. a `main.`-qualified
        read reaching a permanent view shadowed by a batch TEMP)."""
        candidates: list[tuple[MeasureView, ViewMeasure]] = []
        key = self._key(default_table) if default_table else ""
        primary = (overrides or {}).get(key) or (self.get(default_table) if default_table else None)
        if primary:
            m = primary.find_measure(measure_name)
            if m:
                candidates.append((primary, m))
        if not candidates:
            for k, v in self.views.items():
                v = (overrides or {}).get(k, v)
                m = v.find_measure(measure_name)
                if m:
                    candidates.append((v, m))
                    break
        if not candidates:
            return None
        return build_resolved(*candidates[0])


def build_resolved(v: MeasureView, m: ViewMeasure) -> ResolvedMeasure:
    from .ddl import (
        expand_derived_measure_expr,
        extract_agg_function,
        extract_aggregation_function,
    )

    derived = None
    if extract_aggregation_function(m.expression) is None:
        expanded = expand_derived_measure_expr(
            m.expression, v, frozenset({m.column_name.lower()})
        )
        if expanded != m.expression:
            derived = expanded
    return ResolvedMeasure(
        agg_fn=extract_agg_function(m.expression),
        source_view=v.view_name,
        derived_expr=derived,
        is_decomposable=m.is_decomposable,
        is_window=m.is_window,
        base_table=v.base_table,
        base_relation_sql=v.base_relation_sql,
        dimension_exprs=v.dimension_exprs,
        view_group_by_cols=v.group_by_cols,
        expression=m.expression,
    )


def view_to_dict(v: MeasureView) -> dict:
    """Plain-dict form of one catalog entry — dataclass fields verbatim,
    so a reload round-trips bit-exactly."""
    return {
        "view_name": v.view_name,
        "measures": [
            {
                "column_name": m.column_name,
                "expression": m.expression,
                "is_decomposable": m.is_decomposable,
                "is_window": m.is_window,
            }
            for m in v.measures
        ],
        "base_query": v.base_query,
        "base_table": v.base_table,
        "base_relation_sql": v.base_relation_sql,
        "dimension_exprs": dict(v.dimension_exprs),
        "group_by_cols": list(v.group_by_cols),
    }


def view_from_dict(d: dict) -> MeasureView:
    return MeasureView(
        view_name=d["view_name"],
        measures=[
            ViewMeasure(
                column_name=m["column_name"],
                expression=m["expression"],
                is_decomposable=m["is_decomposable"],
                is_window=m.get("is_window", False),
            )
            for m in d["measures"]
        ],
        base_query=d["base_query"],
        base_table=d.get("base_table"),
        base_relation_sql=d.get("base_relation_sql"),
        dimension_exprs=dict(d.get("dimension_exprs") or {}),
        group_by_cols=list(d.get("group_by_cols") or []),
        is_temp=False,
    )
