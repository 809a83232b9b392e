"""DataFrame-native combinator API — the no-parsing surface from
SURVEY.md §7: build measure queries programmatically instead of via SQL
text.  Compiles to the same `ys.sql` measure SQL (one rewriter, one
semantics).

    from yardstick_spark import measure

    ys.query("sales_v").group_by("year", "region").select(
        measure("revenue"),
        measure("revenue").at(all_="region").alias("year_total"),
        measure("revenue").at(where="region = 'US'").alias("us_rev"),
        measure("revenue").at(set_={"year": "year - 1"}).alias("prev"),
    ).where("year >= 2022").to_df()
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class MeasureExpr:
    """A measure reference with optional AT modifiers, built fluently."""

    name: str
    modifiers: tuple = ()
    out_alias: str | None = None
    wrap_sql: str | None = None  # e.g. "ROUND({expr}, 2)"

    def at(self, *, all_: str | list[str] | bool | None = None,
           where: str | None = None,
           set_: dict[str, str] | None = None,
           visible: bool = False) -> "MeasureExpr":
        mods = list(self.modifiers)
        if all_ is True:
            mods.append(("ALL",))
        elif isinstance(all_, str):
            mods.append(("ALL", all_))
        elif isinstance(all_, list):
            mods.append(("ALL", " ".join(all_)))
        if set_:
            for dim, expr in set_.items():
                mods.append(("SET", dim, expr))
        if where:
            mods.append(("WHERE", where))
        if visible:
            mods.append(("VISIBLE",))
        return MeasureExpr(self.name, tuple(mods), self.out_alias,
                           self.wrap_sql)

    def alias(self, name: str) -> "MeasureExpr":
        return MeasureExpr(self.name, self.modifiers, name, self.wrap_sql)

    def round(self, digits: int) -> "MeasureExpr":
        return MeasureExpr(self.name, self.modifiers, self.out_alias,
                           f"ROUND({{expr}}, {digits})")

    def to_sql(self) -> str:
        expr = f"AGGREGATE({self.name})"
        for mod in self.modifiers:
            kind = mod[0]
            if kind == "ALL" and len(mod) == 1:
                expr += " AT (ALL)"
            elif kind == "ALL":
                expr += f" AT (ALL {mod[1]})"
            elif kind == "SET":
                expr += f" AT (SET {mod[1]} = {mod[2]})"
            elif kind == "WHERE":
                expr += f" AT (WHERE {mod[1]})"
            elif kind == "VISIBLE":
                expr += " AT (VISIBLE)"
        if self.wrap_sql:
            expr = self.wrap_sql.format(expr=expr)
        alias = self.out_alias or self.name
        return f"{expr} AS {alias}"


def measure(name: str) -> MeasureExpr:
    return MeasureExpr(name)


@dataclass
class MeasureQuery:
    """Fluent builder over a measure view; compiles to measure SQL."""

    session: "object"
    view: str
    _dims: list[str] = field(default_factory=list)
    _items: list = field(default_factory=list)
    _where: str | None = None
    _having: str | None = None
    _order_by: str | None = None
    _limit: int | None = None

    def group_by(self, *dims: str) -> "MeasureQuery":
        self._dims = list(dims)
        return self

    def select(self, *items) -> "MeasureQuery":
        self._items = list(items)
        return self

    def where(self, cond: str) -> "MeasureQuery":
        self._where = cond
        return self

    def having(self, cond: str) -> "MeasureQuery":
        self._having = cond
        return self

    def order_by(self, expr: str) -> "MeasureQuery":
        self._order_by = expr
        return self

    def limit(self, n: int) -> "MeasureQuery":
        self._limit = n
        return self

    def to_sql(self) -> str:
        items = list(self._dims)
        for it in self._items:
            items.append(it.to_sql() if isinstance(it, MeasureExpr) else str(it))
        sql = f"SELECT {', '.join(items)} FROM {self.view}"
        if self._where:
            sql += f" WHERE {self._where}"
        if self._dims:
            sql += f" GROUP BY {', '.join(self._dims)}"
        if self._having:
            sql += f" HAVING {self._having}"
        if self._order_by:
            sql += f" ORDER BY {self._order_by}"
        if self._limit is not None:
            sql += f" LIMIT {self._limit}"
        return sql

    def to_df(self) -> DataFrame:
        return self.session.sql(self.to_sql())
