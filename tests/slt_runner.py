"""Mini sqllogictest runner — replays the reference's golden corpus
(/root/reference/test/sql/*.test) through the yardstick_spark engine.

The corpus (5.7k lines, SURVEY.md §5) is the executable spec for measure
semantics; since the yardstick binary cannot run here (no network), the
golden outputs ARE the oracle.

Dialect shims applied to DDL so DuckDB-flavored fixtures run on Spark:
TEXT/VARCHAR -> STRING, VARCHAR[] -> ARRAY<STRING>, CREATE TABLE ->
CREATE OR REPLACE TEMP VIEW built from inserted VALUES (Spark temp views
avoid a metastore; inserts are buffered per table).
"""

from __future__ import annotations

import math
import re
import sys
from dataclasses import dataclass, field

sys.path.insert(0, "/root/repo")

from yardstick_spark.sqlutil import split_top_level  # noqa: E402


def reset_catalog(spark) -> None:
    """Drop every table, view and temp view in the current database so
    corpora replayed back-to-back in one Spark session start clean.

    Fixture tables are permanent (CREATE TABLE ... USING PARQUET in the
    shared warehouse) and engine measure views persist in the session
    catalog; without this, a second corpus collides with the first
    (TABLE_OR_VIEW_ALREADY_EXISTS, then stale-view UNRESOLVED_COLUMN)."""
    for t in spark.catalog.listTables():
        if t.isTemporary:
            spark.catalog.dropTempView(t.name)
        elif t.tableType == "VIEW":
            spark.sql(f"DROP VIEW IF EXISTS `{t.name}`")
        else:
            spark.sql(f"DROP TABLE IF EXISTS `{t.name}`")


@dataclass
class Record:
    kind: str  # statement_ok | statement_error | query
    sql: str
    line: int
    types: str = ""
    sortmode: str = ""
    expected: list[str] = field(default_factory=list)
    error_pattern: str = ""


def parse_slt(path: str) -> list[Record]:
    records: list[Record] = []
    with open(path, encoding="utf-8") as f:
        lines = f.read().splitlines()
    i, n = 0, len(lines)
    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("#") or line.startswith("require"):
            i += 1
            continue
        start_line = i + 1
        if line.startswith("statement"):
            kind = "statement_ok" if line.split()[1] == "ok" else "statement_error"
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() != "" and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            rec = Record(kind=kind, sql="\n".join(sql_lines), line=start_line)
            if i < n and lines[i].strip() == "----":
                i += 1
                pat = []
                while i < n and lines[i].strip() != "":
                    pat.append(lines[i])
                    i += 1
                rec.error_pattern = "\n".join(pat)
            records.append(rec)
            continue
        if line.startswith("query"):
            parts = line.split()
            types = parts[1] if len(parts) > 1 else ""
            sortmode = parts[2] if len(parts) > 2 else ""
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            i += 1  # skip ----
            expected = []
            while i < n and lines[i].strip() != "":
                expected.append(lines[i])
                i += 1
            records.append(
                Record(
                    kind="query",
                    sql="\n".join(sql_lines),
                    line=start_line,
                    types=types,
                    sortmode=sortmode,
                    expected=expected,
                )
            )
            continue
        if line.startswith(("mode", "load", "set", "loop", "endloop", "restart")):
            i += 1
            continue
        i += 1
    return records


# -- dialect shims ---------------------------------------------------------------

_TYPE_MAP = [
    (re.compile(r"\bVARCHAR\s*\[\]", re.IGNORECASE), "ARRAY<STRING>"),
    (re.compile(r"\bTEXT\b", re.IGNORECASE), "STRING"),
    (re.compile(r"\bVARCHAR\b(?!\s*\()", re.IGNORECASE), "STRING"),
]


def map_types(sql: str) -> str:
    for rx, repl in _TYPE_MAP:
        sql = rx.sub(repl, sql)
    return sql


_CREATE_TABLE_RE = re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?(TEMP(?:ORARY)?\s+)?TABLE\s+"
    r"(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][\w$]*)\s*\((.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+([A-Za-z_][\w$]*)\s*(\([^)]*\)\s*)?VALUES\s*(.*)$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_TABLE_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([A-Za-z_][\w$]*)\s*;?\s*$", re.IGNORECASE
)
_LIST_LITERAL_RE = re.compile(r"\[([^\[\]]*)\]")


class SltSession:
    """Executes SLT records against a MeasureSession, managing fixture
    tables as Spark temp views built from buffered inserts."""

    def __init__(self, ys):
        self.ys = ys
        self.spark = ys.spark
        self.tables: dict[str, tuple[list[tuple[str, str]], list[str]]] = {}
        self.prepared: dict[str, str] = {}

    def execute(self, sql: str):
        """Run one SLT block.  Fixture DDL (CREATE TABLE/INSERT VALUES) is
        intercepted; consecutive engine statements are flushed as ONE
        MeasureSession batch so the reference's batch semantics (TEMP
        measure view rules) apply."""
        result = None
        pending: list[str] = []

        def flush():
            nonlocal result
            if pending:
                result = self.ys.sql(";\n".join(pending))
                pending.clear()

        for stmt in split_top_level(sql, ";"):
            stmt = stmt.strip()
            if not stmt:
                continue
            handled, res = self._run_fixture(stmt)
            if handled:
                flush()
                if res is not None:
                    result = res
            else:
                pending.append(map_types(stmt))
        flush()
        return result

    def _run_fixture(self, stmt: str) -> tuple[bool, object]:
        m = _CREATE_TABLE_RE.match(stmt)
        if m:
            name = m.group(4).lower()
            cols = []
            specs: list[tuple[str, str]] = []
            for c in split_top_level(m.group(5)):
                c = c.strip()
                mm = re.match(r'([A-Za-z_][\w$]*|"[^"]+")\s+(.*)$', c, re.DOTALL)
                if mm:
                    typ = map_types(mm.group(2).strip())
                    typ = re.sub(r"\s+(NOT\s+NULL|PRIMARY\s+KEY|UNIQUE).*$", "",
                                 typ, flags=re.IGNORECASE | re.DOTALL)
                    cols.append(f"`{mm.group(1)}` {typ}")
                    specs.append((mm.group(1), typ))
            # a same-named temp view or view left by earlier statements
            # would shadow the new table on reads — clear all three
            # namespaces before creating
            self.spark.catalog.dropTempView(name)
            self.spark.sql(f"DROP TABLE IF EXISTS {name}")
            self.spark.sql(f"DROP VIEW IF EXISTS {name}")
            self.spark.sql(
                f"CREATE TABLE {name} ({', '.join(cols)}) USING PARQUET"
            )
            self.tables[name] = specs
            return True, None
        m = _INSERT_RE.match(stmt)
        if m:
            from yardstick_spark.sqlutil import convert_dollar_quotes

            name = m.group(1)
            values = convert_dollar_quotes(m.group(3).strip().rstrip(";"))
            values = _LIST_LITERAL_RE.sub(lambda mm: f"ARRAY({mm.group(1)})", values)
            cols = (m.group(2) or "").strip()
            specs = self.tables.get(name.lower())
            if not cols and isinstance(specs, list) and specs:
                # cast VALUES tuples to the declared column types (DuckDB
                # implicitly casts '2024-01-01' to DATE; Spark's ANSI insert
                # policy refuses) — route through an explicit SELECT CAST
                src_cols = ", ".join(f"c{i}" for i in range(len(specs)))
                casts = ", ".join(
                    f"CAST(c{i} AS {typ}) AS `{col}`"
                    for i, (col, typ) in enumerate(specs)
                )
                self.spark.sql(
                    f"INSERT INTO {name} SELECT {casts} FROM "
                    f"(VALUES {values}) AS _v({src_cols})"
                )
            else:
                self.spark.sql(f"INSERT INTO {name} {cols} VALUES {values}")
            return True, None
        m = _DROP_TABLE_RE.match(stmt)
        if m and m.group(2).lower() in self.tables:
            name = m.group(2).lower()
            del self.tables[name]
            self.spark.sql(f"DROP TABLE IF EXISTS {name}")
            return True, None
        if re.match(r"^\s*(SET|PRAGMA)\b", stmt, re.IGNORECASE):
            if "warnings_as_errors" in stmt.lower():
                self.ys.warnings_as_errors = "true" in stmt.lower() or "1" in stmt
            return True, None
        # PREPARE/EXECUTE/DEALLOCATE (DuckDB host feature; Spark has none —
        # emulate by deferring the statement text)
        m = re.match(r"^\s*PREPARE\s+(\w+)\s+AS\s+(.*)$", stmt,
                     re.IGNORECASE | re.DOTALL)
        if m:
            self.prepared[m.group(1).lower()] = m.group(2)
            return True, None
        m = re.match(r"^\s*EXECUTE\s+(\w+)", stmt, re.IGNORECASE)
        if m and m.group(1).lower() in self.prepared:
            return True, self.ys.sql(self.prepared[m.group(1).lower()])
        m = re.match(r"^\s*DEALLOCATE\s+(\w+)", stmt, re.IGNORECASE)
        if m:
            self.prepared.pop(m.group(1).lower(), None)
            return True, None
        return False, None



# -- value formatting (sqllogictest conventions) ----------------------------------


def format_value(v, t: str) -> str:
    if v is None:
        return "NULL"
    if t == "I":
        if isinstance(v, bool):
            return "1" if v else "0"
        if isinstance(v, float) and not v.is_integer():
            return repr(v)  # DuckDB prints non-integral values as-is
        try:
            return str(int(v))
        except (TypeError, ValueError):
            return str(v)
    if t == "R":
        try:
            f = float(v)
        except (TypeError, ValueError):
            return str(v)
        if math.isnan(f):
            return "nan"
        return repr(f)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, list):
        return "[" + ", ".join(str(x) for x in v) + "]"
    return str(v)


def values_match(got: str, exp: str, t: str) -> bool:
    if got == exp:
        return True
    if exp in ("(empty)", "") and got == "":
        return True
    if t == "R":
        try:
            g, e = float(got), float(exp)
            if math.isnan(g) and math.isnan(e):
                return True
            return abs(g - e) <= 1e-6 * max(1.0, abs(e))
        except ValueError:
            return False
    if t == "I":
        # DuckDB prints integral doubles as e.g. 13; Spark may give 13.0
        try:
            return float(got) == float(exp)
        except ValueError:
            return False
    if t == "T":
        return got.strip() == exp.strip()
    return False


def compare_query(df, rec: Record) -> tuple[bool, str]:
    rows = df.collect()
    types = rec.types
    got_rows = []
    for r in rows:
        vals = list(r)
        if len(types) != len(vals):
            return False, f"column count {len(vals)} != {len(types)}"
        got_rows.append([format_value(v, t) for v, t in zip(vals, types)])

    expected_rows = [e.split("\t") for e in rec.expected]
    # handle values-per-line variant (single column per line)
    if expected_rows and len(expected_rows[0]) == 1 and len(types) > 1:
        flat = [e[0] for e in expected_rows]
        if len(flat) % len(types) == 0:
            expected_rows = [
                flat[i : i + len(types)] for i in range(0, len(flat), len(types))
            ]

    if len(got_rows) != len(expected_rows):
        return False, f"row count {len(got_rows)} != {len(expected_rows)}"

    if rec.sortmode == "rowsort":
        got_rows.sort()
        expected_rows.sort()

    for gr, er in zip(got_rows, expected_rows):
        for g, e, t in zip(gr, er, types):
            if not values_match(g, e, t):
                return False, f"value mismatch: got {gr} want {er}"
    return True, ""


PARSE_ERROR_PATTERNS = ("Parser Error", "Catalog Error", "Binder Error",
                        "does not exist", "PARSE_SYNTAX_ERROR")


def run_corpus(path: str, ys, start: int = 0, end: int | None = None,
               skip_lines: set[int] | None = None, verbose: bool = False):
    records = parse_slt(path)
    skip_lines = skip_lines or set()
    results = {"pass": 0, "fail": 0, "skip": 0, "error_text": 0}
    failures = []
    sess = SltSession(ys)
    for rec in records:
        if rec.line < start or (end is not None and rec.line > end):
            continue
        if rec.line in skip_lines:
            results["skip"] += 1
            continue
        try:
            if rec.kind == "statement_ok":
                sess.execute(rec.sql)
                results["pass"] += 1
            elif rec.kind == "statement_error":
                try:
                    df = sess.execute(rec.sql)
                    if df is not None:
                        df.collect()
                    results["fail"] += 1
                    failures.append((rec.line, "expected error, none raised", rec.sql))
                except Exception:
                    results["pass"] += 1
            else:
                df = sess.execute(rec.sql)
                ok, msg = compare_query(df, rec)
                if ok:
                    results["pass"] += 1
                else:
                    results["fail"] += 1
                    failures.append((rec.line, msg, rec.sql))
        except Exception as e:  # noqa: BLE001
            results["fail"] += 1
            last = getattr(ys, "last_sql", "")
            failures.append(
                (rec.line,
                 f"exception {type(e).__name__}: {str(e)[:200]}\n"
                 f"    last_sql: {last[:250]}",
                 rec.sql)
            )
        if verbose and (results["pass"] + results["fail"]) % 50 == 0:
            print(f"  ... line {rec.line}: {results}", flush=True)
    return results, failures


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?",
                    default="/root/reference/test/sql/measures.test")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=None)
    ap.add_argument("--max-failures", type=int, default=20)
    args = ap.parse_args()

    import tempfile

    from pyspark.sql import SparkSession
    from yardstick_spark import MeasureSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ys_wh_"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ys = MeasureSession(spark)
    results, failures = run_corpus(args.path, ys, args.start, args.end, verbose=True)
    print(f"\nRESULTS {args.path}: {results}")
    for line, msg, sql in failures[: args.max_failures]:
        print(f"\n--- line {line}: {msg}\n{sql[:300]}")
    print(f"\n{len(failures)} failures total")
