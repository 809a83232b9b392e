"""DuckDB-SQL -> Spark-SQL expression compatibility shims.

The reference passes every aggregate-function name through to DuckDB
(/root/reference/README.md:129).  Spark has native equivalents for the
whole surface exercised by the test corpus (SURVEY.md §2.6); this module
rewrites the handful of spellings that differ.  Applied to measure
expressions at view-creation time and to query text before hand-off to
Spark.
"""

from __future__ import annotations

import re

from ..sqlutil import (
    find_matching_paren,
    iter_identifiers,
    next_nonspace,
    split_top_level,
)

# name-for-name renames (applied only at call sites: `name(` )
_FN_RENAMES = {
    "list": "collect_list",
    "array_agg": "collect_list",
    "string_agg": "listagg",
    "group_concat": "listagg",
    "strftime": "date_format",
    "list_value": "array",
    "len": "length",
    "contains": "contains",
    "regexp_matches": "rlike",
    "error": "raise_error",
}


def _rewrite_calls(sql: str, handler) -> str:
    """Scan for function calls and let `handler(name, args_text)` return a
    replacement string or None to keep as-is.  Recurses into args."""
    out: list[str] = []
    last = 0
    i = 0
    n = len(sql)
    spans: list[tuple[int, int, str]] = []
    for start, end, text in iter_identifiers(sql):
        k = next_nonspace(sql, end)
        if k < n and sql[k] == "(":
            close = find_matching_paren(sql, k)
            if close is not None:
                spans.append((start, close + 1, text))
    # process outermost-first, non-overlapping, left to right
    chosen: list[tuple[int, int, str]] = []
    last_end = 0
    for start, end, name in spans:
        if start >= last_end:
            chosen.append((start, end, name))
            last_end = end
    for start, end, name in chosen:
        open_paren = sql.index("(", start + len(name))
        args = sql[open_paren + 1 : end - 1]
        new_args = _rewrite_calls(args, handler)
        repl = handler(name, new_args)
        if repl is None:
            repl = f"{sql[start:open_paren]}({new_args})"
        out.append(sql[last:start])
        out.append(repl)
        last = end
    out.append(sql[last:])
    _ = i
    return "".join(out)


def normalize_expr_to_spark(sql: str) -> str:
    """Rewrite DuckDB function spellings to Spark equivalents:

    - QUANTILE_CONT(x, q)      -> PERCENTILE_CONT(q) WITHIN GROUP (ORDER BY x)
    - QUANTILE_DISC(x, q)      -> PERCENTILE_DISC(q) WITHIN GROUP (ORDER BY x)
    - QUANTILE(x, q)           -> PERCENTILE_DISC variant (DuckDB QUANTILE = disc)
    - PERCENTILE_CONT/DISC(q) WITHIN GROUP (ORDER BY x) -> kept (Spark 3.4+)
    - LIST(x)/ARRAY_AGG(x)     -> collect_list(x)
    - STRING_AGG(x, sep)       -> listagg(x, sep)
    - MEDIAN/MODE              -> kept (Spark 3.4+)
    - error(msg)               -> raise_error(msg)
    """

    def handler(name: str, args: str) -> str | None:
        low = name.lower()
        if low in ("quantile_cont", "quantile_disc", "quantile"):
            parts = [p.strip() for p in split_top_level(args)]
            if len(parts) == 2:
                fn = "percentile_cont" if low == "quantile_cont" else "percentile_disc"
                return f"{fn}({parts[1]}) WITHIN GROUP (ORDER BY {parts[0]})"
            return None
        renamed = _FN_RENAMES.get(low)
        if renamed and renamed != low:
            return f"{renamed}({args})"
        return None

    return _rewrite_calls(sql, handler)


_DIV_INT_RE = re.compile(r"//")


_MAIN_SCHEMA_RE = re.compile(r'\bmain\s*\.\s*(?=[A-Za-z_"])', re.IGNORECASE)


def normalize_statement_to_spark(sql: str) -> str:
    """Statement-level normalizations beyond function renames:
    DuckDB's default `main.` schema qualifier has no Spark counterpart."""
    out = normalize_expr_to_spark(sql)
    out = _MAIN_SCHEMA_RE.sub("", out)
    return out
