"""Helpers over `df._jdf.queryExecution()` / explain text."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or (
        "BroadcastNestedLoopJoin" in explain_str(df)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    txt = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[([^\]]*)\]", txt):
        inner = m.group(1).strip()
        if inner:
            out.extend(p.strip() for p in inner.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column list of each parquet scan's ReadSchema (pruning check)."""
    txt = explain_str(df)
    out: list[list[str]] = []
    for m in re.finditer(r"ReadSchema:\s*struct<([^>]*)>", txt):
        cols = [
            c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()
        ]
        out.append(cols)
    return out


def whole_stage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = fewer breaks)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))


def is_folded_scan(df: DataFrame) -> bool:
    """True if the plan is the folded kNN shape: an Arrow mapInPandas
    over the scan carries the query matrix in its closure and there is
    NO join at all — strictly stronger than the broadcast-join
    contract (corpus rows never shuffle for scoring, and the query
    side never even becomes a plan node)."""
    txt = explain_str(df)
    return "MapInPandas" in txt and "Join" not in txt


def has_partial_topk(df: DataFrame) -> bool:
    """True if the rank-window top-k is pruned map-side before the
    shuffle (InferWindowGroupLimit): a WindowGroupLimit in Partial mode
    feeding the Exchange, so no reducer receives input proportional to
    the pre-filter row count."""
    return bool(
        re.search(r"WindowGroupLimit[\s\S]{0,500}?, Partial", explain_str(df))
    )
