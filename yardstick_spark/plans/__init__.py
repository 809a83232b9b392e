"""Physical-plan inspection helpers (scale hygiene).

The measure rewrites are pre-planning (SURVEY.md §4 — Catalyst owns all
optimization); these helpers let tests and operators ASSERT the plan
shapes we rely on at 100 TB: grand totals broadcast, parquet scans prune
columns and push filters, hot paths stay in whole-stage codegen.
"""

from .inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    has_partial_topk,
    is_folded_scan,
    pushed_filters,
    read_schema_columns,
    whole_stage_codegen_ids,
)
