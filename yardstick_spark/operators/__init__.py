"""Relational operators Spark lacks natively, built as compositions of
DataFrame primitives (SURVEY.md §7 phase 4 — beyond reference parity)."""

from .asof import asof_join  # noqa: F401
from .graph import (  # noqa: F401
    label_propagation,
    lpa_sql,
    pagerank,
    pagerank_sql,
    triangle_counts,
)
from .funnel import (  # noqa: F401
    daily_anomalies,
    event_paths,
    dedup_events_window,
    event_transitions,
    funnel_counts,
    retention_cohorts,
)
from .profile import (  # noqa: F401
    benford_profile,
    numeric_histogram,
    profile_numeric_approx,
    profile_table,
    profile_table_approx,
)
from .heavy import heavy_hitters  # noqa: F401
from .incremental import incremental_agg_merge, table_diff  # noqa: F401
from .quality import (  # noqa: F401
    check_expectations,
    in_range,
    in_set,
    matches,
    not_null,
    ref_integrity,
    satisfies,
    unique,
)
from .layout import (  # noqa: F401
    write_zordered,
    zorder_bounds,
    zorder_key,
    zorder_key_sql,
    zorder_key_sql_duckdb,
)
from .range_join import range_join  # noqa: F401
from .reshape import pivot_table, unpivot  # noqa: F401
from .scd import cdc_compact, scd2_lookup, scd2_merge  # noqa: F401
from .rollup_hier import (  # noqa: F401
    rollup_coarser,
    rollup_events,
    rollup_hierarchy,
)
from .skew import salted_join, skew_report  # noqa: F401
from .timeseries import gap_fill_daily  # noqa: F401
from .topk import top_k_per_group  # noqa: F401
