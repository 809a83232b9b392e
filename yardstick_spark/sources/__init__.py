"""Source registration for the engine's table surface.

The reference delegates all IO to DuckDB (SURVEY.md §2.7 — it has no
scans of its own); this module is the Spark-side equivalent surface:
parquet/csv/json directories registered as temp views with schema
quirks handled (nanosecond timestamps), ready for measure views.
"""

from .duckdb_src import (  # noqa: F401
    read_duckdb,
    read_duckdb_partitioned,
    write_duckdb,
)
from .register import (  # noqa: F401
    read_table,
    read_with_rejects,
    register_parquet_dir,
)
from .write import (  # noqa: F401
    read_bucketed,
    write_bucketed,
    write_partitioned,
    compact_files,
    write_sorted,
    write_zordered,
    zorder_key_expr,
)
