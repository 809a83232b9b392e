"""Structured Streaming operators (beyond reference parity — the
reference has no streaming surface, SURVEY.md §2.7)."""

from .stats import (  # noqa: F401
    covariance_from_moments,
    latest_moments,
    merge_moment_tables,
    start_covariance_stream,
)
from .ingest import (  # noqa: F401
    dedup_ingest_stream,
    load_agg_state,
    load_heavy_hitters,
    load_scd2_dim,
    save_agg_state,
    save_scd2_dim,
    semantic_ingest_stream,
    start_dedup_ingest,
    start_heavy_hitters_stream,
    start_incremental_agg,
    start_bm25_index_ingest,
    start_dsir_store_ingest,
    start_line_dedup_ingest,
    start_scd2_ingest,
)
from .joins import (  # noqa: F401
    attribution_batch,
    attribution_stream,
)
from .stateful import user_activity_stats  # noqa: F401
from .windows import (  # noqa: F401
    dedup_batch,
    dedup_stream,
    sessionize_batch,
    sessionize_stream,
    sliding_counts_batch,
    sliding_counts_stream,
    stream_events,
    tumbling_counts_batch,
    tumbling_counts_stream,
)
