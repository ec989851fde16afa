"""Structured Streaming operators with batch twins (SURVEY.md §2.14).

The reference is purely batch; the driver mandate adds stream
processing over the ``events`` table. Batch-first design: every
streaming operator has a batch twin with identical semantics — the
DuckDB oracle checks the twin, and pytest proves stream ≡ batch by
running the real ``readStream`` pipeline (availableNow trigger) against
the same parquet input.
"""

from .dedup_ingest import (
    run_streaming_ingest_pipeline,
    run_streaming_minhash_dedup,
    seed_dedup_index,
    seed_eval_grams,
)
from .drains import (
    QUERIES as _DRAIN_QUERIES,
    ORACLES as _DRAIN_ORACLES,
    stream_cdc_latest_drain,
    stream_ingest_verdicts_drain,
    stream_interval_join_drain,
    stream_session_window_drain,
    stream_sliding_window_drain,
    stream_tumbling_window_drain,
    stream_user_upsert_drain,
)
from .index_maintenance import (
    QUERIES as _INDEX_MAINT_QUERIES,
    ORACLES as _INDEX_MAINT_ORACLES,
    stream_index_maintenance_drain,
    stream_maintained_index_topk,
)
from .rollup_maintenance import (
    QUERIES as _ROLLUP_QUERIES,
    ORACLES as _ROLLUP_ORACLES,
    run_streaming_minute_rollup,
    stream_minute_rollup_drain,
)
from .view_maintenance import run_streaming_view_maintenance
from .windows import (
    QUERIES as _WINDOW_QUERIES,
    ORACLES as _WINDOW_ORACLES,
    events_session_windows,
    events_sliding_counts,
    events_stream_dedup,
    events_tumbling_counts,
    run_foreach_batch_upsert_stream,
    run_tumbling_stream,
)

QUERIES = {
    **_WINDOW_QUERIES,
    **_ROLLUP_QUERIES,
    **_DRAIN_QUERIES,
    **_INDEX_MAINT_QUERIES,
}
ORACLES = {
    **_WINDOW_ORACLES,
    **_ROLLUP_ORACLES,
    **_DRAIN_ORACLES,
    **_INDEX_MAINT_ORACLES,
}

__all__ = [
    "QUERIES",
    "ORACLES",
    "events_tumbling_counts",
    "events_sliding_counts",
    "events_stream_dedup",
    "events_session_windows",
    "run_foreach_batch_upsert_stream",
    "run_streaming_ingest_pipeline",
    "run_streaming_minhash_dedup",
    "run_streaming_minute_rollup",
    "stream_cdc_latest_drain",
    "stream_ingest_verdicts_drain",
    "stream_interval_join_drain",
    "stream_session_window_drain",
    "stream_sliding_window_drain",
    "stream_tumbling_window_drain",
    "stream_user_upsert_drain",
    "run_streaming_view_maintenance",
    "run_tumbling_stream",
    "seed_dedup_index",
    "seed_eval_grams",
]
