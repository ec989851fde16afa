"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` register every implemented operator (SURVEY.md §2) with
its DuckDB oracle twin. Registries live next to the operator code in
``customer_revenue_analysis_sql_tableau_spark.operators.*`` and are merged here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from customer_revenue_analysis_sql_tableau_spark.operators import analytics as _analytics
from customer_revenue_analysis_sql_tableau_spark.operators import corpus as _corpus
from customer_revenue_analysis_sql_tableau_spark.operators import queries as _queries
from customer_revenue_analysis_sql_tableau_spark.operators import procedures as _procedures
from customer_revenue_analysis_sql_tableau_spark.operators import relational as _relational
from customer_revenue_analysis_sql_tableau_spark.operators import rollups as _rollups
from customer_revenue_analysis_sql_tableau_spark.operators import decontamination as _decontamination
from customer_revenue_analysis_sql_tableau_spark.operators import dedup as _dedup
from customer_revenue_analysis_sql_tableau_spark.operators import embeddings as _embeddings
from customer_revenue_analysis_sql_tableau_spark.operators import features as _features
from customer_revenue_analysis_sql_tableau_spark.operators import graph as _graph
from customer_revenue_analysis_sql_tableau_spark.operators import incremental as _incremental
from customer_revenue_analysis_sql_tableau_spark.operators import multimodal as _multimodal
from customer_revenue_analysis_sql_tableau_spark.operators import pipeline as _pipeline
from customer_revenue_analysis_sql_tableau_spark.operators import quality as _quality
from customer_revenue_analysis_sql_tableau_spark.operators import segment_store as _segment_store
from customer_revenue_analysis_sql_tableau_spark.operators import similarity as _similarity
from customer_revenue_analysis_sql_tableau_spark.operators import sketch_checks as _sketch_checks
from customer_revenue_analysis_sql_tableau_spark.operators import splits as _splits
from customer_revenue_analysis_sql_tableau_spark.operators import temporal as _temporal
from customer_revenue_analysis_sql_tableau_spark.operators import tpch_complete as _tpch_complete
from customer_revenue_analysis_sql_tableau_spark.operators import tpch_extended as _tpch_extended
from customer_revenue_analysis_sql_tableau_spark.operators import text as _text
from customer_revenue_analysis_sql_tableau_spark import app_layer as _app_layer
from customer_revenue_analysis_sql_tableau_spark import streaming as _streaming
from customer_revenue_analysis_sql_tableau_spark.functions import gallery as _gallery
from customer_revenue_analysis_sql_tableau_spark.sources import compaction as _compaction
from customer_revenue_analysis_sql_tableau_spark.sources import roundtrips as _roundtrips

_REGISTRY_MODULES = [
    _pipeline,
    _corpus,
    _quality,
    _gallery,
    _decontamination,
    _embeddings,
    _incremental,
    _rollups,
    _segment_store,
    _similarity,
    _sketch_checks,
    _app_layer,
    _multimodal,
    _procedures,
    _splits,
    _streaming,
    _dedup,
    _features,
    _graph,
    _temporal,
    _tpch_complete,
    _text,
    _queries,
    _analytics,
    _relational,
    _tpch_extended,
    _roundtrips,
    _compaction,
]

# The driver's correctness run is budgeted (~50 entries per round) and
# walks the merged dict in insertion order, so the registry is ordered
# at ENTRY level. Round-12 ordering (VERDICT.md r11, Next #1-#6):
# (1) the FOURTEEN new r12 entries that have never been in a driver window
# — the seven bit-equivalence checks that make the rows-only read
# paths' strongest evidence driver-visible (persisted IVF/PQ/IVF-PQ/
# delete/delivery ≡ their in-process tiers, the stream-maintained
# index ≡ the flat
# segment-stack reader, the deep BPE tokenizer ≡ a direct
# token-materializing application of the same vocabulary; r11 Next
# #2), the segment-store lifecycle tail (time-travel as-of-version
# reads pinning the manifest-chain algebra, and GC/VACUUM with a
# retention window proving the expire_snapshots contract; r11 Next
# #3/#4), the predicate-selected per-partition in-place compaction of
# a month-partitioned fact (r11 Next #5), and the JSONL explicit-
# schema evolution twin of the parquet footer-merge entry (r11 Next
# #6), and the streamed-index as-of-batch time travel (the streaming
# twin of the segment-store read; fold-invisibility digest-pinned)
# plus its GC (manifest-folded segments retired in a CoW clone);
# (2) the FIVE entries whose code changed this round and must
# re-prove — the small-file compaction pass (coalesce-clamped target +
# _SUCCESS-gated staging reuse; r11 ADVICE) and the four streaming
# index-maintenance entries (numeric segment ordering; r11 ADVICE);
# (3) the full TWENTY-ONE-entry r6 proof-staleness cohort (r11 Next
# #1 — the tail the r11 budget cut; all 21 fit this round, restoring
# the r7+ freshest-proof floor registry-wide); (4) ELEVEN r7-stale
# entries (oldest-proof-first continuation — starts raising the floor
# toward r8; includes graph_pagerank_copurchase, the r11 bench watch
# item). Guarded against rot by tests/test_registry_hygiene.py::
# test_priority_names_exist. The ~50-entry budget may cut inside the
# final r7 continuation entries; they are code-unchanged and
# pytest-covered, so a spill to r13 costs nothing.
_PRIORITY = [
    # -- new this round (r12), first driver proof --
    "sim_persisted_ivf_equiv_check",  # read path = in-process tier, hashed
    "sim_persisted_pq_equiv_check",
    "sim_persisted_ivfpq_equiv_check",
    "sim_persisted_delete_equiv_check",
    "sim_persisted_delivery_equiv_check",
    "stream_maintained_equiv_check",  # folds+pending = flat segment stack
    "text_bpe_deep_apply_equiv_check",  # vocab join = token materialization
    "sim_persisted_read_asof",  # time-travel chain algebra
    "sim_asof_v2_brute_topk",  # exact search against a historical snapshot
    "sim_persisted_vacuum",  # retention GC, expire_snapshots contract
    "parquet_compact_partitioned",  # OPTIMIZE WHERE, per-partition in-place
    "jsonl_schema_evolution",  # explicit-schema null-fill evolution policy
    "stream_index_asof_batch",  # streamed-index time travel, fold-invisible
    "stream_index_vacuum",  # GC of manifest-folded segments (CoW clone)
    # -- code changed this round: re-prove --
    "parquet_compact_small_files",  # clamped target + _SUCCESS-gated reuse
    "stream_index_maintenance_drain",  # numeric segment ordering
    "stream_index_delete_drain",
    "stream_maintained_index_topk",  # rows-only; bound twin below
    "stream_maintained_recall_check",
    # -- r11 Next #1: the full r6 proof-staleness cohort (exactly 21) --
    "decontaminate_ngram_overlap",
    "dedup_containment",
    "dedup_containment_prefix",
    "dedup_embedding_signlsh",
    "dedup_survivors_best_quality",
    "emb_label_profile",
    "emb_norm_stats",
    "feat_stratified_sample",
    "multimodal_decode_features",
    "quality_decile_curriculum",
    "sim_bruteforce_topk",
    "split_temperature_mixture",
    "stream_dedup_first",
    "stream_ingest_verdicts_drain",
    "stream_late_data_drain",
    "stream_session_windows",
    "stream_sliding_counts",
    "stream_tumbling_counts",
    "temporal_value_percentiles",
    "text_quality_score",
    "training_data_pipeline",
    # -- oldest-first continuation: eleven r7-stale entries --
    "flagship_revenue_by_region",
    "view_customer_value_summary",
    "graph_pagerank_copurchase",  # r11 bench watch item (worst r9->r11 mover)
    "dedup_components_bigstar",
    "dedup_incremental_lsh",
    "analytics_sessionize_events",
    "analytics_funnel_conversion_lag",
    "inc_revenue_with_retractions",
    "inc_state_rollup",
    "multimodal_decode_jpeg",
    "multimodal_size_stats",
]


def _prioritized(merged: dict) -> dict:
    out = {k: merged[k] for k in _PRIORITY if k in merged}
    out.update((k, v) for k, v in merged.items() if k not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _queries.flagship_revenue_by_region(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _REGISTRY_MODULES:
        out.update(mod.QUERIES)
    return _prioritized(out)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each (SQL-expressible) query."""
    out: dict[str, str] = {}
    for mod in _REGISTRY_MODULES:
        out.update(mod.ORACLES)
    return _prioritized(out)
